"""Ingest + preprocessing pipeline — the TPU-native ``Ply`` equivalent.

Mirrors the reference loader's stages (src/ply/ply.py:32-135): load → voxel
downsample → estimate normals (radius 2*voxel) → FPFH (radius 5*voxel) →
optional Gaussian noise on the downsampled cloud → full-res normals for
point-to-plane ICP.

Parity notes:
  - The reference injects noise *after* FPFH is computed (ply.py:57-62):
    features describe the clean geometry, RANSAC scoring sees noisy points.
    Same order here.
  - Reference noise is unconditional sigma=0.05; here it is opt-in via
    ``PreprocessConfig.noise_sigma`` (SURVEY.md flags the always-on noise as
    test behaviour baked into the loader).
  - Downsampling output size is data-dependent, so the downsample runs at the
    raw capacity and is host-compacted to a tight bucket before the O(N^2)
    feature stages — one host sync per cloud, matching the reference's one
    load per cloud.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dm.core.cloud import PointCloud, from_numpy
from tpu3dm.core.config import PreprocessConfig
from tpu3dm.io.ply import read_ply
from tpu3dm.preprocess.fpfh import compute_fpfh, compute_fpfh_capped
from tpu3dm.preprocess.normals import estimate_normals, estimate_normals_capped
from tpu3dm.preprocess.voxel import voxel_downsample_host
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)


@dataclasses.dataclass
class ProcessedCloud:
    """Preprocessed cloud pair-of-resolutions (reference ``Ply`` attributes:
    .pcd -> full, .pcd_down -> down, .pcd_fpfh -> down.features,
    .voxel_size, .path — ply.py:20-31)."""

    full: PointCloud  # full resolution, with normals (for ICP)
    down: PointCloud  # downsampled, with normals + FPFH (for RANSAC)
    voxel_size: float
    path: Path | None = None


def _features_impl(
    down: PointCloud,
    full: PointCloud,
    normal_radius: jax.Array,
    fpfh_radius: jax.Array,
    *,
    normal_max_nn: int,
    fpfh_max_nn: int,
    full_normal_max_nn: int,
    share_knn: bool = True,
    full_normals: bool = True,
) -> tuple[PointCloud, PointCloud]:
    """Down-cloud normals + FPFH and full-cloud normals in ONE dispatch.

    Each separate jitted call is a full remote round trip on the axon stack
    (~1.5 s/call measured warm); fusing the three feature stages into one
    compiled program pays one round trip per cloud instead of three.

    max_nn > 0 selects the Open3D-parity capped paths (hybrid search
    semantics, reference ply.py:110-120); 0 selects the uncapped
    all-radius-neighbours fast paths.

    See ``down_features`` for the shared-scan optimisation ``share_knn``
    selects.
    """
    down = down_features(
        down,
        normal_radius,
        fpfh_radius,
        normal_max_nn=normal_max_nn,
        fpfh_max_nn=fpfh_max_nn,
        share_knn=share_knn,
    )
    # Full-res normals get their own cap knob: the k-selection at full
    # resolution costs 14.6x the covariance fast path on TPU (config.py).
    # ``full_normals=False`` skips the stage entirely — it is the DOMINANT
    # ingest cost (O(N_full^2) covariance; measured ~26 ms of the ~27 ms
    # per-cloud warm batched ingest at 20k points), and only the full-res
    # ICP path (register_pair) consumes it; the batched production paths
    # (register_pairs_batched, register_multiway_batched) register the
    # downsampled clouds and never touch full.normals.
    if not full_normals:
        return down, full
    if full_normal_max_nn > 0:
        full = estimate_normals_capped(full, normal_radius, max_nn=full_normal_max_nn)
    else:
        full = estimate_normals(full, normal_radius)
    return down, full


def down_features(
    down: PointCloud,
    normal_radius: jax.Array | float,
    fpfh_radius: jax.Array | float,
    *,
    normal_max_nn: int,
    fpfh_max_nn: int,
    share_knn: bool,
) -> PointCloud:
    """Down-cloud normals + FPFH, sharing one kNN scan when semantics allow.

    When both stages are capped with normal_max_nn <= fpfh_max_nn (the
    Open3D defaults, 30 <= 100) and ``share_knn`` certifies normal_radius <=
    fpfh_radius (the reference's 2*voxel <= 5*voxel — certified host-side
    because the radii may be traced here), ONE k=fpfh_max_nn top-k scan
    serves both stages: slots are distance-ascending, so every in-normal-
    radius point precedes every out-of-radius one and the first
    normal_max_nn slots re-masked by the normal radius are exactly the
    hybrid-search neighbour set.  The k-selection scan dominates ingest
    (14.6x the covariance cost — config.py), so sharing it halves the hot
    path.

    The cloud is CENTERED about its centroid for the feature computation
    (normals and FPFH are translation-invariant; the RETURNED cloud keeps
    the original points): the kNN selection expands d2 as
    |a|^2+|b|^2-2ab, whose fp32 cancellation error grows with absolute
    coordinate magnitude — at |coords| ~ 2000 it reaches ~1 against a
    radius^2 scale of 2.25, silently corrupting neighbour sets and
    therefore every downstream feature (measured round 5: a
    +1000-shifted benchmark pair lost 95% of its true correspondences
    before this fix).  The dense formulation (preprocess/dense.py)
    already centers for the same reason.  The shift is QUANTIZED to
    multiples of 64: an exact no-op for near-origin clouds — any change
    to feature fp rounding measurably reshuffles razor-margin rescue
    elections — while far-origin clouds keep a residual offset <= 32
    units, harmless for the d2 expansion (fp32 error ~1e-4 at 32 vs the
    2.25 radius^2 scale).
    """
    orig = down
    ctr = jnp.round(down.centroid() / 64.0) * 64.0
    down = down.with_(points=down.points - ctr[None, :])

    def restore(featured: PointCloud) -> PointCloud:
        return orig.with_(normals=featured.normals, features=featured.features)

    if share_knn and 0 < normal_max_nn <= fpfh_max_nn:
        from tpu3dm.core.cloud import PAD_SENTINEL
        from tpu3dm.ops.topk import nn_topk
        from tpu3dm.preprocess.fpfh import fpfh_from_knn
        from tpu3dm.preprocess.normals import normals_from_knn

        pts = jnp.where(down.mask[:, None], down.points, PAD_SENTINEL)
        n = pts.shape[0]
        k_n = min(normal_max_nn, n)
        d2, idx, valid = nn_topk(
            pts, pts, down.mask, down.mask,
            k=min(fpfh_max_nn, n), radius=fpfh_radius,
        )
        r2_n = jnp.asarray(normal_radius, jnp.float32) ** 2
        nvalid = valid[:, :k_n] & (d2[:, :k_n] <= r2_n)
        down = normals_from_knn(down, idx[:, :k_n], nvalid)
        return restore(fpfh_from_knn(down, d2, idx, valid))
    if normal_max_nn > 0:
        down = estimate_normals_capped(down, normal_radius, max_nn=normal_max_nn)
    else:
        down = estimate_normals(down, normal_radius)
    if fpfh_max_nn > 0:
        return restore(compute_fpfh_capped(down, fpfh_radius, max_nn=fpfh_max_nn))
    return restore(compute_fpfh(down, fpfh_radius))


_features_device = jax.jit(
    _features_impl,
    static_argnames=(
        "normal_max_nn", "fpfh_max_nn", "full_normal_max_nn", "share_knn",
        "full_normals",
    ),
)


# Module-level cache so jit executables persist across calls — a wrapper
# built inside preprocess_points_batch would recompile on every invocation.
@functools.lru_cache(maxsize=None)
def _features_device_batched(
    normal_max_nn: int,
    fpfh_max_nn: int,
    full_normal_max_nn: int,
    share_knn: bool,
):
    fn = functools.partial(
        _features_impl,
        normal_max_nn=normal_max_nn,
        fpfh_max_nn=fpfh_max_nn,
        full_normal_max_nn=full_normal_max_nn,
        share_knn=share_knn,
    )
    return jax.jit(jax.vmap(fn, in_axes=(0, 0, None, None)))


@functools.lru_cache(maxsize=None)
def _down_features_device_batched(
    normal_max_nn: int, fpfh_max_nn: int, share_knn: bool
):
    """Down-cloud-only batched feature program (full_normals=False path).

    Keeping the full-res clouds OUT of the compiled program matters as much
    as skipping their normals: a device program input/output pays the
    host<->device transfer both ways (~2 x 16 MB for 64 x 20k clouds), all
    of it dead weight for consumers that register the downsampled clouds.
    """
    fn = functools.partial(
        down_features,
        normal_max_nn=normal_max_nn,
        fpfh_max_nn=fpfh_max_nn,
        share_knn=share_knn,
    )
    return jax.jit(jax.vmap(fn, in_axes=(0, None, None)))


@functools.partial(jax.jit, static_argnames=())
def _noise_device(down: PointCloud, key: jax.Array, sigma: jax.Array) -> PointCloud:
    noise = sigma * jax.random.normal(key, down.points.shape)
    noisy = jnp.where(down.mask[:, None], down.points + noise, 0.0)
    return down.with_(points=noisy)


def preprocess_points(
    points: np.ndarray,
    config: PreprocessConfig = PreprocessConfig(),
    *,
    key: jax.Array | None = None,
    path: Path | None = None,
) -> ProcessedCloud:
    """Run the full preprocessing chain on raw host points."""
    from tpu3dm.utils.profiler import profile_block

    with profile_block("preprocess/ingest"):
        full = from_numpy(points)
        down = voxel_downsample_host(points, config.voxel_size)
        # Host count now, while the mask is still a NumPy array — after the
        # feature dispatch it is a device array and this costs a round trip.
        n_down = int(np.asarray(down.mask).sum())
    with profile_block("preprocess/features_device"):
        down, full = _features_device(
            down,
            full,
            jnp.float32(config.normal_radius),
            jnp.float32(config.fpfh_radius),
            normal_max_nn=config.normal_max_nn,
            fpfh_max_nn=config.fpfh_max_nn,
            full_normal_max_nn=config.full_normal_max_nn,
            # Radius ordering is certified host-side (radii are traced in
            # the compiled program); the shared scan needs nr <= fr.
            share_knn=config.normal_radius <= config.fpfh_radius,
        )

    if config.noise_sigma > 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        down = _noise_device(down, key, jnp.float32(config.noise_sigma))
    logger.info(
        "Preprocessed cloud: %d points -> %d downsampled (voxel %.3g)",
        points.shape[0],
        n_down,
        config.voxel_size,
    )
    return ProcessedCloud(full=full, down=down, voxel_size=config.voxel_size, path=path)


def preprocess_points_batch(
    clouds: list[np.ndarray],
    config: PreprocessConfig = PreprocessConfig(),
    *,
    key: jax.Array | None = None,
    workers: int | None = None,
    full_normals: bool = True,
    down_cap: int | None = None,
) -> list[ProcessedCloud]:
    """Preprocess MANY clouds in one vmapped device dispatch.

    ``full_normals=False`` is the down-cloud-only fast path for consumers
    that never touch ``.full`` (register_pairs_batched /
    register_multiway_batched): it skips full-resolution normal estimation
    (the dominant ingest compute, O(N_full^2)) AND keeps the full-res clouds
    out of the compiled program entirely, saving their host->device->host
    transfers.  The returned ``ProcessedCloud.full`` is a host-resident
    PointCloud (NumPy leaves, zero-filled normals): reads are free on host,
    and any later jit consumer uploads it transparently.

    Production ingest path for multi-pair workloads: host-side voxel
    downsampling (native C++ tier) per cloud — fanned out over ``workers``
    threads (io/loader.py; the native hash releases the GIL) — then all
    feature stages for every cloud in a single compiled program.  Clouds are
    padded to shared capacities (max over the batch, rounded to 256) so one
    compile covers similarly-sized batches.

    ``down_cap`` pins the downsampled capacity: a streaming caller
    (registration/stream.py) processing many windows of similar clouds
    keeps every window on ONE compiled feature program instead of
    recompiling when a window's max down-count crosses a 256 quantum.
    Raised automatically if some cloud exceeds it.
    """
    from tpu3dm.core.cloud import round_up
    from tpu3dm.io.loader import voxel_downsample_many

    if not clouds:
        return []
    downs = voxel_downsample_many(clouds, config.voxel_size, workers=workers)
    cap_d = max(round_up(int(np.asarray(d.mask).sum()), 256) for d in downs)
    if down_cap is not None:
        cap_d = max(cap_d, down_cap)
    cap_f = max(round_up(p.shape[0], 256) for p in clouds)

    downs_pc = [
        from_numpy(np.asarray(d.points)[np.asarray(d.mask)], capacity=cap_d)
        for d in downs
    ]
    share = config.normal_radius <= config.fpfh_radius

    # Memory-bound the vmapped feature dispatch: the per-cloud top-k scan
    # materializes O(cap^2) temporaries per lane, and one dispatch over
    # hundreds of clouds OOMs a 16 GB chip (measured round 4: 256 clouds
    # at cap 1024 allocate a 12.5 GB remat temp).  Chunks of equal width
    # (last one padded with repeats of cloud 0) share one compiled
    # program.
    chunk = max(1, min(len(downs_pc), (96 * 1024 * 1024) // max(cap_d * cap_d, 1)))
    if full_normals:
        # The capped full-res scan keeps O(cap_f x 1024) temps per lane
        # (nn_topk target chunks); 64 clouds at 20k points is the known-
        # good batch width, scaled inversely with capacity.
        chunk = max(1, min(chunk, (64 * 20480) // max(cap_f, 1)))

    def run_chunked(fn, stacked_args_fn, items):
        outs = []
        for lo in range(0, len(items), chunk):
            part = items[lo:lo + chunk]
            pad = chunk - len(part)
            if pad:
                part = part + [part[0]] * pad
            out = fn(*stacked_args_fn(part))
            if pad:
                out = jax.tree_util.tree_map(lambda a: a[:-pad], out)
            outs.append(out)
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs
        )

    if full_normals:
        fulls_pc = [from_numpy(p, capacity=cap_f) for p in clouds]
        fn = _features_device_batched(
            config.normal_max_nn,
            config.fpfh_max_nn,
            config.full_normal_max_nn,
            share,
        )

        def args_full(part):
            dpart = [downs_pc[i] for i, _ in part]
            fpart = [fulls_pc[i] for i, _ in part]
            return (
                jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dpart),
                jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fpart),
                jnp.float32(config.normal_radius),
                jnp.float32(config.fpfh_radius),
            )

        down_b, full_b = run_chunked(
            fn, args_full, list(enumerate(downs_pc))
        )
        fulls = None
    else:
        fn = _down_features_device_batched(
            config.normal_max_nn, config.fpfh_max_nn, share
        )

        def args_down(part):
            return (
                jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *part),
                jnp.float32(config.normal_radius),
                jnp.float32(config.fpfh_radius),
            )

        down_b = run_chunked(fn, args_down, downs_pc)
        full_b = None
        fulls = [from_numpy(p, capacity=cap_f, host=True) for p in clouds]

    out = []
    for i, raw in enumerate(clouds):
        down_i = jax.tree_util.tree_map(lambda a: a[i], down_b)
        if full_b is not None:
            full_i = jax.tree_util.tree_map(lambda a: a[i], full_b)
        else:
            full_i = fulls[i]
        if config.noise_sigma > 0.0:
            k = jax.random.fold_in(
                key if key is not None else jax.random.PRNGKey(0), i
            )
            down_i = _noise_device(down_i, k, jnp.float32(config.noise_sigma))
        out.append(
            ProcessedCloud(
                full=full_i, down=down_i, voxel_size=config.voxel_size
            )
        )
    return out


def load_cloud(
    path: str | Path,
    config: PreprocessConfig = PreprocessConfig(),
    *,
    key: jax.Array | None = None,
) -> ProcessedCloud:
    """Load a PLY file and preprocess it (reference: ``Ply(path, voxel_size)``).

    Raises FileNotFoundError / TypeError / ValueError with the reference's
    semantics (ply.py:46-51, 81-84).
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Ply file not found: {path}")
    if path.suffix.lower() != ".ply":
        raise TypeError(f"File is not a ply file: {path}")
    data = read_ply(path)
    return preprocess_points(data["points"], config, key=key, path=path)
