"""Voxel-grid downsampling (sort + segment-mean, static shapes).

Replaces Open3D's C++ ``voxel_down_sample`` (reference call: ply.py:106).
Semantics match: every point maps to the voxel containing it (relative to the
cloud min-bound) and each output point is the mean of its voxel's members.

TPU-native formulation: no hash map — lexicographically sort points by integer
voxel coordinates (overflow-safe: no linearized key), detect segment starts by
neighbour comparison, and segment-sum into compacted slots.  Output keeps the
input capacity with a validity mask (downsampled count is data-dependent, but
shapes stay static under jit; ``compact`` re-buckets on the host when wanted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dm.core.cloud import PointCloud, from_numpy, to_numpy

_INT_BIG = 2**30  # Python int: module-level jnp constants poison axon lowering


@functools.partial(jax.jit, static_argnames=())
def voxel_downsample(pc: PointCloud, voxel_size: jax.Array | float) -> PointCloud:
    """Downsample to one mean point per occupied voxel.

    Returns a PointCloud of the same capacity; valid rows (lexicographic voxel
    order) carry voxel means, the rest are masked padding.
    """
    pts = pc.points
    mask = pc.mask
    n = pts.shape[0]
    voxel_size = jnp.asarray(voxel_size, jnp.float32)

    # Voxel integer coords relative to min bound (Open3D convention).
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(mask[:, None], pts, big), axis=0)
    ijk = jnp.floor((pts - lo[None, :]) / voxel_size).astype(jnp.int32)
    # Padding rows sort last and cluster into one trailing segment.
    ijk = jnp.where(mask[:, None], ijk, _INT_BIG)

    order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0]))
    s_ijk = ijk[order]
    s_pts = pts[order]
    s_mask = mask[order]

    prev = jnp.roll(s_ijk, 1, axis=0)
    is_new = jnp.any(s_ijk != prev, axis=1)
    is_new = is_new.at[0].set(True)
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # segment id per sorted row

    w = s_mask.astype(jnp.float32)
    sums = jax.ops.segment_sum(s_pts * w[:, None], seg, num_segments=n)
    cnts = jax.ops.segment_sum(w, seg, num_segments=n)
    means = sums / jnp.maximum(cnts, 1.0)[:, None]
    out_mask = cnts > 0.0
    means = jnp.where(out_mask[:, None], means, 0.0)

    return PointCloud(
        points=means,
        mask=out_mask,
        normals=jnp.zeros_like(means),
        features=jnp.zeros((n, 0), jnp.float32),
    )


def compact(pc: PointCloud, pad_multiple: int = 256) -> PointCloud:
    """Host-side: strip padding and re-bucket to a tight capacity.

    Use after ``voxel_downsample`` so downstream O(N^2) stages (normals, FPFH,
    NN search) run at the downsampled size, not the raw capacity.
    """
    data = to_numpy(pc)
    return from_numpy(data["points"], pad_multiple=pad_multiple)


def voxel_downsample_host(
    points, voxel_size: float, pad_multiple: int = 256
) -> PointCloud:
    """Host-side (NumPy) voxel downsample for the ingest path.

    Same semantics as ``voxel_downsample`` (mean per occupied voxel, min-bound
    origin, lexicographic voxel order) at host speed.  The device version's
    lexsort costs ~37 s of TPU *compile* time at 20k points on the remote
    compiler — ingest is an IO-boundary stage (like PLY parsing), so it runs
    on host; the jittable device version remains for fully-fused pipelines
    and CPU-backend tests.
    """
    import numpy as np

    pts = np.asarray(points, dtype=np.float64)

    from tpu3dm import native

    means_nat = native.voxel_downsample(pts, voxel_size)
    if means_nat is not None:
        return from_numpy(
            means_nat.astype(np.float32), pad_multiple=pad_multiple, host=True
        )

    lo = pts.min(axis=0)
    ijk = np.floor((pts - lo[None, :]) / float(voxel_size)).astype(np.int64)
    # unique(axis=0) sorts lexicographically — matching the device version.
    _, inverse, counts = np.unique(
        ijk, axis=0, return_inverse=True, return_counts=True
    )
    sums = np.zeros((counts.shape[0], 3), dtype=np.float64)
    np.add.at(sums, inverse, pts)
    means = (sums / counts[:, None]).astype(np.float32)
    return from_numpy(means, pad_multiple=pad_multiple, host=True)
