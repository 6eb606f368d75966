"""Registration paths for large (100k-10M point) clouds.

The standard pipeline registers downsampled clouds and refines on full
resolution; at 1M+ points brute-force NN is ~16 s/call on one v5e chip
(K=3 matmul, ~2% MXU utilization), so the refinement loop switches to the
block-sparse NN kernel (ops/nn_sparse.py): KD-partitioned blocks, AABB-bounded
candidate selection, scalar-prefetched Pallas streaming.  BASELINE.json
config 4 ("large dense clouds exercising tiled NN-search kernel memory
blocking"); replaces the role of Open3D's KDTree-backed ``registration_icp``
(reference icp.py:42-48) in this regime.

The KD partition of the SOURCE stays valid under the rigid transforms ICP
applies (blocks move rigidly, staying compact), so the host-side partition is
done once per cloud, not per iteration; candidate blocks are re-ranked on
device every iteration (one [nqb, ntb] bound matrix — trivial next to the NN
itself).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dm.core import se3
from tpu3dm.ops.nn_sparse import kd_perm, nn_blocksparse, pad_sorted
from tpu3dm.registration.result import RegistrationResult


@dataclasses.dataclass
class LargeCloud:
    """A KD-partition-sorted, block-padded cloud resident on device."""

    points: jax.Array  # [Np, 3] sorted+padded (SPARSE_PAD sentinel rows)
    n: int  # true point count
    block: int
    perm: np.ndarray  # original -> sorted position (host)
    normals: jax.Array | None = None  # sorted alongside points when present

    @property
    def mask(self) -> jax.Array:
        return jnp.arange(self.points.shape[0]) < self.n


def prepare_large_cloud(
    points: np.ndarray,
    *,
    block: int = 512,
    normals: np.ndarray | None = None,
) -> LargeCloud:
    """Host-side KD partition + pad; one call per cloud, reused across ICP."""
    pts = np.asarray(points, np.float32)
    perm = kd_perm(pts, block)
    sorted_pts = pad_sorted(pts[perm], block)
    nrm = None
    if normals is not None:
        nrm_np = np.asarray(normals, np.float32)[perm]
        pad = sorted_pts.shape[0] - nrm_np.shape[0]
        if pad:
            nrm_np = np.concatenate([nrm_np, np.zeros((pad, 3), np.float32)])
        nrm = jnp.asarray(nrm_np)
    return LargeCloud(
        points=jnp.asarray(sorted_pts),
        n=pts.shape[0],
        block=block,
        perm=perm,
        normals=nrm,
    )


@functools.partial(
    jax.jit,
    static_argnames=("block", "w", "max_iterations", "point_to_plane", "n_src"),
)
def _icp_large_jit(
    src_pts: jax.Array,
    tgt_pts: jax.Array,
    tgt_normals: jax.Array | None,
    init_T: jax.Array,
    dist_thresh: jax.Array,
    *,
    n_src: int,
    block: int,
    w: int,
    max_iterations: int,
    point_to_plane: bool,
) -> RegistrationResult:
    thresh_sq = dist_thresh * dist_thresh
    src_mask = jnp.arange(src_pts.shape[0]) < n_src
    denom = jnp.float32(max(n_src, 1))

    def correspond(T):
        pts = se3.apply(T, src_pts)
        # Sentinel source rows must stay sentinels (T would move them).
        pts = jnp.where(src_mask[:, None], pts, src_pts)
        d2, idx, _ = nn_blocksparse(pts, tgt_pts, block=block, w=w)
        m = (d2 < thresh_sq) & src_mask
        fitness = jnp.sum(m.astype(jnp.float32)) / denom
        rmse = jnp.sqrt(jnp.sum(jnp.where(m, d2, 0.0)) / jnp.maximum(jnp.sum(m), 1))
        return pts, idx, m, fitness, rmse

    def solve_step(T):
        pts, idx, m, fitness, rmse = correspond(T)
        q = tgt_pts[idx]
        wgt = m.astype(jnp.float32)
        if point_to_plane:
            nrm = tgt_normals[idx]
            r = jnp.sum((pts - q) * nrm, axis=1)
            J = jnp.concatenate([nrm, jnp.cross(pts, nrm)], axis=1)
        else:
            r3 = pts - q
            eye = jnp.broadcast_to(jnp.eye(3), (pts.shape[0], 3, 3))
            Jw = -se3.hat(pts)
            J = jnp.concatenate([eye, Jw], axis=2).reshape(-1, 6)
            r = r3.reshape(-1)
            wgt = jnp.repeat(wgt, 3)
        A = jnp.einsum("n,ni,nj->ij", wgt, J, J)
        b = -jnp.einsum("n,ni,n->i", wgt, J, r)
        A = A + 1e-6 * jnp.trace(A) / 6.0 * jnp.eye(6) + 1e-12 * jnp.eye(6)
        xi = jnp.linalg.solve(A, b)
        xi = jnp.where(jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))
        return se3.exp_se3(xi) @ T, fitness, rmse

    def cond(state):
        it, _, f_cur, r_cur, converged = state
        return (it < max_iterations) & ~converged

    def body(state):
        it, T, f_cur, r_cur, _ = state
        T_new, f_new, r_new = solve_step(T)
        # Absolute-delta convergence: Open3D's ICPConvergenceCriteria
        # compares absolute fitness/RMSE deltas despite its "relative_*"
        # field names (matching registration/icp.py).
        converged = (
            (jnp.abs(f_new - f_cur) < 1e-6)
            & (jnp.abs(r_new - r_cur) < 1e-6)
            & (it > 0)
        )
        return it + 1, T_new, f_new, r_new, converged

    init = (
        jnp.int32(0),
        jnp.asarray(init_T, jnp.float32),
        jnp.float32(-1.0),
        jnp.float32(-1.0),
        jnp.bool_(False),
    )
    it, T, _, _, _ = jax.lax.while_loop(cond, body, init)
    _, _, _, fitness, rmse = correspond(T)
    return RegistrationResult(
        transformation=T, fitness=fitness, inlier_rmse=rmse, iterations=it
    )


def icp_refine_large(
    src: LargeCloud,
    tgt: LargeCloud,
    init_T,
    *,
    dist_thresh: float,
    max_iterations: int = 30,
    w: int = 8,
    point_to_plane: bool | None = None,
) -> RegistrationResult:
    """ICP between two prepared large clouds.

    point_to_plane defaults to whether target normals are available.
    """
    if point_to_plane is None:
        point_to_plane = tgt.normals is not None
    if point_to_plane and tgt.normals is None:
        raise ValueError("point_to_plane ICP needs target normals")
    assert src.block == tgt.block
    return _icp_large_jit(
        src.points,
        tgt.points,
        tgt.normals if point_to_plane else None,
        jnp.asarray(init_T, jnp.float32),
        jnp.float32(dist_thresh),
        n_src=src.n,
        block=src.block,
        w=w,
        max_iterations=max_iterations,
        point_to_plane=point_to_plane,
    )


def coarse_pose_with_verification(
    src_down,
    tgt_down,
    config,
    key,
    *,
    restarts: int = 4,
    verify_iters: int = 10,
) -> RegistrationResult:
    """Multi-restart RANSAC with short-ICP verification of each candidate.

    Near-symmetric geometry (e.g. a dental arch) produces RANSAC aliases
    whose inlier count TIES the true pose (measured: correct pose fitness
    0.330 vs 60-deg alias 0.335 on the synthetic arch) — the inlier metric
    cannot discriminate.  A few ICP iterations on the *downsampled* cloud
    can: the true pose converges toward fitness ~1.0, aliases stall.  Runs
    ``restarts`` independent RANSAC elections and returns the candidate with
    the best verified (fitness, -rmse).  The reference pipeline has no such
    rescue and fails identically on these inputs (ransac.py:20-59).
    """
    from tpu3dm.registration.fused import (
        RESCUE_OVERRIDE_MARGIN,
        RESCUE_TIE_RATIO,
    )
    from tpu3dm.registration.icp import icp_refine
    from tpu3dm.registration.ransac import global_registration_two_mode

    # Collect all candidates first: eligibility depends on the best RANSAC
    # fitness across them (same tie-ratio + decisive-margin rule as the
    # fused rescue — see fused.py RESCUE_TIE_RATIO/RESCUE_OVERRIDE_MARGIN:
    # at partial overlap an alias can verify with slightly higher
    # coarse-threshold fitness than the truth despite clearly lower RANSAC
    # support, and must not win on that).
    if restarts < 1:
        raise ValueError(f"restarts must be >= 1, got {restarts}")
    cands = []
    for r in range(restarts):
        k = jax.random.fold_in(key, r)
        cands.extend(global_registration_two_mode(src_down, tgt_down, config.ransac, k))
    fit_max = max(float(c.fitness) for c in cands)

    def verified(cand):
        # Two-stage (annealed) verification, mirroring the fused rescue:
        # coarse iterations pull a RANSAC-rough pose into the basin, fine
        # iterations lock the in-plane components that coarse
        # correspondences cannot (plane-dominated partial overlaps drag
        # the p2pl solve via boundary-clamped matches — round-4 plate
        # family measurement).
        half = max(verify_iters // 2, 1)
        ver = icp_refine(
            src_down,
            tgt_down,
            cand.transformation,
            dist_thresh=config.ransac.dist_thresh,
            max_iterations=half,
            point_to_plane=False,
        )
        ver = icp_refine(
            src_down,
            tgt_down,
            ver.transformation,
            dist_thresh=config.icp.dist_thresh,
            max_iterations=max(verify_iters - half, 1),
            point_to_plane=False,
        )
        # Fine-threshold fitness leads the election (same rationale as the
        # fused rescue: coarse-threshold coverage can favor a
        # partial-overlap alias; ICP-threshold coverage does not, and the
        # eligibility guard handles the geometrically-blind wrap cases).
        from tpu3dm.registration.evaluate import evaluate_registration

        fine = evaluate_registration(
            src_down, tgt_down, config.icp.dist_thresh, ver.transformation
        )
        return ver, (
            float(fine.fitness), float(ver.fitness), -float(ver.inlier_rmse)
        )

    vers = [(cand, *verified(cand)) for cand in cands]
    is_near = [float(v[0].fitness) >= RESCUE_TIE_RATIO * fit_max for v in vers]
    vfine_near_best = max(v[2][0] for v, n in zip(vers, is_near) if n)
    eligible = [
        v
        for v, n in zip(vers, is_near)
        if n or v[2][0] >= RESCUE_OVERRIDE_MARGIN * vfine_near_best
    ]
    cand, ver, _ = max(eligible, key=lambda v: v[2])
    return RegistrationResult(
        transformation=ver.transformation,
        fitness=cand.fitness,
        inlier_rmse=cand.inlier_rmse,
        iterations=cand.iterations,
    )


def donor_normals(cloud: LargeCloud, down) -> jax.Array:
    """Full-resolution normals by donation from the downsampled cloud.

    Exact normal estimation at 1M+ points is O(N * k) covariance work; for
    point-to-plane ICP the normal only enters through the projection of the
    residual, and surface orientation varies smoothly — so each full-res
    point borrows the normal of its nearest *downsampled* point (which has an
    exact radius-covariance normal, preprocess/normals.py).  One tiled NN
    query per cloud.  Point-to-plane is sign-invariant (flipping n flips r
    and J together), so donor orientation is irrelevant.
    """
    from tpu3dm.ops.nn import nn_search

    _, idx = nn_search(cloud.points, down.points, None, down.mask)
    return down.normals[idx]


def register_arrays_large(
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    config=None,
    *,
    key=None,
    block: int = 512,
    w: int = 8,
    point_to_plane: bool = True,
    mesh=None,
    mesh_block_sparse: bool = False,
    restarts: int = 4,
):
    """Full registration of two large raw clouds (100k-10M points).

    Coarse stage runs on voxel-downsampled clouds exactly like the standard
    pipeline (RANSAC over FPFH correspondences); refinement runs block-sparse
    ICP on the full-resolution clouds — point-to-plane by default, with
    full-res target normals donated from the downsampled cloud
    (``donor_normals``; exact O(N*k) normal estimation is intentionally
    skipped at this scale).  ``point_to_plane=False`` falls back to
    point-to-point.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``block`` axis switches the
    full-resolution refinement to the sharded ring-NN ICP
    (parallel/sharded_icp.py) — both clouds sharded over devices, psum'd
    normal equations — for clouds one chip cannot hold (BASELINE config 4
    at N chips).  ``mesh=None`` keeps the single-chip block-sparse kernel.

    Returns (RegistrationResult of the refinement, coarse RegistrationResult).
    """
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.preprocess.pipeline import down_features
    from tpu3dm.preprocess.voxel import voxel_downsample_host
    if config is None:
        config = PipelineConfig.with_voxel_size(0.3)
    if key is None:
        key = jax.random.PRNGKey(0)

    def down(pts):
        d = voxel_downsample_host(pts, config.preprocess.voxel_size)
        pp = config.preprocess
        return down_features(
            d,
            pp.normal_radius,
            pp.fpfh_radius,
            normal_max_nn=pp.normal_max_nn,
            fpfh_max_nn=pp.fpfh_max_nn,
            share_knn=pp.normal_radius <= pp.fpfh_radius,
        )

    src_down, tgt_down = down(src_pts), down(tgt_pts)
    coarse = coarse_pose_with_verification(
        src_down, tgt_down, config, key, restarts=restarts
    )

    # Point-to-plane polish on the downsampled clouds: point-to-point ICP
    # converges only linearly in rotation (measured: 1 deg residual after 30
    # full-res iterations), while the plane metric with the downsampled
    # normals reaches ~0.05 deg in a handful of iterations.
    from tpu3dm.registration.icp import icp_refine

    mid = icp_refine(
        src_down,
        tgt_down,
        coarse.transformation,
        dist_thresh=config.icp.dist_thresh,
        max_iterations=config.icp.max_iterations,
        point_to_plane=True,
    )

    if mesh is not None:
        from tpu3dm.parallel.sharded_icp import icp_refine_sharded

        nrm = None
        if point_to_plane:
            tgt_tmp = prepare_large_cloud(tgt_pts, block=block)
            # donor_normals works on the KD-sorted order; un-sort back to the
            # caller's point order for the sharded path.
            sorted_nrm = np.asarray(donor_normals(tgt_tmp, tgt_down))
            nrm = np.empty_like(sorted_nrm[: tgt_pts.shape[0]])
            nrm[tgt_tmp.perm] = sorted_nrm[: tgt_pts.shape[0]]
        fine = icp_refine_sharded(
            mesh,
            src_pts,
            tgt_pts,
            mid.transformation,
            tgt_normals=nrm,
            dist_thresh=config.icp.dist_thresh,
            max_iterations=config.icp.max_iterations,
            point_to_plane=point_to_plane,
            block_sparse=mesh_block_sparse,
            block=block,
            w=w,
        )
        return fine, coarse

    src = prepare_large_cloud(src_pts, block=block)
    tgt = prepare_large_cloud(tgt_pts, block=block)
    if point_to_plane:
        tgt = dataclasses.replace(tgt, normals=donor_normals(tgt, tgt_down))
    fine = icp_refine_large(
        src,
        tgt,
        mid.transformation,
        dist_thresh=config.icp.dist_thresh,
        max_iterations=config.icp.max_iterations,
        w=w,
        point_to_plane=point_to_plane,
    )
    return fine, coarse
