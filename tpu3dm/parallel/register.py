"""Mesh-sharded batched registration — the multi-host pairs/s path.

Combines the pair-DP sharding of parallel/multipair.py with the complete
fused register step (registration/fused.py: correspondence NN -> RANSAC ->
ICP): a batch of preprocessed pairs, stacked to one capacity, is sharded over
the ``pair`` mesh axis and registered in ONE dispatch per slice.  This is the
unit the scaling-efficiency benchmark (apps/benchmark.py --scaling) measures
at mesh sizes 1..N, per BASELINE.json ("cloud-pairs/s scaling efficiency
measured at 1 chip, 1 host, and N hosts").

Deterministic: results depend only on the inputs and per-pair keys, not on
the mesh layout — tests assert bit-comparable outputs across mesh sizes.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3dm.parallel.mesh import PAIR_AXIS
from tpu3dm.registration.fused import fused_register_step


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "dist_thresh",
        "icp_thresh",
        "ransac_iterations",
        "icp_iterations",
        "icp_solves_per_nn",
        "approx_score",
        "rescue_restarts",
        "verify_iters",
        "score_subset",
        "rescore_top",
        "sample_mode",
        "adapt_iterations",
    ),
)
def batched_register(
    mesh: Mesh,
    src_pts: jax.Array,
    src_feat: jax.Array,
    src_mask: jax.Array,
    src_normals: jax.Array,
    tgt_pts: jax.Array,
    tgt_feat: jax.Array,
    tgt_mask: jax.Array,
    tgt_normals: jax.Array,
    keys: jax.Array,
    *,
    dist_thresh: float = 0.45,
    icp_thresh: float = 0.12,
    ransac_iterations: int = 4096,
    icp_iterations: int = 8,
    icp_solves_per_nn: int = 1,
    approx_score: bool = False,
    rescue_restarts: int = 0,
    verify_iters: int = 8,
    score_subset: int = 0,
    rescore_top: int = 128,
    sample_mode: str = "roll",
    adapt_iterations: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Register [P, ...] stacked pairs, pair axis sharded over the mesh.

    Returns (T [P, 4, 4], ransac_fitness [P], icp_rmse [P]).
    """
    shard = NamedSharding(mesh, P(PAIR_AXIS))
    arrays = [
        jax.lax.with_sharding_constraint(a, shard)
        for a in (
            src_pts, src_feat, src_mask, src_normals,
            tgt_pts, tgt_feat, tgt_mask, tgt_normals, keys,
        )
    ]
    step = functools.partial(
        fused_register_step,
        dist_thresh=dist_thresh,
        icp_thresh=icp_thresh,
        ransac_iterations=ransac_iterations,
        ransac_batch=min(ransac_iterations, 4096),
        icp_iterations=icp_iterations,
        icp_solves_per_nn=icp_solves_per_nn,
        approx_score=approx_score,
        rescue_restarts=rescue_restarts,
        verify_iters=verify_iters,
        score_subset=score_subset,
        rescore_top=rescore_top,
        sample_mode=sample_mode,
        adapt_iterations=adapt_iterations,
    )
    return jax.vmap(step)(*arrays)
