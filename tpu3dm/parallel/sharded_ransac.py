"""Hypothesis-parallel RANSAC — the TP/EP analog for this workload.

RANSAC hypotheses are embarrassingly parallel: shard each chunk of K
hypotheses over the ``block`` mesh axis (K/B per device), fit + checker + score
locally with the same kernels as the single-chip path, then elect the global
best with an all_gather/argmax collective (SURVEY.md §2.3's "psum/argmax best
hypothesis election").  Correspondence arrays are replicated within the pair
group — they are small (M x 3 floats) next to the hypothesis work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpu3dm.ops.compact import compaction_permutation
from tpu3dm.parallel.mesh import BLOCK_AXIS
from tpu3dm.registration.hypotheses import (
    prepare_correspondences,
    sample_fit_score,
    winner_T,
)
from tpu3dm.registration.ransac import _sample_distinct_triples
from tpu3dm.registration.result import RegistrationResult


def sharded_ransac(
    mesh: Mesh,
    p_all: jax.Array,
    q_all: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    dist_thresh: float,
    iterations: int = 16384,
    edge_length_ratio: float = 0.9,
    use_checkers: bool = True,
) -> RegistrationResult:
    """Fixed-budget RANSAC with hypotheses sharded over the block axis.

    ``iterations`` hypotheses total, split evenly across the block axis; every
    device sees the full (replicated) correspondence set and scores only its
    shard.  Deterministic: per-device PRNG folds the axis index.
    """
    nb = mesh.shape[BLOCK_AXIS]
    k_local = max(1, iterations // nb)
    thresh = jnp.float32(dist_thresh)
    thresh_sq = thresh * thresh

    # Compact valid rows forward (replicated op) for uniform index sampling.
    order = compaction_permutation(valid)
    p_all = p_all[order]
    q_all = q_all[order]
    valid = valid[order]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    def kernel(p, q, v, key):
        me = jax.lax.axis_index(BLOCK_AXIS)
        k_dev = jax.random.fold_in(key[0], me)
        triples = _sample_distinct_triples(k_dev, k_local, jnp.maximum(n_valid, 3))
        pq, F, c = prepare_correspondences(p, q)
        R, t, counts = sample_fit_score(
            pq, F, c, v, triples, thresh_sq,
            edge_length_ratio=edge_length_ratio,
            use_checkers=use_checkers,
        )
        local_best = jnp.argmax(counts)
        local_count = counts[local_best]
        local_T = winner_T(R, t, local_best)

        # Election: gather per-device champions, argmax over the ring.
        all_counts = jax.lax.all_gather(local_count, BLOCK_AXIS)  # [B]
        all_T = jax.lax.all_gather(local_T, BLOCK_AXIS)  # [B,4,4]
        win = jnp.argmax(all_counts)
        return all_T[win], all_counts[win]

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are value-replicated post-election; the
        # static checker cannot infer that through all_gather+argmax
    )
    best_T, best_count = fn(p_all, q_all, valid, key[None])
    best_count = jnp.maximum(best_count, 0)
    fitness = best_count.astype(jnp.float32) / jnp.maximum(n_valid, 1)
    moved = p_all @ best_T[:3, :3].T + best_T[:3, 3]
    d2 = jnp.sum((moved - q_all) ** 2, axis=1)
    inl = (d2 < thresh_sq) & valid
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(jnp.sum(inl), 1))
    return RegistrationResult(
        transformation=best_T,
        fitness=fitness,
        inlier_rmse=rmse,
        iterations=jnp.int32(k_local * nb),
    )
