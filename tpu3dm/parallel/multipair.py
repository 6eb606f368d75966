"""Pair-axis data parallelism: many registrations in flight at once.

The reference registers exactly one pair per process (src/main.py:26-38).
The throughput metric (BASELINE.json: cloud-pairs/sec) wants a *batch* of
pairs: stack correspondence sets along a leading pair axis, shard that axis
over the ``pair`` mesh dimension, and vmap the single-pair registration step
inside each shard.  One dispatch registers P pairs across the whole slice.

The batched step is deliberately fixed-budget (scan over hypothesis chunks,
no data-dependent while_loop): under vmap an early-stopped lane would wait for
the slowest lane anyway, and fixed shapes keep one compiled program for every
batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3dm.ops.compact import compaction_permutation
from tpu3dm.parallel.mesh import PAIR_AXIS
from tpu3dm.registration.hypotheses import (
    prepare_correspondences,
    refit_inliers,
    sample_fit_score,
    winner_T,
)
from tpu3dm.registration.ransac import _sample_distinct_triples


def ransac_pair_step(
    p_all: jax.Array,
    q_all: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    dist_thresh: float,
    iterations: int,
    batch_size: int,
    edge_length_ratio: float = 0.9,
    refit: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Single-pair fixed-budget RANSAC core (vmap-friendly).

    Planar hypothesis chunks (registration/hypotheses.py) under lax.scan;
    optional exact Horn re-fit of the winner on its inlier set.

    Returns (best_T [4,4], best_count scalar int32).
    """
    thresh_sq = jnp.float32(dist_thresh) ** 2
    order = compaction_permutation(valid)
    p_all = p_all[order]
    q_all = q_all[order]
    valid = valid[order]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    n_chunks = max(1, iterations // batch_size)
    pq, F, c = prepare_correspondences(p_all, q_all)

    def chunk(carry, k_chunk):
        best_T, best_count = carry
        triples = _sample_distinct_triples(k_chunk, batch_size, jnp.maximum(n_valid, 3))
        R, t, counts = sample_fit_score(
            pq, F, c, valid, triples, thresh_sq,
            edge_length_ratio=edge_length_ratio,
        )
        k = jnp.argmax(counts)
        better = counts[k] > best_count
        return (
            jnp.where(better, winner_T(R, t, k), best_T),
            jnp.where(better, counts[k], best_count),
        ), None

    keys = jax.random.split(key, n_chunks)
    (best_T, best_count), _ = jax.lax.scan(
        chunk, (jnp.eye(4, dtype=jnp.float32), jnp.int32(-1)), keys
    )
    best_count = jnp.maximum(best_count, 0)
    if refit:
        best_T, best_count = refit_inliers(
            best_T, best_count, p_all, q_all, valid, thresh_sq
        )
    return best_T, best_count


@functools.partial(
    jax.jit, static_argnames=("mesh", "iterations", "batch_size", "dist_thresh")
)
def batched_ransac(
    mesh: Mesh,
    p_batch: jax.Array,
    q_batch: jax.Array,
    valid_batch: jax.Array,
    keys: jax.Array,
    *,
    dist_thresh: float,
    iterations: int = 4096,
    batch_size: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Register a batch of pairs, pair axis sharded over the mesh.

    Args:
      p_batch, q_batch: [P, M, 3] correspondence points per pair.
      valid_batch: [P, M] masks.
      keys: [P, 2] uint32 PRNG keys (one per pair).

    Returns:
      (T [P, 4, 4], fitness [P]).
    """
    shard = NamedSharding(mesh, P(PAIR_AXIS))
    p_batch = jax.lax.with_sharding_constraint(p_batch, shard)
    q_batch = jax.lax.with_sharding_constraint(q_batch, shard)
    valid_batch = jax.lax.with_sharding_constraint(valid_batch, shard)

    step = functools.partial(
        ransac_pair_step,
        dist_thresh=dist_thresh,
        iterations=iterations,
        batch_size=batch_size,
    )
    Ts, counts = jax.vmap(step)(p_batch, q_batch, valid_batch, keys)
    n_valid = jnp.maximum(jnp.sum(valid_batch.astype(jnp.int32), axis=1), 1)
    fitness = counts.astype(jnp.float32) / n_valid.astype(jnp.float32)
    return Ts, fitness
