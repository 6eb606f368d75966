"""Feature-space correspondences: NN in FPFH space, mutual filter, noise.

Replaces ``correspondences_from_features`` + the reference's noise-injection
wrapper (src/matcher/ransac.py:62-101).  The 33-D feature NN ride the same
tiled distance kernel as geometry NN (ops/nn.py); the mutual filter is two
directed argmin passes plus an equality check (reference semantics:
``mutual_filter=True`` keeps pairs that are nearest in both directions,
ransac.py:47,85).

Static shapes: the correspondence set is fixed at source capacity with a
validity mask; noise injection *overwrites* masked-off slots with random pairs
rather than growing the array (same distribution of bogus pairs as the
reference's vstack+shuffle, ransac.py:89-99, without a dynamic shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dm.core.cloud import PointCloud
from tpu3dm.ops.nn import nn_mutual, nn_search


def _feature_nn(query_f, target_f, query_mask, target_mask):
    return nn_search(query_f, target_f, query_mask, target_mask)


@functools.partial(jax.jit, static_argnames=("mutual_filter",))
def feature_correspondences(
    src: PointCloud,
    tgt: PointCloud,
    *,
    mutual_filter: bool = False,
    noise_ratio: float | jax.Array = 0.0,
    key: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Correspondence pairs from FPFH nearest neighbours.

    Args:
      src, tgt: preprocessed downsampled clouds with ``features`` set.
      mutual_filter: keep only pairs that are mutual nearest neighbours.
      noise_ratio: fraction of valid pairs to corrupt with random (src, tgt)
        indices — robustness-testing fault injection (ransac.py:89-99).  With
        static shapes the bogus pairs replace a random subset rather than being
        appended; at ratio r, r/(1+r) of surviving pairs are corrupted,
        matching the reference's post-shuffle noise fraction.
      key: PRNG key (required when noise_ratio > 0).

    Returns:
      (pairs [Ns, 2] int32 rows [src_idx, tgt_idx], valid [Ns] bool).
    """
    ns = src.capacity
    valid = src.mask
    if mutual_filter:
        # One distance matrix, two axis reductions (ops/nn.py nn_mutual).
        idx_fwd, idx_bwd = nn_mutual(src.features, tgt.features, src.mask, tgt.mask)
        mutual = idx_bwd[idx_fwd] == jnp.arange(ns, dtype=jnp.int32)
        valid = valid & mutual
    else:
        _, idx_fwd = _feature_nn(src.features, tgt.features, src.mask, tgt.mask)
    pairs = jnp.stack([jnp.arange(ns, dtype=jnp.int32), idx_fwd], axis=1)

    noise_ratio = jnp.asarray(noise_ratio, jnp.float32)

    def inject(args):
        pairs, valid, key = args
        k1, k2, k3 = jax.random.split(key, 3)
        # Corrupt each valid pair with prob r/(1+r): reproduces the reference's
        # final mixture where n_noise = r * n_valid bogus pairs are shuffled
        # into the list (ransac.py:92-99).
        p_corrupt = noise_ratio / (1.0 + noise_ratio)
        corrupt = (jax.random.uniform(k1, (ns,)) < p_corrupt) & valid
        # Random indices land in [0, count): valid points occupy the first
        # `count` slots for compacted clouds (the preprocess pipeline
        # guarantees this layout).
        n_src = jnp.maximum(jnp.sum(src.mask.astype(jnp.int32)), 1)
        n_tgt = jnp.maximum(jnp.sum(tgt.mask.astype(jnp.int32)), 1)
        rand_src = jax.random.randint(k2, (ns,), 0, n_src)
        rand_tgt = jax.random.randint(k3, (ns,), 0, n_tgt)
        noisy = jnp.stack([rand_src, rand_tgt], axis=1)
        return jnp.where(corrupt[:, None], noisy, pairs), valid

    def no_inject(args):
        pairs, valid, _ = args
        return pairs, valid

    if key is None:
        key = jax.random.PRNGKey(0)
    pairs, valid = jax.lax.cond(
        noise_ratio > 0.0, inject, no_inject, (pairs, valid, key)
    )
    return pairs, valid


def gather_pairs(
    src: PointCloud, tgt: PointCloud, pairs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Gather (p, q) point arrays for correspondence pairs — the hoisted-gather
    optimization the reference applies per run (_visualize_matcher.py:375-384,
    evaluate_inlier_ratio_fast precomputation)."""
    return src.points[pairs[:, 0]], tgt.points[pairs[:, 1]]
