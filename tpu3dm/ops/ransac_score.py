"""Batched RANSAC hypothesis scoring as one MXU matmul.

Replaces the reference's per-iteration inlier evaluation
(src/matcher/ransac.py:195-277: transform all matched source points, count
pairs within threshold) — measured there at 0.50 ms per *single* hypothesis on
CPU (benchmark_results.txt:9), 66% of RANSAC iteration time.

TPU-native reformulation: for hypothesis k with rotation R_k, translation t_k
and correspondence pair (p_n, q_n),

    d2(k, n) = |R_k p_n + t_k - q_n|^2
             = (|p_n|^2 + |q_n|^2) + |t_k|^2
               + [ p_n, vec(q_n p_n^T), q_n ] . [ 2 R_k^T t_k, -2 vec(R_k), -2 t_k ]

i.e. a rank-15 bilinear form: scoring K hypotheses against N correspondences is
ONE [K,15] @ [15,N] matmul plus broadcast adds, a compare, and a row reduction.
At K=N=4096 that is ~0.5 GFLOP — microseconds on the MXU, versus 4096 x 0.5 ms
sequential on the reference path.

The Pallas kernel tiles over (k, n) and accumulates inlier counts in VMEM so
the [K, N] matrix never touches HBM.  ``score_hypotheses_xla`` is the
any-backend parity oracle using the same algebra with a lax.scan over n-chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FEAT_DIM = 16  # 15 used + 1 zero pad lane for alignment


def corres_features(p: jax.Array, q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-correspondence feature rows for the bilinear score.

    Args:
      p: [N, 3] source points (gathered by correspondence).
      q: [N, 3] target points.

    Returns:
      (F [N, 16], c [N]) with F = [p, vec(q p^T), q, 0] and
      c = |p|^2 + |q|^2.
    """
    outer = (q[:, :, None] * p[:, None, :]).reshape(-1, 9)  # vec(q p^T), row-major
    pad = jnp.zeros((p.shape[0], 1), p.dtype)
    F = jnp.concatenate([p, outer, q, pad], axis=1)
    c = jnp.sum(p * p, axis=1) + jnp.sum(q * q, axis=1)
    return F, c


def hypothesis_features(R: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-hypothesis feature rows.

    Args:
      R: [K, 3, 3] rotations.
      t: [K, 3] translations.

    Returns:
      (H [K, 16], e [K]) with H = [2 R^T t, -2 vec(R), -2 t, 0] and e = |t|^2.
    """
    k = R.shape[0]
    Rt_t = jnp.einsum("kij,ki->kj", R, t)  # R^T t
    H = jnp.concatenate(
        [2.0 * Rt_t, -2.0 * R.reshape(k, 9), -2.0 * t, jnp.zeros((k, 1), R.dtype)],
        axis=1,
    )
    e = jnp.sum(t * t, axis=1)
    return H, e


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("chunk",))
def score_hypotheses_xla(
    R: jax.Array,
    t: jax.Array,
    p: jax.Array,
    q: jax.Array,
    mask: jax.Array,
    dist_thresh_sq: jax.Array | float,
    *,
    chunk: int = 4096,
) -> jax.Array:
    """Inlier counts [K] int32 for K hypotheses over N masked correspondences."""
    F, c = corres_features(p, q)
    H, e = hypothesis_features(R, t)
    n = F.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        F = jnp.concatenate([F, jnp.zeros((pad, _FEAT_DIM), F.dtype)], axis=0)
        c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)], axis=0)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)], axis=0)
    n_chunks = F.shape[0] // chunk
    Fb = F.reshape(n_chunks, chunk, _FEAT_DIM)
    cb = c.reshape(n_chunks, chunk)
    mb = mask.reshape(n_chunks, chunk)
    thresh = jnp.asarray(dist_thresh_sq, jnp.float32)

    def body(acc, blk):
        f, cc, mm = blk
        d2 = H @ f.T + cc[None, :] + e[:, None]  # [K, chunk]
        hits = (d2 < thresh) & mm[None, :]
        return acc + jnp.sum(hits, axis=1, dtype=jnp.int32), None

    # zeros_like so the carry inherits R's varying axes under shard_map.
    init = jnp.zeros_like(R[:, 0, 0], dtype=jnp.int32)
    counts, _ = jax.lax.scan(body, init, (Fb, cb, mb))
    return counts


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _score_kernel(h_ref, e_ref, f_ref, c_ref, m_ref, thr_ref, out_ref):
    """Accumulate inlier counts for one (k-tile, n-tile) grid step."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    h = h_ref[:, :]  # [TK, 16]
    f = f_ref[:, :]  # [TN, 16]
    d2 = jax.lax.dot_general(
        h,
        f,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TK, TN]
    d2 = d2 + c_ref[0, :][None, :] + e_ref[0, :][:, None]
    hits = (d2 < thr_ref[0]) & (m_ref[0, :] > 0)[None, :]
    out_ref[0, :] = out_ref[0, :] + jnp.sum(hits.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("tile_k", "tile_n", "interpret"))
def score_hypotheses_pallas(
    R: jax.Array,
    t: jax.Array,
    p: jax.Array,
    q: jax.Array,
    mask: jax.Array,
    dist_thresh_sq: jax.Array | float,
    *,
    tile_k: int = 256,
    tile_n: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Pallas tiled inlier counting (same contract as score_hypotheses_xla).

    Tile defaults from an on-chip sweep (65536^2, v5e): wide-short (256 x
    4096+) beats square tiles by ~9% by amortizing per-matmul pipeline
    overhead; 16 MB tiles fail VMEM compile.
    """
    F, c = corres_features(p, q)
    H, e = hypothesis_features(R, t)
    k = H.shape[0]
    n = F.shape[0]

    def padto(a, size, fill=0.0):
        pad = size - a.shape[0]
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    tile_k = min(tile_k, max(128, k))
    tile_n = min(tile_n, max(128, n))
    k_p = ((k + tile_k - 1) // tile_k) * tile_k
    n_p = ((n + tile_n - 1) // tile_n) * tile_n
    H_p = padto(H, k_p)
    e_p = padto(e, k_p)
    F_p = padto(F, n_p)
    c_p = padto(c, n_p)
    m_p = padto(mask.astype(jnp.int32), n_p)

    grid = (k_p // tile_k, n_p // tile_n)
    counts = pl.pallas_call(
        _score_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_k, _FEAT_DIM), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, _FEAT_DIM), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_k), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k_p), jnp.int32),
        interpret=interpret,
    )(
        H_p,
        e_p.reshape(1, k_p),
        F_p,
        c_p.reshape(1, n_p),
        m_p.reshape(1, n_p),
        jnp.asarray([dist_thresh_sq], jnp.float32),
    )
    return counts[0, :k]


# Below this many hypothesis x correspondence entries the [K, N] score matrix
# is materialized outright (one batched MXU matmul + compare + reduce, fully
# fused by XLA).  Above it, the Pallas kernel tiles with on-chip accumulation.
DENSE_MAX_ENTRIES = 1 << 24  # 16M entries = 64 MB fp32


def score_hypotheses_dense(
    R: jax.Array,
    t: jax.Array,
    p: jax.Array,
    q: jax.Array,
    mask: jax.Array,
    dist_thresh_sq: jax.Array | float,
) -> jax.Array:
    """Inlier counts with the [K, N] distance matrix materialized."""
    F, c = corres_features(p, q)
    H, e = hypothesis_features(R, t)
    d2 = H @ F.T + c[None, :] + e[:, None]
    hits = (d2 < jnp.asarray(dist_thresh_sq, jnp.float32)) & mask[None, :]
    return jnp.sum(hits, axis=1, dtype=jnp.int32)


def score_hypotheses(
    R: jax.Array,
    t: jax.Array,
    p: jax.Array,
    q: jax.Array,
    mask: jax.Array,
    dist_thresh_sq: jax.Array | float,
    **kw,
) -> jax.Array:
    """Size- and backend-adaptive hypothesis scorer → inlier counts [K] int32."""
    if R.shape[0] * p.shape[0] <= DENSE_MAX_ENTRIES:
        return score_hypotheses_dense(R, t, p, q, mask, dist_thresh_sq)
    if jax.default_backend() in ("cpu",):
        return score_hypotheses_xla(R, t, p, q, mask, dist_thresh_sq)
    return score_hypotheses_pallas(R, t, p, q, mask, dist_thresh_sq, **kw)
