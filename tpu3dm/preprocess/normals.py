"""Normal estimation: blocked radius-covariance + closed-form 3x3 eigen.

Replaces Open3D's KDTree-based ``estimate_normals`` (reference calls:
ply.py:110-112 on the downsampled cloud, ply.py:123-135 full-res; radius =
2 * voxel, max 30 neighbours).  TPU-native formulation: the per-point
neighbourhood covariance over a radius is accumulated blockwise from pairwise
distances —

    count_i  = sum_j m_ij                 (VPU reduce)
    sum_i    = M @ P                      ([TQ,TN] x [TN,3]  -> MXU)
    sumsq_i  = M @ P2                     ([TQ,TN] x [TN,6]  -> MXU, P2 = unique
                                           entries of p p^T per target point)

so the hot loop is matmuls, not tree traversal.  The smallest eigenvector of
the covariance is the normal (ops/eigh3).

Deviations from Open3D, by design (documented):
  - no max_nn=30 cap: all neighbours in the radius contribute (the cap is a
    KDTree-cost bound, not an accuracy feature; radius dominates the estimate);
  - orientation: normals point outward from the cloud centroid
    (rotation-equivariant and deterministic; Open3D leaves eigensolver sign).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dm.core.cloud import PAD_SENTINEL, PointCloud
from tpu3dm.ops.eigh3 import smallest_eigvec_sym3


@functools.partial(jax.jit, static_argnames=("chunk",))
def radius_covariance_stats(
    points: jax.Array,
    mask: jax.Array,
    radius: jax.Array | float,
    *,
    chunk: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Blockwise neighbourhood statistics within ``radius`` (self included).

    Returns (count [N], sum [N,3], sumsq [N,6]) where sumsq rows hold the
    unique entries (xx, yy, zz, xy, xz, yz) of sum of p p^T over neighbours.
    """
    n, _ = points.shape
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    safe = jnp.where(mask[:, None], points, PAD_SENTINEL)
    p2cols = jnp.stack(
        [
            points[:, 0] * points[:, 0],
            points[:, 1] * points[:, 1],
            points[:, 2] * points[:, 2],
            points[:, 0] * points[:, 1],
            points[:, 0] * points[:, 2],
            points[:, 1] * points[:, 2],
        ],
        axis=1,
    )  # [N, 6]

    chunk = min(chunk, n)
    pad = (-n) % chunk
    tgt = jnp.concatenate([safe, jnp.full((pad, 3), PAD_SENTINEL)], axis=0) if pad else safe
    tgt_feats = (
        jnp.concatenate([p2cols, jnp.zeros((pad, 6), jnp.float32)], axis=0)
        if pad
        else p2cols
    )
    tgt_valid = (
        jnp.concatenate([mask, jnp.zeros((pad,), bool)], axis=0) if pad else mask
    )
    nb = tgt.shape[0] // chunk
    tb = tgt.reshape(nb, chunk, 3)
    fb = tgt_feats.reshape(nb, chunk, 6)
    vb = tgt_valid.reshape(nb, chunk)
    tsq = jnp.sum(tb * tb, axis=-1)  # [nb, chunk]
    qsq = jnp.sum(safe * safe, axis=-1)  # [N]

    def inner(q, q2):
        """Accumulate neighbour stats for one query block against all target
        blocks.  q: [QC,3], q2: [QC] squared norms."""

        def body(carry, blk):
            cnt, s, ss = carry
            t, f, v, t2 = blk
            cross = q @ t.T  # [QC, chunk] MXU
            d2 = q2[:, None] + t2[None, :] - 2.0 * cross
            m = (d2 <= r2) & v[None, :]
            mf = m.astype(jnp.float32)
            cnt = cnt + jnp.sum(mf, axis=1)
            s = s + mf @ t  # [QC,3] MXU
            ss = ss + mf @ f  # [QC,6] MXU
            return (cnt, s, ss), None

        qc = q.shape[0]
        init = (
            jnp.zeros((qc,), jnp.float32),
            jnp.zeros((qc, 3), jnp.float32),
            jnp.zeros((qc, 6), jnp.float32),
        )
        (cnt, s, ss), _ = jax.lax.scan(body, init, (tb, fb, vb, tsq))
        return cnt, s, ss

    # Query-axis blocking: a single [N, chunk] distance slab is 4 GB at
    # N = 1M, so large clouds stream query blocks through the same inner
    # scan (peak activation [QC, chunk]); small clouds keep the one-slab
    # fast path.  Shapes are static under jit, so this branch is free.
    query_chunk = 8192
    if n <= query_chunk:
        return inner(safe, qsq)
    qpad = (-n) % query_chunk
    q_all = (
        jnp.concatenate([safe, jnp.full((qpad, 3), PAD_SENTINEL)], axis=0)
        if qpad
        else safe
    )
    q2_all = (
        jnp.concatenate([qsq, jnp.zeros((qpad,), jnp.float32)], axis=0)
        if qpad
        else qsq
    )
    nqb = q_all.shape[0] // query_chunk
    cnt, s, ss = jax.lax.map(
        lambda args: inner(*args),
        (
            q_all.reshape(nqb, query_chunk, 3),
            q2_all.reshape(nqb, query_chunk),
        ),
    )
    return (
        cnt.reshape(-1)[:n],
        s.reshape(-1, 3)[:n],
        ss.reshape(-1, 6)[:n],
    )


def _covariance_from_stats(cnt, s, ss):
    """[N,3,3] covariance from accumulated moments."""
    k = jnp.maximum(cnt, 1.0)[:, None]
    mean = s / k
    exx = ss / k  # E[p p^T] unique entries
    cov = jnp.stack(
        [
            exx[:, 0] - mean[:, 0] * mean[:, 0],
            exx[:, 3] - mean[:, 0] * mean[:, 1],
            exx[:, 4] - mean[:, 0] * mean[:, 2],
            exx[:, 3] - mean[:, 0] * mean[:, 1],
            exx[:, 1] - mean[:, 1] * mean[:, 1],
            exx[:, 5] - mean[:, 1] * mean[:, 2],
            exx[:, 4] - mean[:, 0] * mean[:, 2],
            exx[:, 5] - mean[:, 1] * mean[:, 2],
            exx[:, 2] - mean[:, 2] * mean[:, 2],
        ],
        axis=1,
    ).reshape(-1, 3, 3)
    return cov


@functools.partial(jax.jit, static_argnames=("chunk",))
def estimate_normals(
    pc: PointCloud,
    radius: jax.Array | float,
    *,
    chunk: int = 1024,
) -> PointCloud:
    """Per-point unit normals from radius-neighbourhood covariance.

    Orientation: outward from the cloud centroid (see module docstring).
    Points with < 3 neighbours get the degenerate fallback direction.
    """
    cnt, s, ss = radius_covariance_stats(pc.points, pc.mask, radius, chunk=chunk)
    cov = _covariance_from_stats(cnt, s, ss)
    _, v = smallest_eigvec_sym3(cov)
    # Orient outward from the global centroid (rotation-equivariant).
    c = pc.centroid()
    outward = pc.points - c[None, :]
    flip = jnp.sum(v * outward, axis=1) < 0.0
    v = jnp.where(flip[:, None], -v, v)
    v = jnp.where(pc.mask[:, None], v, 0.0)
    return pc.with_(normals=v)


def normals_from_knn(
    pc: PointCloud, idx: jax.Array, valid: jax.Array
) -> PointCloud:
    """Normals from precomputed kNN slots (idx [N,K], valid [N,K]).

    Core of ``estimate_normals_capped``, split out so the ingest pipeline can
    feed both this and the capped FPFH from ONE nn_topk scan (the slots are
    distance-ascending, so the first k_normals slots re-masked by the normal
    radius are exactly the hybrid-search neighbour set).
    """
    pj = pc.points[idx]  # [N, K, 3]
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.einsum("nk,nkd->nd", w, pj) / cnt[:, None]
    c = pj - mean[:, None, :]
    c = c * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", c, c) / cnt[:, None, None]
    _, v = smallest_eigvec_sym3(cov)
    ctr = pc.centroid()
    outward = pc.points - ctr[None, :]
    flip = jnp.sum(v * outward, axis=1) < 0.0
    v = jnp.where(flip[:, None], -v, v)
    v = jnp.where(pc.mask[:, None], v, 0.0)
    return pc.with_(normals=v)


@functools.partial(jax.jit, static_argnames=("max_nn", "chunk"))
def estimate_normals_capped(
    pc: PointCloud,
    radius: jax.Array | float,
    *,
    max_nn: int = 30,
    chunk: int = 1024,
) -> PointCloud:
    """Normals from the max_nn NEAREST neighbours within the radius.

    Open3D ``KDTreeSearchParamHybrid(radius, max_nn)`` semantics (reference:
    ply.py:110-112, max_nn=30): the covariance is over the k nearest in-radius
    points (self included), not the full radius set.  Orientation matches
    ``estimate_normals`` (outward from the cloud centroid).
    """
    from tpu3dm.ops.topk import nn_topk

    n = pc.points.shape[0]
    _, idx, valid = nn_topk(
        jnp.where(pc.mask[:, None], pc.points, PAD_SENTINEL),
        jnp.where(pc.mask[:, None], pc.points, PAD_SENTINEL),
        pc.mask,
        pc.mask,
        k=min(max_nn, n),
        radius=radius,
        chunk=chunk,
    )
    return normals_from_knn(pc, idx, valid)
