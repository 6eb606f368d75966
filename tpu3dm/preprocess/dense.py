"""Dense (gather-free) capped normals + FPFH — the streaming fast path.

The slot-based feature pipeline (ops/topk.py scan -> normals_from_knn /
fpfh_from_knn) pays for TPU-hostile primitives at ingest shapes: a top-k
scan with buffer concats, then [N, K, 3]/[N, K, 33] row gathers and
one-hot einsums over gathered slots.  Measured on v5e (round 4, 256 clouds
x cap 896, k=100): nn_topk 521 ms + normals/FPFH-from-slots 725 ms per
window — 87% of the whole fused ingest+register program.

This module reformulates BOTH stages over the dense [M, M] pairwise
distance matrix that a capped search needs anyway:

  - the k-nearest cap becomes a per-row distance THRESHOLD (the k-th
    smallest, one ``lax.top_k``), turning neighbour selection into a
    boolean mask W;
  - normals become masked-matmul moments (W @ pts, W @ outer(pts)) + the
    closed-form 3x3 eigensolver — zero gathers, MXU contractions;
  - FPFH pair features evaluate densely over all pairs (VPU elementwise,
    fused by XLA into the histogram contraction), and the neighbour-SPFH
    accumulation becomes ONE [M, M] @ [M, 33] matmul.

Semantics match the slot path (Open3D hybrid-search cap + Feature.cpp
binning) except for exact distance TIES at the k-th neighbour: the slot
path keeps the smaller index, the threshold keeps all tied entries.  Ties
are measure-zero for real scan data; the voxel-downsampled clouds this
path serves cannot contain duplicate points.  Parity is pinned in
tests/test_preprocess.py (exact-match fixtures, plus end-to-end
registration quality through the fused stream).

Numerical note: the dense covariance uses the E[xx^T] - mu mu^T form
(per-row centering would need the [M, M, 3] materialization this module
exists to avoid); points are pre-centered by the cloud centroid to keep
the cancellation benign (fp32 normal wobble ~1e-3 rad, below FPFH bin
resolution for all but boundary pairs).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from tpu3dm.core.cloud import PAD_SENTINEL, PointCloud
from tpu3dm.ops.eigh3 import smallest_eigvec_sym3
from tpu3dm.preprocess.fpfh import _EPS, _NBINS, _pair_features

BIG = 1.0e12

# Column-chunk width for the SPFH pair-feature scan (see down_features_dense).
# 0 = one-shot [M, M] formulation; overridable for A/B via env.
_PAIR_CHUNK = int(os.environ.get("TPU3DM_FPFH_PAIR_CHUNK", "128"))


def _dense_d2(pts: jax.Array, mask: jax.Array) -> jax.Array:
    """[M, M] squared distances; rows/cols of invalid points -> BIG.

    The diagonal is pinned to EXACT zero: the |a|^2+|b|^2-2ab matmul form
    leaves fp residue up to ~1e-5 on the self-distance, which would leak
    the self-pair past FPFH's ``d2 > eps`` exclusion with a 1/d^2 weight
    of ~1e5 (measured: 29/649 points with ~87% histogram corruption before
    this pin)."""
    sq = jnp.sum(pts * pts, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (pts @ pts.T)
    d2 = jnp.maximum(d2, 0.0)
    n = pts.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye, 0.0, d2)
    ok = mask[:, None] & mask[None, :]
    return jnp.where(ok, d2, BIG)


def _kth_thresh(d2: jax.Array, k: int) -> jax.Array:
    """Per-row k-th smallest distance (one top_k; [M])."""
    neg, _ = jax.lax.top_k(-d2, k)
    return -neg[:, -1]


def down_features_dense(
    pc: PointCloud,
    normal_radius: jax.Array | float,
    fpfh_radius: jax.Array | float,
    *,
    normal_max_nn: int,
    fpfh_max_nn: int,
) -> PointCloud:
    """Capped normals + FPFH over the dense pair matrix (see module doc)."""
    m = pc.mask
    ctr = pc.centroid()
    pts = jnp.where(m[:, None], pc.points - ctr[None, :], PAD_SENTINEL)
    n = pts.shape[0]
    d2 = _dense_d2(pts, m)
    r2_n = jnp.asarray(normal_radius, jnp.float32) ** 2
    r2_f = jnp.asarray(fpfh_radius, jnp.float32) ** 2

    # One top_k to the LARGER cap serves both thresholds (slots ascend) —
    # regardless of which cap is larger, and a cap of 0 means uncapped
    # (radius-only threshold, matching the slot path's fast mode).  The
    # earlier form indexed vals[:, kn-1] from a kf-wide top_k, which
    # trace-errored whenever normal_max_nn > fpfh_max_nn or fpfh_max_nn=0.
    kf = min(fpfh_max_nn, n) if fpfh_max_nn > 0 else 0
    kn = min(normal_max_nn, n) if normal_max_nn > 0 else 0
    kmax = max(kf, kn)
    if kmax > 0:
        neg, _ = jax.lax.top_k(-d2, kmax)
        vals = -neg  # [M, kmax] ascending
    th_f = jnp.minimum(vals[:, kf - 1], r2_f) if kf > 0 else jnp.full((n,), r2_f)
    th_n = jnp.minimum(vals[:, kn - 1], r2_n) if kn > 0 else jnp.full((n,), r2_n)

    # --- normals: masked moment matmuls + closed-form smallest eigvec -----
    wn = (d2 <= th_n[:, None]).astype(jnp.float32)  # includes self (d2=0)
    cnt_n = jnp.maximum(wn.sum(axis=1), 1.0)
    pts0 = jnp.where(m[:, None], pts, 0.0)  # sentinel rows never selected
    mean = (wn @ pts0) / cnt_n[:, None]
    outer = (pts0[:, :, None] * pts0[:, None, :]).reshape(n, 9)  # [M, 9]
    second = (wn @ outer).reshape(n, 3, 3) / cnt_n[:, None, None]
    cov = second - mean[:, :, None] * mean[:, None, :]
    _, v = smallest_eigvec_sym3(cov)
    outward = pts0  # pre-centered: orientation vs cloud centroid
    flip = jnp.sum(v * outward, axis=1) < 0.0
    v = jnp.where(flip[:, None], -v, v)
    nrm = jnp.where(m[:, None], v, 0.0)

    # --- FPFH: dense pair features + histogram contractions ---------------
    # Column-chunked SPFH: the one-shot formulation materialized the full
    # [M, M]-pair Darboux chain (theta/alpha/phi plus a [M, M, 11] one-hot)
    # through HBM — measured ~100x off VPU op rate (181 ms per 256-cloud
    # window, docs/ROOFLINE.md).  Scanning over column chunks bounds every
    # intermediate to one [M, C] tile whose elementwise producers fuse
    # straight into 33 per-bin masked-count reductions (bin counts are
    # integer sums — order-independent, so results are bit-identical to
    # the one-shot form).  _PAIR_CHUNK=0 restores the one-shot formulation
    # (the A/B oracle).
    nb = (d2 <= th_f[:, None]) & (d2 > _EPS)  # exclude self; wgt matmul below

    def hist_of(x, lo, hi, nbc):
        b = jnp.floor((x - lo) / (hi - lo) * _NBINS).astype(jnp.int32)
        b = jnp.clip(b, 0, _NBINS - 1)
        return jnp.stack(
            [
                jnp.sum(jnp.where((b == k) & nbc, 1.0, 0.0), axis=1)
                for k in range(_NBINS)
            ],
            axis=1,
        )

    if _PAIR_CHUNK and n > _PAIR_CHUNK:
        chunk = _PAIR_CHUNK
        pad_c = (-n) % chunk
        n_chunks = (n + pad_c) // chunk
        if pad_c:
            # Far-away sentinel columns: never neighbours.
            d2p = jnp.concatenate([d2, jnp.full((n, pad_c), BIG)], axis=1)
            pts_cols = jnp.concatenate(
                [pts, jnp.full((pad_c, 3), PAD_SENTINEL, pts.dtype)], axis=0
            )
            nrm_cols = jnp.concatenate(
                [nrm, jnp.zeros((pad_c, 3), nrm.dtype)], axis=0
            )
        else:
            d2p, pts_cols, nrm_cols = d2, pts, nrm

        def spfh_chunk(carry, jc):
            acc, cnt = carry
            j0 = jc * chunk
            d2c = jax.lax.dynamic_slice_in_dim(d2p, j0, chunk, axis=1)
            pjc = jax.lax.dynamic_slice_in_dim(pts_cols, j0, chunk, axis=0)
            njc = jax.lax.dynamic_slice_in_dim(nrm_cols, j0, chunk, axis=0)
            nbc = (d2c <= th_f[:, None]) & (d2c > _EPS)
            dp = pjc[None, :, :] - pts[:, None, :]
            dist = jnp.sqrt(d2c)
            theta, alpha, phi = _pair_features(
                pts, nrm,
                jnp.broadcast_to(pjc[None, :, :], (n, chunk, 3)),
                jnp.broadcast_to(njc[None, :, :], (n, chunk, 3)),
                dp, dist, nbc,
            )
            h = jnp.concatenate(
                [hist_of(theta, -jnp.pi, jnp.pi, nbc),
                 hist_of(alpha, -1.0, 1.0, nbc),
                 hist_of(phi, -1.0, 1.0, nbc)],
                axis=1,
            )
            return (acc + h, cnt + jnp.sum(nbc.astype(jnp.float32), axis=1)), None

        (counts33, cnt), _ = jax.lax.scan(
            spfh_chunk,
            (jnp.zeros((n, 3 * _NBINS)), jnp.zeros((n,))),
            jnp.arange(n_chunks),
        )
    else:
        dp = pts[None, :, :] - pts[:, None, :]
        dist = jnp.sqrt(d2)
        theta, alpha, phi = _pair_features(
            pts, nrm,
            jnp.broadcast_to(pts[None, :, :], (n, n, 3)),
            jnp.broadcast_to(nrm[None, :, :], (n, n, 3)),
            dp, dist, nb,
        )
        counts33 = jnp.concatenate(
            [hist_of(theta, -jnp.pi, jnp.pi, nb),
             hist_of(alpha, -1.0, 1.0, nb),
             hist_of(phi, -1.0, 1.0, nb)],
            axis=1,
        )
        cnt = jnp.sum(nb.astype(jnp.float32), axis=1)
    hist_incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1.0), 0.0)
    spfh = counts33 * hist_incr[:, None]

    # Neighbour accumulation: ONE [M, M] @ [M, 33] matmul (the slot path's
    # spfh[idx] gather + einsum).
    wgt = jnp.where(nb, 1.0 / jnp.maximum(d2, _EPS), 0.0)
    acc = wgt @ spfh
    sub = acc.reshape(n, 3, _NBINS).sum(axis=2)
    scale = jnp.where(sub > 0, 100.0 / jnp.maximum(sub, _EPS), 0.0)
    fpfh = acc * jnp.repeat(scale, _NBINS, axis=1) + spfh
    fpfh = jnp.where(m[:, None], fpfh, 0.0)
    return pc.with_(normals=nrm, features=fpfh)
