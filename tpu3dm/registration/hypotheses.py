"""Planar (structure-of-arrays) RANSAC hypothesis evaluation.

The hypothesis chunk — sample K triples, fit K rigid transforms, checker-mask,
score — is the hottest loop in the framework (reference: one hypothesis per
Python iteration at 0.76 ms, src/matcher/ransac.py:104-277).  The first TPU
implementation fitted hypotheses with Horn's quaternion method on stacked
``[K, 3, 3]`` / ``[K, 4, 4]`` arrays; those shapes tile to (8, 128) on TPU, so
a 3- or 4-wide minor dimension pads 32-43x in VMEM/HBM and every slice of the
4x4 adjugate materialized a padded copy.  Measured at bench scale (256 pairs x
4096 hypotheses x 768 correspondences on v5e): the fit alone cost 180 ms of a
258 ms RANSAC step.

This module re-expresses the whole chunk on **planar [K]-shaped component
arrays** — lane-perfect for the VPU, with the only 2-D tensors being the
[K, 3] sample gathers, the [K, 16] hypothesis-feature stack, and the one
[K, M] MXU score matmul.  Same semantics, 3.6x faster (measured 292 -> 81 ms
for the full RANSAC step).

The triple fit is triangle-frame alignment (R = Fq Fp^T from orthonormal
triangle frames): exact for congruent triangles — i.e. for every all-inlier
sample, which is the case RANSAC election cares about — and O(40) VPU flops
per hypothesis instead of Horn's quartic-Newton + 4x4 adjugate.  Under noise
it is not the least-squares optimum, so ``refit_inliers`` re-fits the elected
winner on ALL its inliers with the exact weighted Horn solve (one fit, not K)
— strictly tighter than the reference, whose winner keeps the raw 3-point fit
(src/matcher/ransac.py:104-192).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dm.ops.ransac_score import corres_features
from tpu3dm.registration.kabsch import fit_rigid_horn

# Planar rotation: nested 3x3 tuple of [K] arrays.  Planar translation:
# 3-tuple of [K] arrays.
PlanarR = tuple[tuple[jax.Array, ...], ...]
PlanarT = tuple[jax.Array, jax.Array, jax.Array]


def _rsqrt_safe(x: jax.Array) -> jax.Array:
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _frame(ax, ay, az, bx, by, bz, cx, cy, cz):
    """Orthonormal triangle frame: e1 = normalize(b-a), e3 = normalize(e1 x
    (c-a)), e2 = e3 x e1.

    Returns (e1, e2, e3, ok).  ``ok`` is False for degenerate triangles
    (collinear/duplicate points), where the columns are not a valid frame and
    the resulting "rotation" would be a rank-deficient projection — those
    hypotheses must score -1 (the branchless analog of the reference's
    try/except identity fallback, ransac.py:184-192)."""
    ux, uy, uz = bx - ax, by - ay, bz - az
    vx, vy, vz = cx - ax, cy - ay, cz - az
    u2 = ux * ux + uy * uy + uz * uz
    v2 = vx * vx + vy * vy + vz * vz
    inv_u = _rsqrt_safe(u2)
    e1 = (ux * inv_u, uy * inv_u, uz * inv_u)
    wx, wy, wz = _cross(*e1, vx, vy, vz)
    w2 = wx * wx + wy * wy + wz * wz
    inv_w = _rsqrt_safe(w2)
    e3 = (wx * inv_w, wy * inv_w, wz * inv_w)
    e2 = _cross(*e3, *e1)
    # w = e1 x v, so |w|^2 = |v|^2 sin^2(angle): require sin > 1e-4 relative.
    ok = (u2 > 1e-20) & (w2 > 1e-8 * v2)
    return e1, e2, e3, ok


def fit3_frames(
    pa: jax.Array,
    pb: jax.Array,
    pc: jax.Array,
    qa: jax.Array,
    qb: jax.Array,
    qc: jax.Array,
) -> tuple[PlanarR, PlanarT, jax.Array]:
    """Rigid fit of K point triples, fully planar.

    Args:
      pa, pb, pc: [K, 3] sampled source points.
      qa, qb, qc: [K, 3] corresponding target points.

    Returns:
      (R, t, ok) planar: R[i][j] and t[i] are [K] arrays with q ~ R p + t;
      ok [K] bool is False for degenerate (collinear/duplicate) samples whose
      R is not a rotation.  Exact when the triangles are congruent; frames
      never produce a reflection (both frames are right-handed by
      construction).
    """
    P = (pa[:, 0], pa[:, 1], pa[:, 2], pb[:, 0], pb[:, 1], pb[:, 2],
         pc[:, 0], pc[:, 1], pc[:, 2])
    Q = (qa[:, 0], qa[:, 1], qa[:, 2], qb[:, 0], qb[:, 1], qb[:, 2],
         qc[:, 0], qc[:, 1], qc[:, 2])
    f1, f2, f3, ok_p = _frame(*P)
    g1, g2, g3, ok_q = _frame(*Q)
    # R = Fq Fp^T = g1 f1^T + g2 f2^T + g3 f3^T (outer products of columns).
    R = tuple(
        tuple(g1[i] * f1[j] + g2[i] * f2[j] + g3[i] * f3[j] for j in range(3))
        for i in range(3)
    )
    third = jnp.float32(1.0 / 3.0)
    cp = ((P[0] + P[3] + P[6]) * third, (P[1] + P[4] + P[7]) * third,
          (P[2] + P[5] + P[8]) * third)
    cq = ((Q[0] + Q[3] + Q[6]) * third, (Q[1] + Q[4] + Q[7]) * third,
          (Q[2] + Q[5] + Q[8]) * third)
    t = tuple(
        cq[i] - (R[i][0] * cp[0] + R[i][1] * cp[1] + R[i][2] * cp[2])
        for i in range(3)
    )
    return R, t, ok_p & ok_q


def apply_planar(R: PlanarR, t: PlanarT, x: jax.Array) -> tuple[jax.Array, ...]:
    """Apply K planar transforms to their own [K, 3] points -> 3x[K]."""
    px, py, pz = x[:, 0], x[:, 1], x[:, 2]
    return tuple(
        R[i][0] * px + R[i][1] * py + R[i][2] * pz + t[i] for i in range(3)
    )


def hypothesis_features_planar(R: PlanarR, t: PlanarT) -> tuple[jax.Array, jax.Array]:
    """[K, 16] hypothesis rows + [K] |t|^2 for the rank-15 bilinear score
    (ops/ransac_score.py), built from planar parts with ONE stack."""
    Rt_t = [R[0][j] * t[0] + R[1][j] * t[1] + R[2][j] * t[2] for j in range(3)]
    cols = (
        [2.0 * Rt_t[j] for j in range(3)]
        + [-2.0 * R[i][j] for i in range(3) for j in range(3)]
        + [-2.0 * t[i] for i in range(3)]
        + [jnp.zeros_like(t[0])]
    )
    H = jnp.stack(cols, axis=1)
    e = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
    return H, e


def winner_T(R: PlanarR, t: PlanarT, k: jax.Array) -> jax.Array:
    """Materialize hypothesis k as a [4, 4] transform (the only point where a
    stacked matrix exists)."""
    flat = []
    for i in range(3):
        flat += [R[i][0][k], R[i][1][k], R[i][2][k], t[i][k]]
    flat += [jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0)]
    return jnp.stack(flat).reshape(4, 4)


def rot_cos_planar(T_ref: jax.Array, R: PlanarR) -> jax.Array:
    """cos(angle(T_ref.R, R_k)) = (trace(T_ref.R^T R_k) - 1) / 2 for all K."""
    tr = sum(T_ref[i, j] * R[i][j] for i in range(3) for j in range(3))
    return (tr - 1.0) * 0.5


def prepare_correspondences(
    p_all: jax.Array, q_all: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Precompute per-call gather/score operands: pq [M, 6] (one gather per
    sample slot instead of two) and the score features (F [M, 16], c [M])."""
    pq = jnp.concatenate([p_all, q_all], axis=1)
    F, c = corres_features(p_all, q_all)
    return pq, F, c


def sample_fit_score(
    pq: jax.Array,
    F: jax.Array,
    c: jax.Array,
    valid: jax.Array,
    triples: jax.Array,
    thresh_sq: jax.Array,
    *,
    edge_length_ratio: float | jax.Array = 0.9,
    use_checkers: bool = True,
    approx_score: bool = False,
    return_features: bool = False,
) -> tuple:
    """Fit + checker + score one hypothesis chunk, planar end to end.

    Args:
      pq: [M, 6] concatenated correspondence points (prepare_correspondences).
      F, c: score features (prepare_correspondences).
      valid: [M] correspondence mask.
      triples: [K, 3] sample indices (registration.ransac._sample_distinct_triples).
      thresh_sq: squared inlier threshold.
      edge_length_ratio: Open3D edge-length checker ratio (ransac.py:53).
      use_checkers: apply edge-length + distance checkers (ransac.py:53-55).
      approx_score: run the [K, M] score matmul with bf16 inputs (fp32
        accumulate) — ~3x fewer MXU passes.  Only sound on CENTERED
        coordinates (caller's responsibility; see ransac_pair_step), and the
        elected winner must be exactly re-counted (refit_inliers) since a
        few borderline counts can flip.
      return_features: also return the fp32 hypothesis feature rows (H [K,16],
        e [K]) so a two-stage caller can exactly re-score a top-subset of
        hypotheses against the FULL correspondence set without re-deriving
        them from the planar parts.

    Returns:
      (R, t, counts): planar transforms and int32 inlier counts [K]; checker
      failures and non-finite fits score -1.  With ``return_features``,
      (R, t, counts, H, e).
    """
    ga = pq[triples[:, 0]]  # [K, 6]
    gb = pq[triples[:, 1]]
    gc = pq[triples[:, 2]]
    return fit_score_gathers(
        ga, gb, gc, F, c, valid, thresh_sq,
        edge_length_ratio=edge_length_ratio,
        use_checkers=use_checkers,
        approx_score=approx_score,
        return_features=return_features,
    )


def rolled_sample_gathers(
    key: jax.Array,
    pq: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    rank_to_idx: jax.Array | None = None,
    sample_rows: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Hypothesis sample gathers (ga, gb, gc [K, 6]) from ONE [M] row gather.

    TPU row gathers run at element rate, not HBM rate: the three per-triple
    ``pq[triples[:, i]]`` gathers measured 228 ms of a 629 ms fused distinct-
    pair batch (B=2048, K=4096, M=1024 on v5e) — the single largest cost in
    the whole register step.  This sampler instead gathers M iid-uniform
    valid rows ONCE and forms triples as static ROLLS of that sample:
    rep r pairs ``(S[j], S[j+s1_r], S[j+s2_r])`` — rolls are slice+concat,
    not gathers.

    Marginally each triple is 3 iid uniform draws from the valid
    correspondences, exactly like independent triple sampling; within-triple
    collisions (~3/n_valid) produce duplicate points and degenerate out via
    the frame check (counts -1), the same guard the reference relies on for
    its np.random.choice samples (src/matcher/ransac.py:143,184-192).  Each
    sampled row serves 3*K/M triples — at the default shapes (K=4096,
    M=1024, ~700 valid) the independent sampler already reused each valid
    correspondence ~17x on average, so coverage is equivalent.

    ``rank_to_idx``: optional valid-first permutation (ops/compact.py).  When
    given, ``pq`` is in ORIGINAL (uncompacted) order and sampled ranks are
    mapped through it — one extra [M] int gather instead of compacting the
    whole correspondence set (3 row gathers) up front.

    The sample row count defaults to a cap of ``max(256, k // 8)``: the two
    sampler gathers run at ELEMENT rate and were the largest RANSAC floor
    components in the round-4 profiler trace (21.4 + 14.8 ms of a 211 ms
    fused step at M=1024, B=2048 — docs/ROOFLINE.md op-level table), and
    they scale with the sampled-row count, not K.  Halving the rows
    doubles per-row triple reuse (24x at K=4096 — the independent sampler
    already reused rows ~17x), which leaves the marginal triple
    distribution unchanged; quality gates re-validated on chip.
    ``sample_rows`` overrides the cap (RansacConfig.sample_rows semantics:
    0 = default cap, -1 = uncapped, >0 = explicit row count) for
    robustness-critical callers that want maximal inter-triple diversity.
    """
    m = pq.shape[0]
    if sample_rows < 0:
        m_s = m
    elif sample_rows > 0:
        m_s = min(m, max(8, sample_rows))
    else:
        # k//16 (round 5, was k//8): halving the rows again recovered a
        # further ~8 ms at B=2048/K=4096 with every quality gate green
        # (48x triple reuse; docs/ROOFLINE.md round-5 table).  Low-support
        # regimes regain diversity through the adaptive budget extension,
        # which samples FRESH rows every extra chunk.
        m_s = min(m, max(256, k // 16))
    nv = jnp.maximum(n_valid, 3).astype(jnp.uint32)
    bits = jax.random.bits(key, (m_s,), jnp.uint32)
    ranks = (bits % nv).astype(jnp.int32)
    if rank_to_idx is not None:
        ranks = rank_to_idx[ranks]
    S = pq[ranks]  # the one row gather
    reps = -(-k // m_s)
    # Distinct static offset pairs per rep; co-prime-ish spreads so no two
    # reps generate the same (j, j+s1, j+s2) index pattern.
    offs = ((1, 2), (3, 7), (11, 23), (41, 87),
            (5, 13), (17, 37), (29, 61), (53, 109))
    if reps > len(offs):
        # Extend deterministically for very large K/M ratios.
        offs = tuple(
            offs[i % len(offs)] if i < len(offs)
            else (2 * i + 1, 4 * i + 3)
            for i in range(reps)
        )
    gbs, gcs = [], []
    for r in range(reps):
        s1, s2 = offs[r]
        gbs.append(jnp.roll(S, -s1, axis=0))
        gcs.append(jnp.roll(S, -s2, axis=0))
    if reps == 1:
        return S[:k], gbs[0][:k], gcs[0][:k]
    tile = (reps,) + (1,) * (S.ndim - 1)
    return (
        jnp.tile(S, tile)[:k],
        jnp.concatenate(gbs)[:k],
        jnp.concatenate(gcs)[:k],
    )


def fit_score_gathers(
    ga: jax.Array,
    gb: jax.Array,
    gc: jax.Array,
    F: jax.Array,
    c: jax.Array,
    valid: jax.Array,
    thresh_sq: jax.Array,
    *,
    edge_length_ratio: float | jax.Array = 0.9,
    use_checkers: bool = True,
    approx_score: bool = False,
    return_features: bool = False,
) -> tuple:
    """Fit + checker + score from pre-gathered sample rows (ga/gb/gc [K, 6]).

    The post-gather body of ``sample_fit_score``; also the entry point for
    gather-free samplers (``rolled_sample_gathers``)."""
    pa, qa = ga[:, :3], ga[:, 3:]
    pb, qb = gb[:, :3], gb[:, 3:]
    pc_, qc = gc[:, :3], gc[:, 3:]
    R, t, ok = fit3_frames(pa, pb, pc_, qa, qb, qc)

    H, e = hypothesis_features_planar(R, t)
    if approx_score:
        cross = jax.lax.dot_general(
            H.astype(jnp.bfloat16),
            F.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        cross = H @ F.T
    d2 = cross + c[None, :] + e[:, None]  # [K, M] — the MXU term
    hits = (d2 < thresh_sq) & valid[None, :]
    counts = jnp.sum(hits, axis=1, dtype=jnp.int32)

    # Degenerate/non-finite fits must never be elected: NaN d2 rows already
    # count 0, but 0 would beat an initial best of -1.
    ok &= jnp.isfinite(e)
    if use_checkers:

        def e2(a, b):
            d = a - b
            return d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1] + d[:, 2] * d[:, 2]

        r2 = edge_length_ratio * edge_length_ratio

        def edge_ok(x, y, u, v):
            es, et = e2(x, y), e2(u, v)
            return (et > r2 * es) & (es > r2 * et)

        ok &= edge_ok(pa, pb, qa, qb) & edge_ok(pb, pc_, qb, qc) & edge_ok(pc_, pa, qc, qa)

        def close(pp, qq):
            mx, my, mz = apply_planar(R, t, pp)
            dx, dy, dz = mx - qq[:, 0], my - qq[:, 1], mz - qq[:, 2]
            return dx * dx + dy * dy + dz * dz < thresh_sq

        ok &= close(pa, qa) & close(pb, qb) & close(pc_, qc)

    counts = jnp.where(ok, counts, -1)
    if return_features:
        return R, t, counts, H, e
    return R, t, counts


def rescore_rows(
    H: jax.Array,
    e: jax.Array,
    F: jax.Array,
    c: jax.Array,
    valid: jax.Array,
    thresh_sq: jax.Array,
) -> jax.Array:
    """Exact fp32 inlier counts of K' hypothesis feature rows over ALL M
    correspondences — the second stage of two-stage scoring (K' << K, so the
    [K', M] matmul is cheap in full precision)."""
    d2 = H @ F.T + c[None, :] + e[:, None]
    hits = (d2 < thresh_sq) & valid[None, :]
    return jnp.sum(hits, axis=1, dtype=jnp.int32)


def count_inliers(
    T: jax.Array,
    p_all: jax.Array,
    q_all: jax.Array,
    valid: jax.Array,
    thresh_sq: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """(inlier mask [M], count) of one transform over the correspondence set."""
    moved = p_all @ T[:3, :3].T + T[:3, 3]
    d2 = jnp.sum((moved - q_all) ** 2, axis=1)
    inl = (d2 < thresh_sq) & valid
    return inl, jnp.sum(inl, dtype=jnp.int32)


def refit_inliers(
    T: jax.Array,
    count: jax.Array,
    p_all: jax.Array,
    q_all: jax.Array,
    valid: jax.Array,
    thresh_sq: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Weighted Horn re-fit of the elected transform on ALL its inliers.

    One exact least-squares fit over the winner's inlier set (vs the raw
    3-point hypothesis), kept only if it does not lose inliers — branchless,
    monotone improvement.  Returns (T', count').
    """
    inl, _ = count_inliers(T, p_all, q_all, valid, thresh_sq)
    w = inl.astype(jnp.float32)
    # Need >= 3 inliers for a meaningful fit; fit_rigid_horn is total anyway.
    T_ref = fit_rigid_horn(p_all, q_all, w)
    _, count_ref = count_inliers(T_ref, p_all, q_all, valid, thresh_sq)
    better = count_ref >= jnp.maximum(count, 3)
    return (
        jnp.where(better, T_ref, T),
        jnp.where(better, count_ref, count),
    )
