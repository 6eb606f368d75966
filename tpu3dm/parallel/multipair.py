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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3dm.ops.compact import compaction_permutation
from tpu3dm.parallel.mesh import PAIR_AXIS
from tpu3dm.registration.hypotheses import (
    fit_score_gathers,
    prepare_correspondences,
    refit_inliers,
    rescore_rows,
    rolled_sample_gathers,
    rot_cos_planar,
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
    approx_score: bool = False,
    two_mode: bool = False,
    mode_angle_deg: float = 15.0,
    score_subset: int = 0,
    rescore_top: int = 128,
    sample_mode: str = "roll",
    sample_rows: int = 0,
    adapt_iterations: int = 0,
    confidence: float = 0.999,
    n_modes: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Single-pair fixed-budget RANSAC core (vmap-friendly).

    ``adapt_iterations`` > ``iterations`` enables the ADAPTIVE budget: after
    the fixed scan, the observed support w = best_count / n_valid is plugged
    into the reference's own confidence formula N = log(1-c) / log(1-w^3)
    (src/visualize_matcher/_visualize_matcher.py:356-370 — there used to stop
    EARLY at high support; here run in reverse to EXTEND at low support), and
    extra hypothesis chunks run under a ``lax.while_loop`` until the budget
    satisfies N or reaches ``adapt_iterations``.  At an inlier ratio of ~0.1
    (a half-cropped low-feature cloud) the formula demands ~6,900 samples —
    the fixed 4096 under-samples exactly the regime where partial-overlap
    registrations were measured failing (plate family at overlap 0.5-0.6:
    25-31% plain success, round 4).  High-support pairs (w >= ~0.12 at the
    default 32k cap) take zero extra chunks, so the headline regimes are
    unaffected.  Under vmap the loop runs until every lane's criterion is
    met (masked lanes keep computing but cannot regress: the election is
    monotone best-of).

    Planar hypothesis chunks (registration/hypotheses.py) under lax.scan;
    optional exact Horn re-fit of the winner on its inlier set.

    ``sample_mode``: "roll" (default) builds each chunk's K triples from ONE
    [M]-row gather + static rolls (hypotheses.rolled_sample_gathers) — TPU
    row gathers run at element rate, and the per-triple gathers of the
    "gather" mode measured 228 ms of a 629 ms fused distinct-pair batch.
    "gather" keeps the independent per-triple sampler
    (registration.ransac._sample_distinct_triples), the literal analog of
    the reference's np.random.choice (src/matcher/ransac.py:143).  Both
    samplers draw marginally-uniform valid triples; elected results differ
    only as different RANSAC seeds do.

    ``score_subset`` > 0 enables TWO-STAGE scoring: every hypothesis is first
    scored against only ~score_subset stride-sampled correspondences (the
    [K, M] score matmul is MXU-tile-rate bound, so entries are the cost), the
    ``rescore_top`` best survivors are re-scored EXACTLY over all M, and the
    election runs on the exact counts.  Work drops from K*M to
    K*S + top*M entries (~3x at K=4096, M=768, S=256).  Samples are still
    drawn from ALL valid correspondences; only scoring subsamples.  The
    stride pattern (not a prefix) keeps the subset spatially unbiased —
    compaction preserves source-point order, which is voxel-hash spatial
    order, so a prefix would concentrate on one side of the cloud and
    systematically misrank partial-overlap hypotheses.

    Both clouds are shifted to the valid-correspondence centroid before
    hypothesis work and the winner is un-shifted at return: the rank-15
    bilinear score sums terms of magnitude O(|coords|^2), so centering
    shrinks its cancellation error — and is a precondition for
    ``approx_score=True``, which runs the score matmul with bf16 inputs
    (fp32 accumulate; ~3x fewer MXU passes).  bf16 rounding can flip a few
    borderline inlier counts, but the elected winner is re-fit and
    re-counted EXACTLY by ``refit_inliers``, so final transforms/fitness
    stay exact-arithmetic quality.

    ``two_mode=True`` additionally tracks the best hypothesis whose rotation
    differs from the leader by more than ``mode_angle_deg`` (the planar
    analog of registration/ransac.py ``ransac_two_mode``), for downstream
    alias disambiguation on near-symmetric geometry.

    Returns (best_T [4,4], best_count scalar int32), or with ``two_mode``
    (Ts [2,4,4], counts [2]) ordered (primary, secondary).
    """
    thresh_sq = jnp.float32(dist_thresh) ** 2
    if sample_mode == "roll":
        # No data compaction: the roll sampler needs only the rank->original
        # -index map, which composes into its single sample gather
        # (rolled_sample_gathers).  Gathering p/q/valid through the
        # permutation cost 3 more row gathers per pair for nothing — scoring,
        # centering, and the refit are all mask-weighted and order-blind.
        rank_to_idx = compaction_permutation(valid)
    else:
        order = compaction_permutation(valid)
        p_all = p_all[order]
        q_all = q_all[order]
        valid = valid[order]
        rank_to_idx = None
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # Common shift: centroid of the valid correspondence points.
    w = valid.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    c0 = jnp.sum((p_all + q_all) * 0.5 * w, axis=0) / denom
    p_all = jnp.where(valid[:, None], p_all - c0, 0.0)
    q_all = jnp.where(valid[:, None], q_all - c0, 0.0)
    n_chunks = max(1, iterations // batch_size)
    pq, F, c = prepare_correspondences(p_all, q_all)

    m_total = p_all.shape[0]
    use_subset = (
        (not two_mode) and score_subset > 0 and score_subset < m_total
    )
    if use_subset:
        stride = max(1, m_total // score_subset)
        F_s = F[::stride][:score_subset]
        c_s = c[::stride][:score_subset]
        valid_s = valid[::stride][:score_subset]
        n_top = min(rescore_top, batch_size)

    def fit_chunk(k_chunk):
        Fx, cx, vx = (F_s, c_s, valid_s) if use_subset else (F, c, valid)
        if sample_mode == "roll":
            ga, gb, gc = rolled_sample_gathers(
                k_chunk, pq, n_valid, batch_size, rank_to_idx=rank_to_idx,
                sample_rows=sample_rows,
            )
            return fit_score_gathers(
                ga, gb, gc, Fx, cx, vx, thresh_sq,
                edge_length_ratio=edge_length_ratio,
                approx_score=approx_score,
                return_features=use_subset,
            )
        triples = _sample_distinct_triples(k_chunk, batch_size, jnp.maximum(n_valid, 3))
        return sample_fit_score(
            pq, Fx, cx, vx, triples, thresh_sq,
            edge_length_ratio=edge_length_ratio,
            approx_score=approx_score,
            return_features=use_subset,
        )

    keys = jax.random.split(key, n_chunks)

    def unshift(T):
        # T_world = Shift(c0) . T_centered . Shift(-c0).
        R_w = T[:3, :3]
        t_w = T[:3, 3] + c0 - R_w @ c0
        return T.at[:3, 3].set(t_w)

    def finalize(T, count):
        count = jnp.maximum(count, 0)
        if refit:
            T, count = refit_inliers(T, count, p_all, q_all, valid, thresh_sq)
        return unshift(T), count

    # Adaptive-budget machinery (see docstring).  ``count_of`` maps a scan
    # carry to the support count driving the confidence criterion (the
    # leader's count in both carry layouts).
    max_extra_chunks = max(0, -(-(adapt_iterations - iterations) // batch_size))
    log1mc = float(np.log(max(1.0 - confidence, 1e-12)))

    def extend(carry, chunk_fn, count_of):
        def need_more(st):
            carry, _, done = st
            w = jnp.clip(
                count_of(carry).astype(jnp.float32)
                / jnp.maximum(n_valid.astype(jnp.float32), 1.0),
                0.0, 1.0,
            )
            w3 = jnp.clip(w * w * w, 0.0, 0.999999)
            # N = log(1-c)/log(1-w^3); +inf at w=0 (run to the cap).
            needed = log1mc / jnp.minimum(jnp.log1p(-w3), -1e-12)
            done_h = jnp.float32(iterations) + done.astype(jnp.float32) * batch_size
            return (done_h < needed) & (done < max_extra_chunks)

        def more(st):
            carry, k, done = st
            k, sub = jax.random.split(k)
            carry, _ = chunk_fn(carry, sub)
            return carry, k, done + 1

        # Fresh key stream, disjoint from the scan's split(key, n_chunks).
        carry, _, _ = jax.lax.while_loop(
            need_more, more, (carry, jax.random.fold_in(key, 0x5F5E), jnp.int32(0))
        )
        return carry

    if not two_mode:

        def chunk(carry, k_chunk):
            best_T, best_count = carry
            if use_subset:
                R, t, counts, H, e = fit_chunk(k_chunk)
                # Stage 2: exact re-score of the subset-score top-n_top over
                # ALL correspondences; election runs on exact counts.  Checker
                # failures (-1) stay -1 so they can never be elected.
                top_c, top_i = jax.lax.top_k(counts, n_top)
                exact = rescore_rows(H[top_i], e[top_i], F, c, valid, thresh_sq)
                exact = jnp.where(top_c < 0, -1, exact)
                j = jnp.argmax(exact)
                k = top_i[j]
                cand_count = exact[j]
            else:
                R, t, counts = fit_chunk(k_chunk)
                k = jnp.argmax(counts)
                cand_count = counts[k]
            better = cand_count > best_count
            return (
                jnp.where(better, winner_T(R, t, k), best_T),
                jnp.where(better, cand_count, best_count),
            ), None

        carry, _ = jax.lax.scan(
            chunk, (jnp.eye(4, dtype=jnp.float32), jnp.int32(-1)), keys
        )
        if max_extra_chunks > 0:
            carry = extend(carry, chunk, lambda c: c[1])
        best_T, best_count = carry
        return finalize(best_T, best_count)

    # --- two-mode: track the leader AND the best rotation-far hypothesis ----
    cos_thr = jnp.cos(jnp.deg2rad(jnp.float32(mode_angle_deg)))

    def rot_close(Ta, Tb):
        cosang = (jnp.trace(Ta[:3, :3].T @ Tb[:3, :3]) - 1.0) * 0.5
        return cosang >= cos_thr

    if n_modes > 2:
        # --- N-mode: track n_modes rotation-separated support peaks --------
        # Quasi-periodic geometry (the arch's ~60-degree cusp wrap) under
        # scanner-degraded features produces MULTIPLE aliases whose
        # correspondence support EXCEEDS the true pose's (measured round 5,
        # scan family: truth w=0.12 vs alias 0.19 at full overlap) — with
        # only two tracked modes the truth is often not among the rescue's
        # candidates at all.  Each chunk contributes its n_modes best
        # rotation-separated peaks (iterative argmax + rotation-near
        # masking); the carry re-selects greedily from carry+new.
        def peaks_of(R, t, counts):
            Ts, cs, cw = [], [], counts
            for _ in range(n_modes):
                k = jnp.argmax(cw)
                Tk = winner_T(R, t, k)
                Ts.append(Tk)
                cs.append(cw[k])
                cw = jnp.where(rot_cos_planar(Tk, R) >= cos_thr, -1, cw)
            return jnp.stack(Ts), jnp.stack(cs)

        def reselect(allT, allc):
            outT, outc, aw = [], [], allc
            for _ in range(n_modes):
                k = jnp.argmax(aw)
                Tk = allT[k]
                outT.append(Tk)
                outc.append(aw[k])  # -1 for rotation-duplicates of a taken mode
                cosang = (
                    jnp.sum(Tk[:3, :3] * allT[:, :3, :3], axis=(1, 2)) - 1.0
                ) * 0.5
                aw = jnp.where(cosang >= cos_thr, -1, aw)
            return jnp.stack(outT), jnp.stack(outc)

        def chunk_n(carry, k_chunk):
            Ts, cs = carry
            R, t, counts = fit_chunk(k_chunk)
            newT, newc = peaks_of(R, t, counts)
            return reselect(
                jnp.concatenate([Ts, newT]), jnp.concatenate([cs, newc])
            ), None

        eye_n = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_modes, 4, 4))
        carry_n, _ = jax.lax.scan(
            chunk_n, (eye_n, jnp.full((n_modes,), -1, jnp.int32)), keys
        )
        if max_extra_chunks > 0:
            carry_n = extend(carry_n, chunk_n, lambda c: c[1][0])
        Ts_n, cs_n = carry_n
        outs = [finalize(Ts_n[i], cs_n[i]) for i in range(n_modes)]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    def merge(T1, c1, T2, c2, Tc, cc):
        """Fold candidate (Tc, cc) into the two mode slots (branchless).

        The leader slot update is branch-independent (a better candidate
        takes slot 1 whether or not it is rotation-near the current leader);
        near1 only gates the secondary slot: candidates near the leader
        compete with nothing else, far candidates either inherit a demoted
        leader or compete with slot 2.
        """
        near1 = rot_close(T1, Tc)
        T1n = jnp.where(cc > c1, Tc, T1)
        c1n = jnp.maximum(cc, c1)
        far_T2 = jnp.where(cc > c1, T1, jnp.where(cc > c2, Tc, T2))
        far_c2 = jnp.where(cc > c1, c1, jnp.maximum(cc, c2))
        T2n = jnp.where(near1, T2, far_T2)
        c2n = jnp.where(near1, c2, far_c2)
        return T1n, c1n, T2n, c2n

    def chunk2(carry, k_chunk):
        T1, c1, T2, c2 = carry
        R, t, counts = fit_chunk(k_chunk)
        ka = jnp.argmax(counts)
        Ta, ca = winner_T(R, t, ka), counts[ka]
        cosang = rot_cos_planar(Ta, R)
        counts_far = jnp.where(cosang < cos_thr, counts, -1)
        kb = jnp.argmax(counts_far)
        Tb, cb = winner_T(R, t, kb), counts_far[kb]
        T1, c1, T2, c2 = merge(T1, c1, T2, c2, Ta, ca)
        T1, c1, T2, c2 = merge(T1, c1, T2, c2, Tb, cb)
        return (T1, c1, T2, c2), None

    eye = jnp.eye(4, dtype=jnp.float32)
    carry2, _ = jax.lax.scan(
        chunk2, (eye, jnp.int32(-1), eye, jnp.int32(-1)), keys
    )
    if max_extra_chunks > 0:
        carry2 = extend(carry2, chunk2, lambda c: c[1])
    T1, c1, T2, c2 = carry2
    T1, c1 = finalize(T1, c1)
    T2, c2 = finalize(T2, c2)
    return jnp.stack([T1, T2]), jnp.stack([c1, c2])


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
