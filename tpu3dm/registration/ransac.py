"""Batched RANSAC global registration — thousands of hypotheses per dispatch.

TPU-native re-expression of both reference RANSAC paths:
  - the Open3D built-in pipeline (src/matcher/ransac.py:20-58: 3-point samples,
    point-to-point fit, edge-length 0.9 + distance checkers, convergence
    (max_iteration, confidence 0.999));
  - the hand-rolled NumPy loop (ransac.py:104-277 + the GUI worker loop
    _visualize_matcher.py:394-466 with its theoretical early stop
    N = log(1-c) / log(1-w^3), :356-370).

Where the reference fits and scores ONE hypothesis per Python iteration
(0.76 ms each, benchmark_results.txt:8), here a `lax.while_loop` steps over
*chunks* of `batch_size` hypotheses; each chunk is sampled, fitted, checker-
masked, and scored planar (structure-of-arrays triangle-frame fit + rank-15
bilinear MXU score, registration/hypotheses.py) in one device dispatch, with
an on-device argmax electing the chunk best and an exact weighted-Horn re-fit
of the winner on its inlier set.  Early stop happens between chunks with zero
host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dm.core.cloud import PointCloud
from tpu3dm.core.config import RansacConfig
from tpu3dm.registration.hypotheses import (
    prepare_correspondences,
    refit_inliers,
    rot_cos_planar,
    sample_fit_score,
    winner_T,
)
from tpu3dm.registration.result import RegistrationResult


def _sample_distinct_triples(key: jax.Array, k: int, n: jax.Array) -> jax.Array:
    """[k, 3] distinct indices uniform over [0, n) (n traced, n >= 3).

    Constant-time distinct sampling (no rejection): ONE uniform draw over
    [0, n*(n-1)*(n-2)) decomposed arithmetically into shrinking-range draws,
    then shifted past already-chosen values — the batched analog of
    ``np.random.choice(n, 3, replace=False)`` (reference: ransac.py:143).

    One bits call, not three randints: threefry key-splitting + randint
    dominated the whole RANSAC step on TPU (measured 1.96 ms/pair for
    sampling alone vs 1.13 ms/pair for the complete sample+fit+check+score
    program).  Pure 32-bit arithmetic (x64 stays disabled): draw 1 is reduced
    mod n (bias ~n/2^32), draw 2 is decomposed over (n-1)(n-2) (bias
    ~n^2/2^32) — negligible for the O(1k)-correspondence sets produced by
    voxel downsampling.
    """
    n = jnp.maximum(n, 3).astype(jnp.uint32)
    bits = jax.random.bits(key, (k, 2), jnp.uint32)
    a = (bits[:, 0] % n).astype(jnp.int32)
    r = bits[:, 1] % ((n - 1) * (n - 2))
    b = (r % (n - 1)).astype(jnp.int32)
    c = (r // (n - 1)).astype(jnp.int32)
    b = b + (b >= a)
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    c = c + (c >= lo)
    c = c + (c >= hi)
    return jnp.stack([a, b, c], axis=1)


def _edge_length_ok(ps: jax.Array, qs: jax.Array, ratio: float) -> jax.Array:
    """Open3D CorrespondenceCheckerBasedOnEdgeLength (ransac.py:53): every
    triangle edge must satisfy |e_t| > ratio*|e_s| and |e_s| > ratio*|e_t|."""

    def edges(x):  # [K, 3, 3] -> [K, 3]
        e01 = jnp.linalg.norm(x[:, 0] - x[:, 1], axis=-1)
        e12 = jnp.linalg.norm(x[:, 1] - x[:, 2], axis=-1)
        e20 = jnp.linalg.norm(x[:, 2] - x[:, 0], axis=-1)
        return jnp.stack([e01, e12, e20], axis=1)

    es, et = edges(ps), edges(qs)
    ok = (et > ratio * es) & (es > ratio * et)
    return jnp.all(ok, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "batch_size", "use_checkers", "refit", "early_stop"
    ),
)
def ransac_from_correspondences(
    p_all: jax.Array,
    q_all: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    dist_thresh: float | jax.Array,
    max_iterations: int = 100_000,
    batch_size: int = 4096,
    confidence: float | jax.Array = 0.999,
    edge_length_ratio: float | jax.Array = 0.9,
    use_checkers: bool = True,
    refit: bool = True,
    early_stop: bool = True,
    early_stop_min_fitness: float | jax.Array = 0.0,
) -> RegistrationResult:
    """Run batched RANSAC over a fixed correspondence set.

    Args:
      p_all, q_all: [M, 3] gathered correspondence points (source, target).
      valid: [M] correspondence validity mask.
      key: PRNG key.
      dist_thresh: inlier distance threshold (reference: 1.5 * voxel).
      early_stop: apply the theoretical confidence stop between hypothesis
        chunks (reference GUI semantics, _visualize_matcher.py:163-167);
        False runs the full max_iterations budget unconditionally.
      early_stop_min_fitness: fitness floor before the confidence stop may
        trigger (reference ``early_stop_threshold``).

    Returns:
      RegistrationResult with fitness = inliers / valid-correspondences
      (hand-rolled reference semantics, ransac.py:236) and iterations =
      hypotheses actually evaluated (early stop included).
    """
    m = p_all.shape[0]
    thresh = jnp.asarray(dist_thresh, jnp.float32)
    thresh_sq = thresh * thresh
    conf = jnp.asarray(confidence, jnp.float32)
    min_fit = jnp.asarray(early_stop_min_fitness, jnp.float32)

    # Compact valid correspondences to the front so index sampling is uniform
    # over real pairs (sort-free: ops/compact.py).
    from tpu3dm.ops.compact import compaction_permutation

    order = compaction_permutation(valid)
    p_all = p_all[order]
    q_all = q_all[order]
    valid = valid[order]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    pq, F, c = prepare_correspondences(p_all, q_all)

    n_chunks = max(1, -(-max_iterations // batch_size))

    def required_iters(best_count):
        """Theoretical iterations for confidence (reference:
        _visualize_matcher.py:356-370): N = log(1-c)/log(1-w^3)."""
        w = best_count.astype(jnp.float32) / jnp.maximum(n_valid, 1).astype(jnp.float32)
        w3 = jnp.clip(w**3, 1e-12, 1.0 - 1e-7)
        req = jnp.log1p(-conf) / jnp.log1p(-w3)
        return jnp.where(
            (w < 0.01) | (w < min_fit),
            jnp.float32(max_iterations),
            jnp.minimum(req, max_iterations),
        )

    def cond(state):
        chunk_i, _, best_count, _ = state
        done_budget = chunk_i >= n_chunks
        if not early_stop:
            return ~done_budget
        done_conf = (chunk_i * batch_size) >= required_iters(best_count)
        return ~(done_budget | done_conf)

    def body(state):
        chunk_i, best_T, best_count, key = state
        key, k_samp = jax.random.split(key)
        triples = _sample_distinct_triples(k_samp, batch_size, n_valid)
        R, t, counts = sample_fit_score(
            pq, F, c, valid, triples, thresh_sq,
            edge_length_ratio=edge_length_ratio,
            use_checkers=use_checkers,
        )
        best_k = jnp.argmax(counts)
        chunk_best = counts[best_k]
        improved = chunk_best > best_count
        best_T = jnp.where(improved, winner_T(R, t, best_k), best_T)
        best_count = jnp.where(improved, chunk_best, best_count)
        return chunk_i + 1, best_T, best_count, key

    init = (jnp.int32(0), jnp.eye(4, dtype=jnp.float32), jnp.int32(-1), key)
    chunk_i, best_T, best_count, _ = jax.lax.while_loop(cond, body, init)

    best_count = jnp.maximum(best_count, 0)
    if refit:
        best_T, best_count = refit_inliers(
            best_T, best_count, p_all, q_all, valid, thresh_sq
        )
    fitness = best_count.astype(jnp.float32) / jnp.maximum(n_valid, 1).astype(
        jnp.float32
    )
    # Inlier RMSE of the elected transform over the correspondence set.
    moved = p_all @ best_T[:3, :3].T + best_T[:3, 3]
    d2 = jnp.sum((moved - q_all) ** 2, axis=1)
    inl = (d2 < thresh_sq) & valid
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(jnp.sum(inl), 1)
    )
    return RegistrationResult(
        transformation=best_T,
        fitness=fitness,
        inlier_rmse=rmse,
        iterations=chunk_i * batch_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "batch_size", "use_checkers"),
)
def ransac_two_mode(
    p_all: jax.Array,
    q_all: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    dist_thresh: float | jax.Array,
    max_iterations: int = 100_000,
    batch_size: int = 4096,
    confidence: float | jax.Array = 0.999,
    edge_length_ratio: float | jax.Array = 0.9,
    use_checkers: bool = True,
    mode_angle_deg: float | jax.Array = 15.0,
) -> tuple[RegistrationResult, RegistrationResult]:
    """Batched RANSAC tracking the best TWO rotationally-distinct modes.

    Near-symmetric geometry produces alias poses whose inlier count ties or
    beats the true pose (measured on the synthetic dental arch: alias 0.353
    fitness vs true 0.353 — argmax election is a coin flip the alias usually
    wins).  This variant keeps, alongside the global argmax, the best
    hypothesis whose rotation differs by more than ``mode_angle_deg`` — the
    caller disambiguates the two modes downstream (e.g. short ICP
    verification, registration/large.py).  No reference counterpart; the
    reference's single-mode election fails identically on such inputs.

    Returns (primary, secondary) RegistrationResults.
    """
    m = p_all.shape[0]
    thresh = jnp.asarray(dist_thresh, jnp.float32)
    thresh_sq = thresh * thresh
    conf = jnp.asarray(confidence, jnp.float32)
    cos_thr = jnp.cos(jnp.deg2rad(jnp.asarray(mode_angle_deg, jnp.float32)))

    from tpu3dm.ops.compact import compaction_permutation

    order = compaction_permutation(valid)
    p_all, q_all, valid = p_all[order], q_all[order], valid[order]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    pq, F, c = prepare_correspondences(p_all, q_all)
    n_chunks = max(1, -(-max_iterations // batch_size))

    def required_iters(best_count):
        w = best_count.astype(jnp.float32) / jnp.maximum(n_valid, 1).astype(jnp.float32)
        w3 = jnp.clip(w**3, 1e-12, 1.0 - 1e-7)
        req = jnp.log1p(-conf) / jnp.log1p(-w3)
        return jnp.where(
            w < 0.01, jnp.float32(max_iterations), jnp.minimum(req, max_iterations)
        )

    def rot_close(Ta, Tb):
        """cos(angle between rotations) >= cos_thr."""
        cosang = (jnp.trace(Ta[:3, :3].T @ Tb[:3, :3]) - 1.0) * 0.5
        return cosang >= cos_thr

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

    def cond(state):
        chunk_i, _, c1, _, _, _ = state
        return ~((chunk_i >= n_chunks) | ((chunk_i * batch_size) >= required_iters(c1)))

    def body(state):
        chunk_i, T1, c1, T2, c2, key = state
        key, k_samp = jax.random.split(key)
        triples = _sample_distinct_triples(k_samp, batch_size, n_valid)
        R, t, counts = sample_fit_score(
            pq, F, c, valid, triples, thresh_sq,
            edge_length_ratio=edge_length_ratio,
            use_checkers=use_checkers,
        )
        ka = jnp.argmax(counts)
        Ta, ca = winner_T(R, t, ka), counts[ka]
        # second in-batch mode: best among hypotheses rotation-far from Ta
        cosang = rot_cos_planar(Ta, R)
        counts_far = jnp.where(cosang < cos_thr, counts, -1)
        kb = jnp.argmax(counts_far)
        Tb, cb = winner_T(R, t, kb), counts_far[kb]

        T1, c1, T2, c2 = merge(T1, c1, T2, c2, Ta, ca)
        T1, c1, T2, c2 = merge(T1, c1, T2, c2, Tb, cb)
        return chunk_i + 1, T1, c1, T2, c2, key

    eye = jnp.eye(4, dtype=jnp.float32)
    init = (jnp.int32(0), eye, jnp.int32(-1), eye, jnp.int32(-1), key)
    chunk_i, T1, c1, T2, c2, _ = jax.lax.while_loop(cond, body, init)

    def result(T, c):
        c = jnp.maximum(c, 0)
        fitness = c.astype(jnp.float32) / jnp.maximum(n_valid, 1).astype(jnp.float32)
        moved = p_all @ T[:3, :3].T + T[:3, 3]
        d2 = jnp.sum((moved - q_all) ** 2, axis=1)
        inl = (d2 < thresh_sq) & valid
        rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(jnp.sum(inl), 1))
        return RegistrationResult(
            transformation=T,
            fitness=fitness,
            inlier_rmse=rmse,
            iterations=chunk_i * batch_size,
        )

    return result(T1, c1), result(T2, c2)


def global_registration(
    src: PointCloud,
    tgt: PointCloud,
    config: RansacConfig,
    key: jax.Array,
    *,
    pairs: jax.Array | None = None,
    pairs_valid: jax.Array | None = None,
) -> RegistrationResult:
    """Feature-matched RANSAC registration (reference: global_registration,
    ransac.py:20-58).  Computes FPFH correspondences (mutual filter per
    config), then runs batched RANSAC."""
    from tpu3dm.registration.correspondence import (
        feature_correspondences,
        gather_pairs,
    )

    if config.sample_size != 3:
        # The planar triangle-frame fit (hypotheses.py) and the confidence
        # formula specialize the reference's minimal 3-point sample
        # (ransac.py:50); other sizes are not implemented.
        raise NotImplementedError(
            f"sample_size={config.sample_size}: only 3-point minimal samples "
            "are supported (reference ransac.py:50)"
        )
    if pairs is None:
        k_corr, key = jax.random.split(key)
        pairs, pairs_valid = feature_correspondences(
            src,
            tgt,
            mutual_filter=config.mutual_filter,
            noise_ratio=config.noise_ratio,
            key=k_corr,
        )
    p_all, q_all = gather_pairs(src, tgt, pairs)
    return ransac_from_correspondences(
        p_all,
        q_all,
        pairs_valid,
        key,
        dist_thresh=config.dist_thresh,
        max_iterations=config.max_iterations,
        batch_size=config.batch_size,
        confidence=config.confidence,
        edge_length_ratio=config.edge_length_ratio,
        use_checkers=config.use_checkers,
        early_stop=config.early_stop_enabled,
        early_stop_min_fitness=config.early_stop_min_fitness,
    )


def global_registration_two_mode(
    src: PointCloud,
    tgt: PointCloud,
    config: RansacConfig,
    key: jax.Array,
) -> tuple[RegistrationResult, RegistrationResult]:
    """Two-mode variant of global_registration (see ransac_two_mode)."""
    from tpu3dm.registration.correspondence import (
        feature_correspondences,
        gather_pairs,
    )

    k_corr, key = jax.random.split(key)
    pairs, pairs_valid = feature_correspondences(
        src,
        tgt,
        mutual_filter=config.mutual_filter,
        noise_ratio=config.noise_ratio,
        key=k_corr,
    )
    p_all, q_all = gather_pairs(src, tgt, pairs)
    return ransac_two_mode(
        p_all,
        q_all,
        pairs_valid,
        key,
        dist_thresh=config.dist_thresh,
        max_iterations=config.max_iterations,
        batch_size=config.batch_size,
        confidence=config.confidence,
        edge_length_ratio=config.edge_length_ratio,
        use_checkers=config.use_checkers,
    )
