"""Step-traced RANSAC — the headless re-expression of the interactive GUI.

The reference's ``VisualizeMatcher`` (src/visualize_matcher/_visualize_matcher
.py:176-616) runs the hand-rolled RANSAC loop in a worker thread, posting the
current/best fitness to the UI every ``update_interval`` iterations and early-
stopping with the confidence formula.  Here the same loop runs as chunked
device dispatches (one chunk = ``update_interval`` hypotheses), and each chunk
appends a trace row {iteration, current_fitness, best_fitness, early_stop} —
everything the GUI displayed (CurFit/BestFit labels, :489-490), minus the
window.  The noise_ratio knob injects bogus correspondences exactly like the
GUI's default settings (noise_ratio=2.0, :161).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from tpu3dm.core.cloud import PointCloud
from tpu3dm.core.config import RansacConfig
from tpu3dm.ops.compact import compaction_permutation
from tpu3dm.ops.ransac_score import score_hypotheses
from tpu3dm.registration.correspondence import feature_correspondences, gather_pairs
from tpu3dm.registration.kabsch import fit_rigid_horn
from tpu3dm.registration.ransac import _sample_distinct_triples
from tpu3dm.registration.result import RegistrationResult
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)


def _score(R, t, p, q, m, th):
    return score_hypotheses(R, t, p, q, m, th)


def compute_required_iterations(
    inlier_ratio: float, confidence: float = 0.99, sample_size: int = 3
) -> int:
    """N = log(1-c) / log(1-w^k) (reference: _visualize_matcher.py:356-370)."""
    if inlier_ratio < 0.01:
        return 1 << 30
    w_k = min(inlier_ratio**sample_size, 1 - 1e-12)
    return int(math.log(1 - confidence) / math.log(1 - w_k))


def traced_ransac(
    src: PointCloud,
    tgt: PointCloud,
    config: RansacConfig,
    *,
    key: jax.Array,
    noise_ratio: float = 0.0,
    chunk: int = 256,
    early_stop_threshold: float = 0.5,  # MatcherSettings default (:165)
    early_stop_confidence: float = 0.99,  # MatcherSettings default (:166)
    max_iterations: int | None = None,
) -> tuple[RegistrationResult, list[dict]]:
    """Chunked RANSAC with a host-visible per-chunk trace.

    Returns (result, trace rows).  Slower than the fused path by design — the
    host reads back fitness every chunk, like the GUI did every
    update_interval iterations.
    """
    max_iterations = max_iterations or config.max_iterations
    k_corr, key = jax.random.split(key)
    pairs, valid = feature_correspondences(
        src, tgt, mutual_filter=False, noise_ratio=noise_ratio, key=k_corr
    )
    p_all, q_all = gather_pairs(src, tgt, pairs)
    order = compaction_permutation(valid)
    p_all, q_all, valid = p_all[order], q_all[order], valid[order]
    n_valid = int(jnp.sum(valid.astype(jnp.int32)))
    thresh_sq = jnp.float32(config.dist_thresh) ** 2
    logger.info(
        "Start RANSAC: %d correspondences (noise ratio: %.1f)", n_valid, noise_ratio
    )

    @jax.jit
    def run_chunk(k):
        triples = _sample_distinct_triples(k, chunk, jnp.int32(max(n_valid, 3)))
        T = fit_rigid_horn(p_all[triples], q_all[triples])
        counts = _score(T[:, :3, :3], T[:, :3, 3], p_all, q_all, valid, thresh_sq)
        best = jnp.argmax(counts)
        return T[best], counts[best], counts[-1]

    trace: list[dict] = []
    best_T = jnp.eye(4)
    best_count = -1
    it = 0
    early = False
    while it < max_iterations:
        key, k = jax.random.split(key)
        T, cnt, last_cnt = run_chunk(k)
        it += chunk
        cnt = int(cnt)
        if cnt > best_count:
            best_count = cnt
            best_T = T
        best_fit = best_count / max(n_valid, 1)
        cur_fit = int(last_cnt) / max(n_valid, 1)
        row = {
            "iteration": it,
            "current_fitness": round(cur_fit, 4),
            "best_fitness": round(best_fit, 4),
            "early_stop": False,
            # Per-chunk best pose: lets viz/export.py replay the search the
            # way the reference GUI animated it (_visualize_matcher.py:
            # 452-466 updates the displayed cloud every update_interval).
            "best_T": np.asarray(best_T, np.float64).round(6).tolist(),
        }
        if best_fit > early_stop_threshold:
            required = compute_required_iterations(best_fit, early_stop_confidence)
            if it >= required:
                row["early_stop"] = True
                trace.append(row)
                logger.info(
                    "Early stop at iteration %d/%d (fitness: %.4f, required: %d)",
                    it, max_iterations, best_fit, required,
                )
                early = True
                break
        trace.append(row)
    if not early:
        logger.info("RANSAC finished: %d iterations, best fitness %.4f",
                    it, best_count / max(n_valid, 1))

    moved = p_all @ best_T[:3, :3].T + best_T[:3, 3]
    d2 = jnp.sum((moved - q_all) ** 2, axis=1)
    inl = (d2 < thresh_sq) & valid
    rmse = float(jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(jnp.sum(inl), 1)))
    result = RegistrationResult(
        transformation=best_T,
        fitness=jnp.float32(best_count / max(n_valid, 1)),
        inlier_rmse=jnp.float32(rmse),
        iterations=jnp.int32(it),
    )
    return result, trace
