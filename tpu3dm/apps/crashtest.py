"""Numerical-robustness suite (reference: test_ransac_crash.py:1-367).

Same categories as the reference's script — degenerate geometry, adversarial
noise, statistical stability, huge transforms — but with real pass/fail
verdicts instead of log-only checkmarks (the reference logs ✓/✗ and can never
fail, SURVEY.md §4).  Also available to pytest via tests/test_crash.py.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dm.io import synthetic
from tpu3dm.registration.kabsch import fit_rigid_horn
from tpu3dm.registration.ransac import ransac_from_correspondences
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)


@dataclasses.dataclass
class CrashResult:
    name: str
    passed: bool
    detail: str = ""


def _finite_fit(p: np.ndarray, q: np.ndarray) -> tuple[bool, np.ndarray]:
    T = np.asarray(fit_rigid_horn(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32)))
    R = T[:3, :3]
    ortho = np.abs(R @ R.T - np.eye(3)).max() < 1e-2
    return bool(np.isfinite(T).all() and ortho), T


def test_minimal_correspondences() -> CrashResult:
    """3-point minimum (reference :82-111)."""
    p = synthetic.minimal_cloud(3, seed=0)
    ok, _ = _finite_fit(p, p + 1.0)
    return CrashResult("minimal_3_correspondences", ok)


def test_collinear() -> CrashResult:
    """Collinear sample (reference :114-139)."""
    p = synthetic.collinear_cloud(3)
    ok, _ = _finite_fit(p, p + np.array([1.0, -2.0, 0.5]))
    return CrashResult("collinear_points", ok)


def test_coplanar() -> CrashResult:
    """Coplanar sample (reference :142-167)."""
    p = synthetic.coplanar_cloud(3, seed=1)
    ok, _ = _finite_fit(p, p * np.array([1.0, 1.0, 1.0]) + 0.3)
    return CrashResult("coplanar_points", ok)


def test_duplicates() -> CrashResult:
    """All-duplicate points (reference :170-195)."""
    p = synthetic.duplicate_cloud(3)
    ok, _ = _finite_fit(p, p)
    return CrashResult("duplicate_points", ok)


def test_zero_correspondences() -> CrashResult:
    """Empty correspondence set (reference :198-224): identity, fitness 0."""
    p = np.zeros((64, 3), np.float32)
    res = ransac_from_correspondences(
        jnp.asarray(p),
        jnp.asarray(p),
        jnp.zeros(64, bool),
        jax.random.PRNGKey(0),
        dist_thresh=0.1,
        max_iterations=512,
        batch_size=128,
    )
    T = np.asarray(res.transformation)
    ok = bool(np.isfinite(T).all())
    return CrashResult("zero_correspondences", ok, f"fitness={float(res.fitness):.3f}")


def test_noise_ratio_sweep() -> CrashResult:
    """Outlier-ratio sweep (reference :227-236, ratios up to 100x)."""
    rng = np.random.default_rng(0)
    n = 300
    p = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    q_true = p + np.array([0.5, -0.3, 0.2], np.float32)
    fails = []
    for ratio in (0.0, 1.0, 2.0, 10.0, 100.0):
        n_noise = int(n * ratio / (1 + ratio))
        q = q_true.copy()
        q[:n_noise] = rng.uniform(-2, 2, (n_noise, 3))
        res = ransac_from_correspondences(
            jnp.asarray(p),
            jnp.asarray(q),
            jnp.ones(n, bool),
            jax.random.PRNGKey(1),
            dist_thresh=0.1,
            max_iterations=8192,
            batch_size=2048,
        )
        if not np.isfinite(np.asarray(res.transformation)).all():
            fails.append(ratio)
    return CrashResult("noise_ratio_sweep", not fails, f"failed ratios: {fails}")


def test_numerical_stability(trials: int = 1000) -> CrashResult:
    """1000 random 3-point fits: NaN/Inf screening with >= 95% pass grading
    (reference :239-274)."""
    rng = np.random.default_rng(2)
    p = rng.normal(size=(trials, 3, 3)).astype(np.float32)
    q = rng.normal(size=(trials, 3, 3)).astype(np.float32)
    T = np.asarray(fit_rigid_horn(jnp.asarray(p), jnp.asarray(q)))
    finite = np.isfinite(T).all(axis=(1, 2))
    R = T[:, :3, :3]
    ortho = np.abs(R @ np.swapaxes(R, 1, 2) - np.eye(3)).max(axis=(1, 2)) < 1e-2
    rate = float((finite & ortho).mean())
    return CrashResult(
        "numerical_stability_1000",
        rate >= 0.95,
        f"pass rate {rate:.3f} (>=0.95 good, >=0.80 moderate)",
    )


def test_degenerate_huge_transform() -> CrashResult:
    """Scale-1000 + translate-1000 inputs (reference :277-294)."""
    rng = np.random.default_rng(3)
    p = (rng.normal(size=(50, 3)) * 1000).astype(np.float32)
    q = p + 1000.0
    res = ransac_from_correspondences(
        jnp.asarray(p),
        jnp.asarray(q),
        jnp.ones(50, bool),
        jax.random.PRNGKey(2),
        dist_thresh=1.0,
        max_iterations=1024,
        batch_size=256,
    )
    T = np.asarray(res.transformation)
    ok = bool(np.isfinite(T).all()) and float(res.fitness) > 0.9
    return CrashResult("degenerate_huge_transform", ok, f"fitness={float(res.fitness):.3f}")


ALL_TESTS = [
    test_minimal_correspondences,
    test_collinear,
    test_coplanar,
    test_duplicates,
    test_zero_correspondences,
    test_noise_ratio_sweep,
    test_numerical_stability,
    test_degenerate_huge_transform,
]


def run_all_crash_tests() -> list[CrashResult]:
    """Run every robustness test (reference: run_all_crash_tests :297-331)."""
    results = []
    for fn in ALL_TESTS:
        try:
            r = fn()
        except Exception as e:  # a crash IS a failure — that's the point
            r = CrashResult(fn.__name__, False, f"raised {type(e).__name__}: {e}")
        mark = "PASS" if r.passed else "FAIL"
        logger.info("[%s] %s %s", mark, r.name, r.detail)
        results.append(r)
    n_pass = sum(r.passed for r in results)
    logger.info("crash tests: %d/%d passed", n_pass, len(results))
    return results


def main(argv=None) -> int:
    results = run_all_crash_tests()
    return 0 if all(r.passed for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
