"""Rigid fit, RANSAC, ICP, and the end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.core import se3
from tpu3dm.core.cloud import from_numpy
from tpu3dm.core.config import IcpConfig, PipelineConfig, RansacConfig
from tpu3dm.io.synthetic import dental_arch_cloud, make_benchmark_pair
from tpu3dm.registration.icp import icp_refine
from tpu3dm.registration.kabsch import fit_rigid_horn, fit_rigid_svd
from tpu3dm.registration.ransac import (
    _sample_distinct_triples,
    ransac_from_correspondences,
)


def random_rigid(seed, angle=0.5, trans=1.0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * angle
    T = np.asarray(se3.exp_se3(jnp.asarray(np.r_[rng.normal(size=3) * trans, w], dtype=jnp.float32)))
    return T


class TestRigidFit:
    def test_horn_exact_recovery(self):
        rng = np.random.default_rng(0)
        T = random_rigid(1)
        p = rng.normal(size=(3, 3)).astype(np.float32)
        q = p @ T[:3, :3].T + T[:3, 3]
        That = np.asarray(fit_rigid_horn(jnp.asarray(p), jnp.asarray(q)))
        np.testing.assert_allclose(That, T, atol=1e-4)

    def test_horn_matches_svd_batch(self):
        rng = np.random.default_rng(2)
        p = rng.normal(size=(64, 3, 3)).astype(np.float32)
        T = np.stack([random_rigid(i) for i in range(64)])
        q = np.einsum("kij,kmj->kmi", T[:, :3, :3], p) + T[:, None, :3, 3]
        q = q + 0.01 * rng.normal(size=q.shape).astype(np.float32)  # noise
        Th = np.asarray(fit_rigid_horn(jnp.asarray(p), jnp.asarray(q)))
        Ts = np.asarray(fit_rigid_svd(jnp.asarray(p), jnp.asarray(q)))
        # f32 analytic eigen vs f32 SVD: small-eigengap cases may differ by a
        # hair; both must be near-optimal, so compare residuals too.
        np.testing.assert_allclose(Th, Ts, atol=5e-3)
        res_h = np.abs(np.einsum("kij,kmj->kmi", Th[:, :3, :3], p) + Th[:, None, :3, 3] - q).max()
        res_s = np.abs(np.einsum("kij,kmj->kmi", Ts[:, :3, :3], p) + Ts[:, None, :3, 3] - q).max()
        assert res_h < res_s + 1e-3

    def test_horn_proper_rotation_always(self):
        """Reflection-prone (near-planar) samples still give det=+1."""
        rng = np.random.default_rng(3)
        p = rng.normal(size=(128, 3, 3)).astype(np.float32)
        p[..., 2] *= 0.001  # nearly coplanar
        q = -p  # reflection-like correspondence
        T = np.asarray(fit_rigid_horn(jnp.asarray(p), jnp.asarray(q)))
        dets = np.linalg.det(T[:, :3, :3])
        np.testing.assert_allclose(dets, 1.0, atol=1e-3)

    @pytest.mark.parametrize(
        "kind", ["collinear", "duplicate", "coplanar"]
    )
    def test_degenerate_no_nan(self, kind):
        """Degenerate 3-point samples (reference crash suite,
        test_ransac_crash.py:27-79) produce finite rigid transforms."""
        if kind == "collinear":
            p = np.array([[0, 0, 0], [1, 2, 3], [2, 4, 6]], dtype=np.float32)
        elif kind == "duplicate":
            p = np.tile(np.array([[1.0, 1, 1]], dtype=np.float32), (3, 1))
        else:
            p = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
        q = p + 1.0
        T = np.asarray(fit_rigid_horn(jnp.asarray(p), jnp.asarray(q)))
        assert np.isfinite(T).all()
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)

    def test_huge_transform(self):
        """Scale-1000 offsets (reference degenerate test,
        test_ransac_crash.py:277-294) stay finite."""
        rng = np.random.default_rng(4)
        p = (rng.normal(size=(3, 3)) * 1000).astype(np.float32)
        q = p + 1000.0
        T = np.asarray(fit_rigid_horn(jnp.asarray(p), jnp.asarray(q)))
        assert np.isfinite(T).all()
        np.testing.assert_allclose(p + 1000.0, p @ T[:3, :3].T + T[:3, 3], atol=2.0)


class TestSampling:
    def test_triples_distinct(self):
        tr = np.asarray(
            _sample_distinct_triples(jax.random.PRNGKey(0), 4096, jnp.int32(50))
        )
        assert tr.min() >= 0 and tr.max() < 50
        assert (tr[:, 0] != tr[:, 1]).all()
        assert (tr[:, 0] != tr[:, 2]).all()
        assert (tr[:, 1] != tr[:, 2]).all()

    def test_triples_uniformish(self):
        tr = np.asarray(
            _sample_distinct_triples(jax.random.PRNGKey(1), 30000, jnp.int32(10))
        )
        counts = np.bincount(tr.ravel(), minlength=10)
        freq = counts / counts.sum()
        assert np.abs(freq - 0.1).max() < 0.01


class TestRansac:
    def _make_corres(self, n=500, outlier_frac=0.5, seed=0):
        rng = np.random.default_rng(seed)
        p = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
        T = random_rigid(seed + 10, angle=0.4, trans=0.5)
        q = p @ T[:3, :3].T + T[:3, 3]
        n_out = int(n * outlier_frac)
        q[:n_out] = rng.uniform(-2, 2, size=(n_out, 3))  # corrupted pairs
        return p, q.astype(np.float32), T

    def test_recovers_transform_half_outliers(self):
        p, q, T = self._make_corres(500, 0.5)
        res = ransac_from_correspondences(
            jnp.asarray(p), jnp.asarray(q), jnp.ones(500, bool),
            jax.random.PRNGKey(0),
            dist_thresh=0.1, max_iterations=8192, batch_size=1024,
        )
        That = np.asarray(res.transformation)
        err_deg = float(se3.rotation_geodesic_deg(jnp.asarray(That[:3, :3]), jnp.asarray(T[:3, :3])))
        assert err_deg < 2.0, f"rotation error {err_deg} deg"
        assert float(res.fitness) > 0.45

    def test_early_stop_saves_work(self):
        """Clean correspondences: confidence reached after the first chunk."""
        p, q, T = self._make_corres(500, 0.0, seed=1)
        res = ransac_from_correspondences(
            jnp.asarray(p), jnp.asarray(q), jnp.ones(500, bool),
            jax.random.PRNGKey(0),
            dist_thresh=0.1, max_iterations=65536, batch_size=512,
        )
        assert int(res.iterations) <= 1024
        assert float(res.fitness) > 0.99

    def test_early_stop_disabled_runs_full_budget(self):
        """early_stop=False (reference early_stop_enabled,
        _visualize_matcher.py:163) must spend the entire hypothesis budget."""
        p, q, T = self._make_corres(500, 0.0, seed=1)
        res = ransac_from_correspondences(
            jnp.asarray(p), jnp.asarray(q), jnp.ones(500, bool),
            jax.random.PRNGKey(0),
            dist_thresh=0.1, max_iterations=4096, batch_size=512,
            early_stop=False,
        )
        assert int(res.iterations) == 4096

    def test_early_stop_min_fitness_floor(self):
        """The confidence stop may not trigger below the fitness floor
        (reference early_stop_threshold): with half the correspondences
        corrupted, best fitness ~0.5 < 0.9 floor -> full budget."""
        p, q, T = self._make_corres(500, 0.5, seed=2)
        res = ransac_from_correspondences(
            jnp.asarray(p), jnp.asarray(q), jnp.ones(500, bool),
            jax.random.PRNGKey(0),
            dist_thresh=0.1, max_iterations=4096, batch_size=512,
            early_stop_min_fitness=0.9,
        )
        assert int(res.iterations) == 4096
        # ...and a floor below the achieved fitness still allows the stop.
        res2 = ransac_from_correspondences(
            jnp.asarray(p), jnp.asarray(q), jnp.ones(500, bool),
            jax.random.PRNGKey(0),
            dist_thresh=0.1, max_iterations=65536, batch_size=512,
            early_stop_min_fitness=0.2,
        )
        assert int(res2.iterations) < 65536

    def test_zero_valid_correspondences(self):
        """Reference zero-correspondence test (test_ransac_crash.py:198-224):
        identity fallback, fitness 0, no crash."""
        p = np.zeros((100, 3), np.float32)
        q = np.zeros((100, 3), np.float32)
        res = ransac_from_correspondences(
            jnp.asarray(p), jnp.asarray(q), jnp.zeros(100, bool),
            jax.random.PRNGKey(0),
            dist_thresh=0.1, max_iterations=1024, batch_size=256,
        )
        assert np.isfinite(np.asarray(res.transformation)).all()

    def test_noise_ratio_sweep(self):
        """Robustness over outlier ratios (reference sweep 0-100x,
        test_ransac_crash.py:227-236): recovery holds through 80% outliers."""
        for frac in (0.0, 0.5, 0.8):
            p, q, T = self._make_corres(600, frac, seed=3)
            res = ransac_from_correspondences(
                jnp.asarray(p), jnp.asarray(q), jnp.ones(600, bool),
                jax.random.PRNGKey(1),
                dist_thresh=0.1, max_iterations=16384, batch_size=2048,
            )
            err = float(
                se3.rotation_geodesic_deg(
                    res.transformation[:3, :3], jnp.asarray(T[:3, :3])
                )
            )
            assert err < 3.0, f"outlier_frac={frac}: rot err {err}"


class TestICP:
    def _clouds(self, n=3000, seed=0):
        pts = dental_arch_cloud(n, seed=seed)
        from tpu3dm.preprocess.normals import estimate_normals

        src = from_numpy(pts)
        T = random_rigid(seed + 1, angle=0.1, trans=0.1)
        tgt_pts = pts @ T[:3, :3].T + T[:3, 3]
        tgt = estimate_normals(from_numpy(tgt_pts), radius=0.6)
        return src, tgt, T

    def test_converges_from_near_identity(self):
        src, tgt, T = self._clouds()
        res = icp_refine(
            src, tgt, jnp.eye(4), dist_thresh=0.4, max_iterations=50,
        )
        That = np.asarray(res.transformation)
        np.testing.assert_allclose(That, T, atol=5e-3)
        assert float(res.fitness) > 0.95
        assert float(res.inlier_rmse) < 0.05

    def test_point_to_point_variant(self):
        src, tgt, T = self._clouds(seed=2)
        res = icp_refine(
            src, tgt, jnp.eye(4), dist_thresh=0.4, max_iterations=60,
            point_to_plane=False,
        )
        np.testing.assert_allclose(np.asarray(res.transformation), T, atol=2e-2)

    def test_convergence_semantics(self):
        """Convergence compares ABSOLUTE fitness/RMSE deltas against the
        relative_fitness/relative_rmse knobs — Open3D's actual
        ICPConvergenceCriteria behavior despite the field names
        (Registration.cpp) — pinned by iteration counts on a known pair."""
        src, tgt, T = self._clouds(n=3000, seed=5)
        loose = icp_refine(
            src, tgt, jnp.eye(4), dist_thresh=0.4, max_iterations=50,
            relative_fitness=0.5, relative_rmse=0.5,
        )
        tight = icp_refine(src, tgt, jnp.eye(4), dist_thresh=0.4, max_iterations=50)
        # A 0.5 absolute tolerance converges almost immediately (2 iters);
        # the 1e-6 default polishes until the absolute deltas plateau — an
        # EARLY stop (9-19 iters depending on XLA reduction order), NOT the
        # iteration cap, which is exactly the Open3D behavior the
        # relative-semantics variant broke (it ran to the cap here).
        assert int(loose.iterations) <= 4
        assert int(loose.iterations) < int(tight.iterations)
        assert 6 <= int(tight.iterations) < 50
        assert float(tight.fitness) > 0.99

    def test_converged_early(self):
        """Identical clouds converge in far fewer than max iterations."""
        pts = dental_arch_cloud(1000, seed=3)
        from tpu3dm.preprocess.normals import estimate_normals

        src = from_numpy(pts)
        tgt = estimate_normals(from_numpy(pts), radius=0.6)
        res = icp_refine(src, tgt, jnp.eye(4), dist_thresh=0.4, max_iterations=30)
        assert int(res.iterations) < 10
        assert float(res.inlier_rmse) < 1e-5


class TestEndToEnd:
    def test_full_pipeline_recovers_ground_truth(self):
        from tpu3dm.registration.pipeline import register_arrays

        src, tgt, T = make_benchmark_pair(8000, seed=7)
        cfg = PipelineConfig.with_voxel_size(0.3)
        out = register_arrays(src, tgt, cfg)
        That = np.asarray(out.transformation)
        rot_err = float(
            se3.rotation_geodesic_deg(
                jnp.asarray(That[:3, :3]), jnp.asarray(T[:3, :3].astype(np.float32))
            )
        )
        # Residual alignment error on the source points
        moved = src @ That[:3, :3].T + That[:3, 3]
        expect = src @ T[:3, :3].T + T[:3, 3]
        rmse = float(np.sqrt(((moved - expect) ** 2).sum(1).mean()))
        assert rot_err < 1.0, f"rotation error {rot_err} deg"
        assert rmse < 0.05, f"alignment rmse {rmse}"
        assert float(out.icp.fitness) > 0.9

    def test_partial_overlap_pair(self):
        """Trimmed partial-overlap pair (BASELINE config 2; headless analog of
        the reference's trim_ply.py cropped pairs)."""
        from tpu3dm.registration.pipeline import register_arrays

        src, tgt, T = make_benchmark_pair(12_000, seed=11, overlap=0.6, sigma=0.003)
        cfg = PipelineConfig.with_voxel_size(0.3)
        out = register_arrays(src, tgt, cfg)
        That = np.asarray(out.transformation)
        rot_err = float(
            se3.rotation_geodesic_deg(
                jnp.asarray(That[:3, :3]), jnp.asarray(T[:3, :3].astype(np.float32))
            )
        )
        # Evaluate alignment only where the cropped target actually has
        # support: source points that land inside the target's bounding box.
        moved = src @ That[:3, :3].T + That[:3, 3]
        expect = src @ T[:3, :3].T + T[:3, 3]
        inside = np.all(
            (expect >= tgt.min(0) - 1e-6) & (expect <= tgt.max(0) + 1e-6), axis=1
        )
        assert inside.sum() > 100
        rmse = float(np.sqrt(((moved[inside] - expect[inside]) ** 2).sum(1).mean()))
        assert rot_err < 2.0, f"rotation error {rot_err} deg"
        assert rmse < 0.08, f"overlap-region rmse {rmse}"


def test_restarts_rescue_symmetric_alias():
    """Near-symmetric arch at low resolution: plain RANSAC can elect a
    ~60-degree alias whose inlier count ties the true pose; ICP-verified
    restarts (register_pair(restarts=4)) must recover the true transform.
    Repro discovered via the multiway benchmark at n_points=6000."""
    import numpy as np

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.preprocess.pipeline import preprocess_points_batch
    from tpu3dm.registration.pipeline import register_pair

    cfg = PipelineConfig.with_voxel_size(0.3)
    rng = np.random.default_rng(0)
    base = dental_arch_cloud(6000, seed=0)
    center = base.mean(axis=0)
    r = np.random.default_rng(1001)
    a, b, c = r.uniform(-np.pi / 6, np.pi / 6, size=3)
    rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    R = rz @ ry @ rx
    t = r.uniform(-0.5, 0.5, size=3)
    o = -R @ center + center + t
    views = [
        (base + 0.01 * rng.standard_normal(base.shape)).astype(np.float32),
        (base @ R.T + o + 0.01 * rng.standard_normal(base.shape)).astype(np.float32),
    ]
    procs = preprocess_points_batch(views, cfg.preprocess)
    res = register_pair(procs[0], procs[1], cfg, restarts=4)
    M = np.asarray(res.icp.transformation)[:3, :3] @ R.T
    rot_err = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
    assert rot_err < 2.0, rot_err


class TestEvaluate:
    """evaluate_registration / information_matrix (Open3D API parity)."""

    def _pair(self, n=2000, seed=7):
        from tpu3dm.core.cloud import from_numpy
        from tpu3dm.io.synthetic import make_benchmark_pair

        s, t, T = make_benchmark_pair(n, seed=seed, sigma=0.005)
        return from_numpy(s), from_numpy(t), T

    def test_evaluate_grades_true_vs_identity(self):
        from tpu3dm.registration.evaluate import evaluate_registration

        src, tgt, T = self._pair()
        good = evaluate_registration(src, tgt, 0.12, jnp.asarray(T))
        bad = evaluate_registration(src, tgt, 0.12)  # identity
        assert float(good.fitness) > 0.95
        assert float(good.inlier_rmse) < 0.03
        assert float(bad.fitness) < float(good.fitness) * 0.8
        assert int(good.iterations) == 0

    def test_information_matrix_structure(self):
        from tpu3dm.registration.evaluate import (
            evaluate_registration,
            information_matrix,
        )

        src, tgt, T = self._pair()
        I6 = np.asarray(information_matrix(src, tgt, 0.12, jnp.asarray(T)))
        assert I6.shape == (6, 6)
        np.testing.assert_allclose(I6, I6.T, atol=1e-3)
        # PSD: all eigenvalues nonnegative.
        assert np.linalg.eigvalsh(I6).min() > -1e-3
        # Top-left translation block is exactly n_inliers * I_3.
        ev = evaluate_registration(src, tgt, 0.12, jnp.asarray(T))
        n_src = int(np.asarray(src.mask).sum())
        n_inl = round(float(ev.fitness) * n_src)
        np.testing.assert_allclose(
            I6[:3, :3], np.eye(3) * n_inl, rtol=1e-5, atol=1e-2
        )
