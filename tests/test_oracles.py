"""Independent-oracle tests: scipy cKDTree / Rotation / numpy eigh.

The rest of the suite checks Pallas kernels against the XLA reference
implementations — consistent, but self-referential.  These tests check the
*algorithms* against third-party oracles:

  - NN search vs scipy.spatial.cKDTree (exact tree-based NN)
  - rigid fit vs scipy.spatial.transform.Rotation.align_vectors (Wahba)
  - normal estimation vs per-point PCA via numpy.linalg.eigh

(The reference delegates these to Open3D's C++, which is not installable
here; scipy is the closest independent implementation.)
"""

import numpy as np
import pytest

scipy_spatial = pytest.importorskip("scipy.spatial")
from scipy.spatial import cKDTree  # noqa: E402
from scipy.spatial.transform import Rotation  # noqa: E402


def _rand_cloud(n, seed):
    return np.random.default_rng(seed).standard_normal((n, 3)).astype(np.float32)


class TestNNvsKDTree:
    @pytest.mark.parametrize("nq,nt", [(500, 700), (1000, 1000)])
    def test_dense_matches_kdtree(self, nq, nt):
        from tpu3dm.ops.nn import nn_search_dense

        q, t = _rand_cloud(nq, 0), _rand_cloud(nt, 1)
        d2, idx = nn_search_dense(q, t)
        tree = cKDTree(t)
        d_ref, idx_ref = tree.query(q, k=1)
        # distances must agree everywhere; indices may differ only on exact
        # ties (squared-distance within float tolerance)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, atol=1e-3)
        diff = np.asarray(idx) != idx_ref
        if diff.any():
            d_ours = np.linalg.norm(q[diff] - t[np.asarray(idx)[diff]], axis=1)
            np.testing.assert_allclose(d_ours, d_ref[diff], atol=1e-3)

    def test_xla_masked_matches_kdtree_on_valid(self):
        from tpu3dm.ops.nn import nn_search_xla

        q, t = _rand_cloud(300, 2), _rand_cloud(400, 3)
        tmask = np.ones(400, bool)
        tmask[150:250] = False  # masked targets must never win
        d2, idx = nn_search_xla(q, t, None, tmask)
        tree = cKDTree(t[tmask])
        d_ref, _ = tree.query(q, k=1)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, atol=1e-3)
        assert tmask[np.asarray(idx)].all()

    def test_blocksparse_matches_kdtree(self):
        from tpu3dm.ops.nn_sparse import (
            kd_perm,
            nn_search_blocksparse_xla,
            pad_sorted,
        )

        rng = np.random.default_rng(4)
        block = 256
        t = rng.standard_normal((20_000, 3)).astype(np.float32)
        q = (t[rng.integers(0, 20_000, 3_000)]
             + 0.01 * rng.standard_normal((3_000, 3)).astype(np.float32))
        tp = pad_sorted(t[kd_perm(t, block)], block)
        qp = pad_sorted(q[kd_perm(q, block)], block)
        d2, _idx, cert = nn_search_blocksparse_xla(qp, tp, block=block, w=16)
        tree = cKDTree(t)
        # rows [:3000] of qp are the real queries in KD-sorted order (padding
        # is appended).  Block-sparse search is high-recall with a per-block
        # exactness certificate (see tests/test_large.py): assert recall vs
        # the tree, and that every CERTIFIED entry is exactly right.
        ours = np.sqrt(np.maximum(np.asarray(d2)[:3000], 0))
        d_ref = tree.query(np.asarray(qp)[:3000], k=1)[0]
        recall = np.isclose(ours, d_ref, atol=1e-3).mean()
        assert recall > 0.85, recall  # volume-filling Gaussian = hard case
        blk = np.arange(3000) // block
        certified = ours <= np.asarray(cert)[blk] - 1e-7
        assert certified.any()
        np.testing.assert_allclose(ours[certified], d_ref[certified], atol=1e-3)


class TestRigidFitVsScipy:
    def test_horn_matches_align_vectors(self):
        from tpu3dm.registration.kabsch import fit_rigid_horn

        rng = np.random.default_rng(5)
        p = rng.standard_normal((50, 3)).astype(np.float32)
        R_true = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
        t_true = np.array([0.5, -1.0, 0.25], np.float32)
        q = p @ R_true.T + t_true

        T = np.asarray(fit_rigid_horn(p, q, np.ones(50, np.float32)))
        # scipy oracle: align centered vectors (Wahba problem)
        R_ref, _ = Rotation.align_vectors(q - q.mean(0), p - p.mean(0))
        np.testing.assert_allclose(T[:3, :3], R_ref.as_matrix(), atol=1e-4)
        np.testing.assert_allclose(T[:3, :3], R_true, atol=1e-4)
        np.testing.assert_allclose(T[:3, 3], t_true, atol=1e-4)

    def test_horn_weighted_matches_scipy_weighted(self):
        from tpu3dm.registration.kabsch import fit_rigid_horn

        rng = np.random.default_rng(6)
        p = rng.standard_normal((80, 3)).astype(np.float32)
        R_true = Rotation.from_rotvec([0.1, 0.4, -0.3]).as_matrix().astype(np.float32)
        q = (p @ R_true.T).astype(np.float32)
        # corrupt half the pairs; weights exclude them
        q[40:] += rng.standard_normal((40, 3)).astype(np.float32)
        w = np.zeros(80, np.float32)
        w[:40] = 1.0
        T = np.asarray(fit_rigid_horn(p, q, w))
        cw = w / w.sum()
        pc = p - (cw[:, None] * p).sum(0)
        qc = q - (cw[:, None] * q).sum(0)
        R_ref, _ = Rotation.align_vectors(qc[:40], pc[:40])
        np.testing.assert_allclose(T[:3, :3], R_ref.as_matrix(), atol=1e-4)


class TestNormalsVsPCA:
    def test_normals_match_local_pca(self):
        from tpu3dm.core.cloud import from_numpy
        from tpu3dm.preprocess.normals import estimate_normals

        # noisy plane: PCA normal is ez
        rng = np.random.default_rng(7)
        pts = np.zeros((600, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, (600, 2))
        pts[:, 2] = 0.01 * rng.standard_normal(600)
        radius = 0.35
        pc = estimate_normals(from_numpy(pts), radius)
        ours = np.asarray(pc.normals)[:600]

        tree = cKDTree(pts)
        inner = np.flatnonzero(np.abs(pts[:, 0]) < 0.6)[:100]
        for i in inner:
            nb = tree.query_ball_point(pts[i], radius)
            nbp = pts[nb] - pts[nb].mean(0)
            _, vecs = np.linalg.eigh(nbp.T @ nbp)
            n_ref = vecs[:, 0]
            cos = abs(float(ours[i] @ n_ref))
            assert cos > 0.99, (i, cos)


# ---------------------------------------------------------------------------
# FPFH vs an independent NumPy transcription of Open3D's Feature.cpp
# ---------------------------------------------------------------------------


def _o3d_pair_features(p1, n1, p2, n2):
    """Literal loop transcription of Open3D ComputePairFeatures.

    Returns (theta, alpha, phi, d).  Open3D's result vector is
    (f0=theta, f1=alpha, f2=phi, f3=|dp|); the source/target swap rule picks
    the normal with the smaller angle to the connecting line as the u-axis.
    """
    dp = p2 - p1
    d = float(np.linalg.norm(dp))
    if d == 0.0:
        return 0.0, 0.0, 0.0, 0.0
    n1c, n2c = n1.copy(), n2.copy()
    angle1 = float(np.dot(n1c, dp)) / d
    angle2 = float(np.dot(n2c, dp)) / d
    if np.arccos(np.clip(abs(angle1), 0, 1)) > np.arccos(np.clip(abs(angle2), 0, 1)):
        n1c, n2c = n2.copy(), n1.copy()
        dp = -dp
        phi = -angle2
    else:
        phi = angle1
    v = np.cross(dp, n1c)
    v_norm = float(np.linalg.norm(v))
    if v_norm == 0.0:
        return 0.0, 0.0, 0.0, d
    v = v / v_norm
    w = np.cross(n1c, v)
    alpha = float(np.dot(v, n2c))
    theta = float(np.arctan2(np.dot(w, n2c), np.dot(n1c, n2c)))
    return theta, alpha, phi, d


def fpfh_oracle(points, normals, radius, max_nn):
    """Independent NumPy FPFH: Open3D Feature.cpp semantics, loop-based.

    Hybrid search = the max_nn nearest points within radius INCLUDING self
    (skipped in the loops like Open3D's k=0 entry); SPFH hit weight
    100/(neighbour count); FPFH = (neighbour SPFH sum weighted by 1/d^2,
    each 11-bin subhistogram normalised to 100) + self SPFH.
    """
    n = len(points)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    r2 = radius * radius
    neigh = []
    for i in range(n):
        order = np.argsort(d2[i], kind="stable")
        sel = [j for j in order if d2[i, j] <= r2][:max_nn]
        neigh.append([j for j in sel if d2[i, j] > 0.0])

    spfh = np.zeros((n, 33))
    for i in range(n):
        if not neigh[i]:
            continue
        incr = 100.0 / len(neigh[i])
        for j in neigh[i]:
            theta, alpha, phi, _ = _o3d_pair_features(
                points[i], normals[i], points[j], normals[j]
            )
            h = min(max(int(np.floor(11 * (theta + np.pi) / (2 * np.pi))), 0), 10)
            spfh[i, h] += incr
            h = min(max(int(np.floor(11 * (alpha + 1.0) * 0.5)), 0), 10)
            spfh[i, 11 + h] += incr
            h = min(max(int(np.floor(11 * (phi + 1.0) * 0.5)), 0), 10)
            spfh[i, 22 + h] += incr

    fpfh = np.zeros((n, 33))
    for i in range(n):
        acc = np.zeros(33)
        for j in neigh[i]:
            acc += spfh[j] / d2[i, j]
        for s in range(3):
            ssum = acc[11 * s : 11 * s + 11].sum()
            if ssum != 0.0:
                acc[11 * s : 11 * s + 11] *= 100.0 / ssum
        fpfh[i] = acc + spfh[i]
    return fpfh


class TestFpfhVsOracle:
    """SURVEY §7.3 gate: FPFH matches an Open3D-derived oracle (VERDICT r1
    item 2 — the one hot kernel that had no third-party check)."""

    @pytest.mark.parametrize("seed,max_nn", [(0, 100), (1, 20), (2, 7)])
    def test_capped_fpfh_matches_oracle(self, seed, max_nn):
        import jax.numpy as jnp

        from tpu3dm.core.cloud import from_numpy
        from tpu3dm.io.synthetic import dental_arch_cloud
        from tpu3dm.preprocess.fpfh import compute_fpfh_capped

        pts = dental_arch_cloud(300, seed=seed).astype(np.float32)
        rng = np.random.default_rng(seed + 10)
        nrm = rng.standard_normal((300, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        radius = 1.5

        pc = from_numpy(pts)
        nrm_pad = np.zeros((pc.points.shape[0], 3), np.float32)
        nrm_pad[: pts.shape[0]] = nrm
        pc = pc.with_(normals=jnp.asarray(nrm_pad))
        got = np.asarray(
            compute_fpfh_capped(pc, radius, max_nn=max_nn).features
        )[: pts.shape[0]]
        want = fpfh_oracle(
            pts.astype(np.float64), nrm.astype(np.float64), radius, max_nn
        )
        # fp32 (device) vs fp64 (oracle) angle computation flips a handful of
        # bin assignments right at bin boundaries: each flip moves one
        # hist_incr (=100/k) between adjacent bins.  Verified: neighbour sets
        # are IDENTICAL; only boundary bins differ.  Require exactness for
        # >=99.5% of histogram entries and a tiny mean deviation.
        d = np.abs(got - want)
        assert (d > 0.35).mean() < 0.005, f"{(d > 0.35).sum()} entries off"
        assert d.mean() < 0.02
        # Histograms are far from trivial: each sub-histogram of a point with
        # neighbours sums to ~200 (100 self + 100 normalised neighbour sum).
        sums = want.reshape(-1, 3, 11).sum(axis=2)
        assert np.isclose(sums[sums > 1].mean(), 200.0, atol=1.0)

    def test_capped_normals_match_knn_pca(self):
        """estimate_normals_capped == PCA over the k nearest in-radius
        neighbours (self included), per-point NumPy."""
        import jax.numpy as jnp  # noqa: F401

        from tpu3dm.core.cloud import from_numpy
        from tpu3dm.io.synthetic import dental_arch_cloud
        from tpu3dm.preprocess.normals import estimate_normals_capped

        pts = dental_arch_cloud(400, seed=3).astype(np.float32)
        radius, k = 0.8, 12
        pc = estimate_normals_capped(from_numpy(pts), radius, max_nn=k)
        got = np.asarray(pc.normals)[: pts.shape[0]]

        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        centroid = pts.mean(axis=0)
        for i in range(0, 400, 17):
            order = np.argsort(d2[i], kind="stable")
            sel = [j for j in order if d2[i, j] <= radius * radius][:k]
            nb = pts[sel]
            cov = np.cov(nb.T, bias=True)
            evals, evecs = np.linalg.eigh(cov)
            want = evecs[:, 0]
            if np.dot(want, pts[i] - centroid) < 0:
                want = -want
            dot = abs(float(np.dot(got[i], want)))
            assert dot > 0.99, f"point {i}: |cos| = {dot}"


# ---------------------------------------------------------------------------
# Real-Open3D cross-oracle (round 5, verdict item 8)
# ---------------------------------------------------------------------------
# The FPFH/normals/ICP oracles above are independent NumPy TRANSCRIPTIONS of
# Open3D's C++ (Feature.cpp, Registration.cpp) — a transcription error would
# be invisible to every test in this repo.  This test compares against the
# REAL library whenever `open3d` is importable.  In the round-5 build
# environment it is not installable (zero network egress: pip cannot resolve
# pypi.org — attempted and documented in docs/STATUS.md), so the test skips
# there; any environment with the CPU wheel closes the provenance loop by
# just running pytest.

def test_fpfh_matches_real_open3d():
    """FPFH histograms vs o3d.pipelines.registration.compute_fpfh_feature
    on a small fixture (reference call: src/ply/ply.py:117-120)."""
    open3d = pytest.importorskip(
        "open3d", reason="open3d not installed (no egress in build env)"
    )
    import jax.numpy as jnp

    from tpu3dm.core.cloud import from_numpy
    from tpu3dm.preprocess.fpfh import compute_fpfh_capped
    from tpu3dm.preprocess.normals import estimate_normals_capped

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float64)
    radius_n, radius_f = 0.8, 2.0

    pcd = open3d.geometry.PointCloud()
    pcd.points = open3d.utility.Vector3dVector(pts)
    pcd.estimate_normals(
        open3d.geometry.KDTreeSearchParamHybrid(radius=radius_n, max_nn=30)
    )
    feat = open3d.pipelines.registration.compute_fpfh_feature(
        pcd, open3d.geometry.KDTreeSearchParamHybrid(radius=radius_f, max_nn=100)
    )
    ref = np.asarray(feat.data).T  # [N, 33]

    pc = from_numpy(pts.astype(np.float32))
    pc = estimate_normals_capped(pc, jnp.float32(radius_n), max_nn=30)
    # Use Open3D's normals (orientation conventions differ; FPFH angles use
    # the normal DIRECTION, so feed the oracle's normals for a pure FPFH
    # comparison).
    pc = pc.with_(normals=jnp.asarray(np.asarray(pcd.normals), np.float32))
    pc = compute_fpfh_capped(pc, jnp.float32(radius_f), max_nn=100)
    got = np.asarray(pc.features)[: pts.shape[0]]
    # fp32-vs-fp64 bin-boundary flips move a few entries between adjacent
    # bins; compare in L1 per point against the ~200 total mass.
    l1 = np.abs(got - ref).sum(axis=1)
    assert np.median(l1) < 2.0, np.median(l1)
    assert l1.max() < 40.0, l1.max()


def test_icp_matches_real_open3d():
    """Point-to-plane ICP fitness/RMSE vs o3d.pipelines.registration
    (reference call: src/matcher/icp.py:42-48)."""
    open3d = pytest.importorskip(
        "open3d", reason="open3d not installed (no egress in build env)"
    )
    import jax.numpy as jnp

    from tpu3dm.registration.icp import icp_refine

    rng = np.random.default_rng(1)
    src = rng.normal(size=(500, 3)).astype(np.float64)
    R = np.array([[0.9995, -0.03, 0.0], [0.03, 0.9995, 0.0], [0.0, 0.0, 1.0]])
    u, _, vt = np.linalg.svd(R)
    R = u @ vt
    tgt = src @ R.T + np.array([0.02, -0.01, 0.03])

    ps = open3d.geometry.PointCloud()
    ps.points = open3d.utility.Vector3dVector(src)
    pt = open3d.geometry.PointCloud()
    pt.points = open3d.utility.Vector3dVector(tgt)
    pt.estimate_normals(
        open3d.geometry.KDTreeSearchParamHybrid(radius=1.0, max_nn=30)
    )
    thresh = 0.2
    ref = open3d.pipelines.registration.registration_icp(
        ps, pt, thresh, np.eye(4),
        open3d.pipelines.registration.TransformationEstimationPointToPlane(),
        open3d.pipelines.registration.ICPConvergenceCriteria(max_iteration=30),
    )

    from tpu3dm.core.cloud import from_numpy
    s_pc = from_numpy(src.astype(np.float32))
    t_pc = from_numpy(tgt.astype(np.float32)).with_(
        normals=jnp.asarray(np.asarray(pt.normals), np.float32)
    )
    res = icp_refine(
        s_pc, t_pc, jnp.eye(4), dist_thresh=thresh, max_iterations=30,
    )
    assert abs(float(res.fitness) - ref.fitness) < 0.02
    assert abs(float(res.inlier_rmse) - ref.inlier_rmse) < 0.01
