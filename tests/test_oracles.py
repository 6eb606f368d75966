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
