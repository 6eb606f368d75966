"""Block-sparse NN (ops/nn_sparse.py) and large-cloud ICP (registration/large.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.io.synthetic import dental_arch_cloud
from tpu3dm.ops.nn import nn_search_xla
from tpu3dm.ops.nn_sparse import (
    candidate_blocks,
    kd_perm,
    nn_search_blocksparse,
    nn_search_blocksparse_xla,
    pad_sorted,
)


def _sorted_pair(n=20000, block=256):
    tgt = dental_arch_cloud(n, seed=0).astype(np.float32)
    qry = dental_arch_cloud(n, seed=1).astype(np.float32) + 0.005
    tp = pad_sorted(tgt[kd_perm(tgt, block)], block)
    qp = pad_sorted(qry[kd_perm(qry, block)], block)
    return jnp.asarray(qp), jnp.asarray(tp)


class TestKdPerm:
    def test_is_permutation(self):
        pts = dental_arch_cloud(5000, seed=2)
        perm = kd_perm(pts, 256)
        assert sorted(perm.tolist()) == list(range(5000))

    def test_blocks_are_tight(self):
        """KD blocks must be far tighter than random blocks."""
        pts = dental_arch_cloud(20000, seed=0)
        perm = kd_perm(pts, 256)
        sorted_pts = pts[perm][: (20000 // 256) * 256].reshape(-1, 256, 3)
        kd_radius = np.linalg.norm(
            sorted_pts - sorted_pts.mean(1, keepdims=True), axis=-1
        ).max(1)
        rand_pts = pts[: (20000 // 256) * 256].reshape(-1, 256, 3)
        rand_radius = np.linalg.norm(
            rand_pts - rand_pts.mean(1, keepdims=True), axis=-1
        ).max(1)
        assert kd_radius.mean() < 0.3 * rand_radius.mean()


class TestBlocksparseNN:
    def test_high_recall_vs_oracle(self):
        qp, tp = _sorted_pair()
        od2, oidx = nn_search_xla(qp, tp)
        d2, idx, cert = nn_search_blocksparse_xla(qp, tp, block=256, w=16)
        real = np.asarray(qp)[:, 0] < 1e5
        recall = np.isclose(np.asarray(d2)[real], np.asarray(od2)[real], atol=1e-6).mean()
        assert recall > 0.97, recall

    def test_certificate_never_lies(self):
        qp, tp = _sorted_pair()
        od2, _ = nn_search_xla(qp, tp)
        for w in (4, 8, 16):
            d2, idx, cert = nn_search_blocksparse_xla(qp, tp, block=256, w=w)
            d2 = np.asarray(d2)
            blk = np.arange(len(d2)) // 256
            certified = np.sqrt(np.maximum(d2, 0.0)) <= np.asarray(cert)[blk] - 1e-7
            bad = certified & ~np.isclose(d2, np.asarray(od2), atol=1e-6)
            assert not bad.any(), f"w={w}: {bad.sum()} certified-but-wrong"

    def test_indices_are_true_positions(self):
        qp, tp = _sorted_pair()
        d2, idx, _ = nn_search_blocksparse_xla(qp, tp, block=256, w=8)
        real = np.asarray(qp)[:, 0] < 1e5  # sentinel rows: 1e12-scale d2,
        # catastrophic cancellation makes them meaningless (and unused)
        got = np.asarray(tp)[np.asarray(idx)[real]]
        dd = ((np.asarray(qp)[real] - got) ** 2).sum(1)
        # atol reflects f32 cancellation in the |t|^2 - 2qt + |q|^2 form:
        # ~|q|^2 * eps ~ 4e-5 at coordinate scale ~20.
        np.testing.assert_allclose(dd, np.asarray(d2)[real], rtol=1e-3, atol=2e-4)

    def test_pallas_interpret_matches_xla(self):
        qp, tp = _sorted_pair(n=4000, block=128)
        d2p, idxp, cp = nn_search_blocksparse(qp, tp, block=128, w=8, interpret=True)
        d2x, idxx, cx = nn_search_blocksparse_xla(qp, tp, block=128, w=8)
        np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2x), atol=1e-5)
        assert (np.asarray(idxp) == np.asarray(idxx)).mean() > 0.999
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), atol=1e-6)

    def test_w_covers_all_blocks_is_exact(self):
        """With W = all blocks, block-sparse equals brute force exactly."""
        qp, tp = _sorted_pair(n=2000, block=128)
        ntb = tp.shape[0] // 128
        od2, oidx = nn_search_xla(qp, tp)
        d2, idx, _ = nn_search_blocksparse_xla(qp, tp, block=128, w=ntb)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(od2), atol=1e-5)


class TestLargeICP:
    def _make(self, n=20000, seed=3):
        from tpu3dm.io.synthetic import make_benchmark_pair

        return make_benchmark_pair(n, seed=seed, sigma=0.002)

    def test_point_to_point_recovery(self):
        from tpu3dm.registration.large import icp_refine_large, prepare_large_cloud

        src_pts, tgt_pts, T_true = self._make()
        src = prepare_large_cloud(src_pts, block=512)
        tgt = prepare_large_cloud(tgt_pts, block=512)
        # start from a perturbed version of the true transform (RANSAC-coarse)
        T0 = np.asarray(T_true).copy()
        T0[:3, 3] += 0.05
        res = icp_refine_large(
            src, tgt, T0, dist_thresh=0.12, max_iterations=30, w=8,
            point_to_plane=False,
        )
        T = np.asarray(res.transformation)
        moved = src_pts @ T[:3, :3].T + T[:3, 3]
        expect = src_pts @ np.asarray(T_true)[:3, :3].T + np.asarray(T_true)[:3, 3]
        rmse = float(np.sqrt(((moved - expect) ** 2).sum(1).mean()))
        assert rmse < 0.02, rmse
        assert float(res.fitness) > 0.9

    def test_point_to_plane_recovery(self):
        from tpu3dm.preprocess.normals import estimate_normals
        from tpu3dm.core.cloud import from_numpy
        from tpu3dm.registration.large import icp_refine_large, prepare_large_cloud

        src_pts, tgt_pts, T_true = self._make(n=12000, seed=5)
        nrm = np.asarray(
            estimate_normals(from_numpy(tgt_pts), 0.6).normals
        )[: tgt_pts.shape[0]]
        src = prepare_large_cloud(src_pts, block=512)
        tgt = prepare_large_cloud(tgt_pts, block=512, normals=nrm)
        T0 = np.asarray(T_true).copy()
        T0[:3, 3] += 0.04
        res = icp_refine_large(src, tgt, T0, dist_thresh=0.12, w=8)
        T = np.asarray(res.transformation)
        moved = src_pts @ T[:3, :3].T + T[:3, 3]
        expect = src_pts @ np.asarray(T_true)[:3, :3].T + np.asarray(T_true)[:3, 3]
        rmse = float(np.sqrt(((moved - expect) ** 2).sum(1).mean()))
        assert rmse < 0.02, rmse

    @pytest.mark.slow
    def test_register_arrays_large_end_to_end(self):
        """Full large-cloud pipeline, including the symmetry-alias seed (13)
        where single-shot RANSAC ties the wrong pose (rot 63 deg) and only
        verified restarts recover it."""
        from tpu3dm.io.synthetic import make_benchmark_pair
        from tpu3dm.registration.large import register_arrays_large

        src_pts, tgt_pts, T_true = make_benchmark_pair(30_000, seed=13, sigma=0.002)
        fine, coarse = register_arrays_large(src_pts, tgt_pts)
        T = np.asarray(fine.transformation)
        Tt = np.asarray(T_true)
        moved = src_pts @ T[:3, :3].T + T[:3, 3]
        expect = src_pts @ Tt[:3, :3].T + Tt[:3, 3]
        rmse = float(np.sqrt(((moved - expect) ** 2).sum(1).mean()))
        assert rmse < 0.02, rmse
        assert float(fine.fitness) > 0.9


@pytest.mark.slow
def test_register_large_point_to_plane_donor_normals():
    """Full-res point-to-plane via donor normals beats point-to-point in
    convergence (fewer iterations) at equal-or-better alignment."""
    import numpy as np
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.registration.large import register_arrays_large

    src_pts, tgt_pts, T_true = make_benchmark_pair(60_000, seed=4, sigma=0.002)
    fine, _ = register_arrays_large(src_pts, tgt_pts, point_to_plane=True)
    T = np.asarray(fine.transformation)
    moved = src_pts @ T[:3, :3].T + T[:3, 3]
    expect = src_pts @ np.asarray(T_true)[:3, :3].T + np.asarray(T_true)[:3, 3]
    rmse = float(np.sqrt(((moved - expect) ** 2).sum(1).mean()))
    assert rmse < 0.005
    assert float(fine.fitness) > 0.95
