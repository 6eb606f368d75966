"""NN search, RANSAC scoring, and 3x3 eigen ops vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.ops.eigh3 import eigvals_sym3, smallest_eigvec_sym3
from tpu3dm.ops.nn import nn_search_pallas, nn_search_xla
from tpu3dm.ops.ransac_score import score_hypotheses_pallas, score_hypotheses_xla


def brute_nn(q, t):
    d2 = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    return d2.min(1), d2.argmin(1)


@pytest.mark.parametrize("nq,nt,d", [(100, 200, 3), (257, 515, 3), (64, 64, 33)])
def test_nn_xla_matches_brute(nq, nt, d):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    t = rng.normal(size=(nt, d)).astype(np.float32)
    d2, idx = nn_search_xla(jnp.asarray(q), jnp.asarray(t))
    bd2, bidx = brute_nn(q, t)
    np.testing.assert_array_equal(np.asarray(idx), bidx)
    np.testing.assert_allclose(np.asarray(d2), bd2, atol=1e-4)


def test_nn_xla_respects_target_mask():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    t = rng.normal(size=(80, 3)).astype(np.float32)
    tmask = np.ones(80, bool)
    tmask[40:] = False
    d2, idx = nn_search_xla(jnp.asarray(q), jnp.asarray(t), None, jnp.asarray(tmask))
    bd2, bidx = brute_nn(q, t[:40])
    np.testing.assert_array_equal(np.asarray(idx), bidx)
    np.testing.assert_allclose(np.asarray(d2), bd2, atol=1e-4)


@pytest.mark.parametrize("nq,nt", [(200, 300), (513, 1025)])
def test_nn_pallas_interpret_matches_xla(nq, nt):
    """Pallas kernel in interpreter mode (CPU) must agree with the XLA oracle."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(nq, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(nt, 3)).astype(np.float32))
    d2x, idxx = nn_search_xla(q, t)
    d2p, idxp = nn_search_pallas(q, t, tile_q=128, tile_t=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(idxp), np.asarray(idxx))
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2x), atol=1e-4)


def _random_rigid(rng, k):
    from scipy.stats import special_ortho_group  # not available -> fallback

    raise RuntimeError


def random_rotations(rng, k):
    """Random rotations via QR of gaussians with det fix."""
    A = rng.normal(size=(k, 3, 3))
    Q, _ = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= np.sign(det)[:, None]
    return Q.astype(np.float32)


def brute_score(R, t, p, q, mask, thresh_sq):
    moved = np.einsum("kij,nj->kni", R, p) + t[:, None, :]
    d2 = ((moved - q[None]) ** 2).sum(-1)
    return ((d2 < thresh_sq) & mask[None, :]).sum(1)


@pytest.mark.parametrize("k,n", [(16, 100), (37, 515)])
def test_score_xla_matches_brute(k, n):
    rng = np.random.default_rng(3)
    R = random_rotations(rng, k)
    t = rng.normal(size=(k, 3)).astype(np.float32) * 0.1
    p = rng.normal(size=(n, 3)).astype(np.float32)
    # targets: roughly transformed copies so some hypotheses have inliers
    q = np.einsum("ij,nj->ni", R[0], p) + t[0] + 0.05 * rng.normal(size=(n, 3)).astype(np.float32)
    mask = rng.random(n) > 0.1
    thresh = 0.45**2
    counts = score_hypotheses_xla(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(mask), thresh,
    )
    expect = brute_score(R, t, p, q, mask, thresh)
    np.testing.assert_array_equal(np.asarray(counts), expect)
    assert expect[0] > 0  # sanity: hypothesis 0 really matches


def test_score_pallas_interpret_matches_xla():
    rng = np.random.default_rng(4)
    k, n = 64, 300
    R = random_rotations(rng, k)
    t = rng.normal(size=(k, 3)).astype(np.float32)
    p = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    thresh = 1.0
    cx = score_hypotheses_xla(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(mask), thresh,
    )
    cp = score_hypotheses_pallas(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(mask), thresh, tile_k=128, tile_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cp), np.asarray(cx))


@pytest.mark.parametrize("seed", [0, 1])
def test_eigh3_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(200, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1)  # PSD symmetric
    evals = eigvals_sym3(jnp.asarray(A))
    expect = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(evals), expect, atol=1e-3 * np.abs(expect).max())


def test_smallest_eigvec():
    rng = np.random.default_rng(5)
    B = rng.normal(size=(100, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1)
    lam, v = smallest_eigvec_sym3(jnp.asarray(A))
    lam = np.asarray(lam)
    v = np.asarray(v)
    # A v = lambda v
    resid = np.einsum("nij,nj->ni", A, v) - lam[:, None] * v
    assert np.abs(resid).max() < 1e-2
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_eigh3_degenerate():
    """Isotropic and rank-deficient matrices do not produce NaN."""
    A = jnp.stack([
        jnp.eye(3),                      # isotropic
        jnp.zeros((3, 3)),               # zero
        jnp.diag(jnp.array([1.0, 1.0, 0.0])),  # plane covariance
    ])
    lam, v = smallest_eigvec_sym3(A)
    assert np.isfinite(np.asarray(lam)).all()
    assert np.isfinite(np.asarray(v)).all()
    # plane covariance: smallest eigenvector is the plane normal z
    np.testing.assert_allclose(np.abs(np.asarray(v[2])), [0, 0, 1], atol=1e-5)


def test_nn_mutual_matches_two_searches():
    from tpu3dm.ops.nn import nn_mutual

    rng = np.random.default_rng(7)
    a = rng.normal(size=(120, 33)).astype(np.float32)
    b = rng.normal(size=(90, 33)).astype(np.float32)
    ma = np.ones(120, bool)
    ma[100:] = False
    mb = np.ones(90, bool)
    mb[80:] = False
    fwd, bwd = nn_mutual(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ma), jnp.asarray(mb))
    _, bf = brute_nn(a, b[:80])
    _, bb = brute_nn(b, a[:100])
    np.testing.assert_array_equal(np.asarray(fwd)[:100], bf[:100])
    np.testing.assert_array_equal(np.asarray(bwd)[:80], bb[:80])


class TestNnTopk:
    """ops/topk.py: k-nearest-within-radius (Open3D hybrid-search semantics)."""

    def _oracle(self, q, t, k, radius=None):
        d2 = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1, kind="stable")
        d2s = np.take_along_axis(d2, order, axis=1)
        if radius is not None:
            ok = d2s <= radius * radius
        else:
            ok = np.ones_like(d2s, bool)
        return d2s[:, :k], order[:, :k], ok[:, :k]

    def test_matches_sorted_oracle(self):
        from tpu3dm.ops.topk import nn_topk

        rng = np.random.default_rng(0)
        q = rng.normal(size=(100, 3)).astype(np.float32)
        t = rng.normal(size=(300, 3)).astype(np.float32)
        d2, idx, valid = nn_topk(jnp.asarray(q), jnp.asarray(t), k=7)
        ed2, eidx, eok = self._oracle(q.astype(np.float64), t.astype(np.float64), 7)
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(np.asarray(d2), ed2, atol=1e-4)
        # indices may differ only at float-tie boundaries
        mism = np.asarray(idx) != eidx
        if mism.any():
            np.testing.assert_allclose(
                np.asarray(d2)[mism], ed2[mism], atol=1e-4
            )

    def test_radius_bound_and_validity(self):
        from tpu3dm.ops.topk import nn_topk

        rng = np.random.default_rng(1)
        q = rng.normal(size=(50, 3)).astype(np.float32)
        t = rng.normal(size=(200, 3)).astype(np.float32)
        r = 0.5
        d2, idx, valid = nn_topk(jnp.asarray(q), jnp.asarray(t), k=20, radius=r)
        d2n, vn = np.asarray(d2), np.asarray(valid)
        assert np.all(d2n[vn] <= r * r + 1e-6)
        ed2, _, _ = self._oracle(q.astype(np.float64), t.astype(np.float64), 20)
        in_r = (ed2 <= r * r).sum(axis=1)
        np.testing.assert_array_equal(vn.sum(axis=1), in_r)

    def test_masked_targets_never_selected(self):
        from tpu3dm.ops.topk import nn_topk

        rng = np.random.default_rng(2)
        q = rng.normal(size=(30, 3)).astype(np.float32)
        t = rng.normal(size=(100, 3)).astype(np.float32)
        tmask = np.arange(100) < 60
        _, idx, valid = nn_topk(
            jnp.asarray(q), jnp.asarray(t), None, jnp.asarray(tmask), k=10
        )
        assert np.all(np.asarray(idx)[np.asarray(valid)] < 60)

    def test_k_larger_than_targets(self):
        from tpu3dm.ops.topk import nn_topk

        rng = np.random.default_rng(3)
        q = rng.normal(size=(10, 3)).astype(np.float32)
        t = rng.normal(size=(5, 3)).astype(np.float32)
        d2, idx, valid = nn_topk(jnp.asarray(q), jnp.asarray(t), k=64)
        assert d2.shape == (10, 5)  # clamped to target count
        assert bool(jnp.all(valid))

    def test_single_chunk_fast_path_matches_scan(self):
        """The nb==1 fast path (no scan/buffer-concat) must agree with the
        chunked scan form exactly, including radius masking."""
        from tpu3dm.ops.topk import nn_topk

        rng = np.random.default_rng(4)
        q = rng.normal(size=(80, 3)).astype(np.float32)
        t = rng.normal(size=(300, 3)).astype(np.float32)
        fast = nn_topk(jnp.asarray(q), jnp.asarray(t), k=12, radius=0.8)
        scan = nn_topk(jnp.asarray(q), jnp.asarray(t), k=12, radius=0.8, chunk=64)
        np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(scan[0]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(fast[2]), np.asarray(scan[2]))
        mism = np.asarray(fast[1]) != np.asarray(scan[1])
        if mism.any():  # only at float-tie boundaries
            np.testing.assert_allclose(
                np.asarray(fast[0])[mism], np.asarray(scan[0])[mism], atol=1e-6
            )


def test_nn_mutual_approx_matches_exact_on_separated_features():
    """bf16 feature matmul (approx=True) picks the same mutual pairs when
    matches are not near-ties (the registration regime that matters)."""
    from tpu3dm.ops.nn import nn_mutual

    rng = np.random.default_rng(0)
    base = rng.random((400, 33)).astype(np.float32) * 100.0
    a = base + rng.normal(scale=0.05, size=base.shape).astype(np.float32)
    b = base + rng.normal(scale=0.05, size=base.shape).astype(np.float32)
    f_ex, b_ex = nn_mutual(jnp.asarray(a), jnp.asarray(b))
    f_ap, b_ap = nn_mutual(jnp.asarray(a), jnp.asarray(b), approx=True)
    # identical point sets with small jitter: matches are well separated
    assert (np.asarray(f_ex) == np.asarray(f_ap)).mean() > 0.99
    assert (np.asarray(b_ex) == np.asarray(b_ap)).mean() > 0.99


def test_nn_mutual_mask_matches_nn_mutual():
    """nn_mutual_mask (min-only backward pass) must produce the same forward
    indices and the same mutuality decisions as the argmin formulation on
    distinct-distance inputs."""
    import numpy as np
    import jax.numpy as jnp

    from tpu3dm.ops.nn import nn_mutual, nn_mutual_mask

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((100, 33)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((120, 33)).astype(np.float32))
    ma = jnp.asarray(rng.random(100) < 0.9)
    mb = jnp.asarray(rng.random(120) < 0.9)

    idx_fwd, idx_bwd = nn_mutual(a, b, ma, mb)
    mutual_ref = np.asarray(ma) & (
        np.asarray(idx_bwd)[np.asarray(idx_fwd)] == np.arange(100)
    )
    idx2, mutual2 = nn_mutual_mask(a, b, ma, mb)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx_fwd))
    np.testing.assert_array_equal(np.asarray(mutual2), mutual_ref)


def test_nn_dense_smalld_matches_oracle():
    """The VPU-expansion dense path (D < SMALL_D_MAX) must agree with the
    chunked XLA oracle on masked 3-D inputs."""
    import numpy as np
    import jax.numpy as jnp

    from tpu3dm.ops.nn import nn_search_dense, nn_search_xla

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((257, 3)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((311, 3)).astype(np.float32))
    mt = jnp.asarray(rng.random(311) < 0.8)
    d2a, ia = nn_search_dense(q, t, None, mt)
    d2b, ib = nn_search_xla(q, t, None, mt)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), atol=1e-5)


# ---------------------------------------------------------------------------
# Lane-fused NN kernels (ops/nn_lane.py) vs the dense oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nq,nt,d", [(256, 256, 3), (200, 300, 3), (256, 512, 33)])
def test_nn_lane_interpret_matches_dense(nq, nt, d):
    """Lane-fused kernel (interpret mode) must match the dense path exactly,
    including target masking and non-multiple shapes."""
    from tpu3dm.ops.nn import nn_search_dense
    from tpu3dm.ops.nn_lane import nn_search_lane

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(nt, d)).astype(np.float32))
    tmask = jnp.asarray(rng.random(nt) > 0.2)
    d2d, idxd = nn_search_dense(q, t, None, tmask)
    d2l, idxl = nn_search_lane(q, t, None, tmask, interpret=True)
    np.testing.assert_array_equal(np.asarray(idxl), np.asarray(idxd))
    np.testing.assert_allclose(np.asarray(d2l), np.asarray(d2d), atol=1e-4)


def test_nn_mutual_mask_lane_matches_dense():
    """Mutual-mask lane kernel: forward indices and mutuality bits must match
    the dense formulation (fp32; identical tie semantics)."""
    from tpu3dm.ops.nn import nn_mutual_mask
    from tpu3dm.ops.nn_lane import nn_mutual_mask_lane

    rng = np.random.default_rng(4)
    na, nb, d = 384, 512, 33
    a = jnp.asarray(rng.normal(size=(na, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(nb, d)).astype(np.float32))
    ma = jnp.asarray(rng.random(na) > 0.1)
    mb = jnp.asarray(rng.random(nb) > 0.1)
    idxd, mutd = nn_mutual_mask(a, b, ma, mb)
    idxl, mutl = nn_mutual_mask_lane(a, b, ma, mb, interpret=True)
    np.testing.assert_array_equal(np.asarray(idxl), np.asarray(idxd))
    np.testing.assert_array_equal(np.asarray(mutl), np.asarray(mutd))


def test_nn_lane_vmapped_matches_dense_batch():
    """The production schedule: vmap over a pair-lane batch axis adds the
    batch grid dimension; results must equal the batched dense path."""
    from tpu3dm.ops.nn import nn_search_dense
    from tpu3dm.ops.nn_lane import nn_mutual_mask_lane, nn_search_lane

    rng = np.random.default_rng(5)
    B, m, n = 3, 128, 256
    q = jnp.asarray(rng.normal(size=(B, m, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32))
    tm = jnp.asarray(rng.random((B, n)) > 0.2)
    d2d, idxd = nn_search_dense(q, t, None, tm)
    d2l, idxl = jax.vmap(
        lambda a, b, c: nn_search_lane(a, b, None, c, interpret=True)
    )(q, t, tm)
    np.testing.assert_array_equal(np.asarray(idxl), np.asarray(idxd))
    np.testing.assert_allclose(np.asarray(d2l), np.asarray(d2d), atol=1e-4)

    from tpu3dm.ops.nn import nn_mutual_mask

    f = jnp.asarray(rng.normal(size=(B, m, 33)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, n, 33)).astype(np.float32))
    fm = jnp.asarray(rng.random((B, m)) > 0.1)
    gm = jnp.asarray(rng.random((B, n)) > 0.1)
    idxd2, mutd2 = nn_mutual_mask(f, g, fm, gm)
    idxl2, mutl2 = jax.vmap(
        lambda a, b, c, d: nn_mutual_mask_lane(a, b, c, d, interpret=True)
    )(f, g, fm, gm)
    np.testing.assert_array_equal(np.asarray(idxl2), np.asarray(idxd2))
    np.testing.assert_array_equal(np.asarray(mutl2), np.asarray(mutd2))


def test_nn_mutual_mask_lane_approx_is_exact_f32():
    """The lane kernel accepts ``approx`` for API parity but executes fp32
    (Mosaic rejects bf16 matmul operands): approx=True must equal the EXACT
    dense result, not the bf16 one."""
    from tpu3dm.ops.nn import nn_mutual_mask
    from tpu3dm.ops.nn_lane import nn_mutual_mask_lane

    rng = np.random.default_rng(6)
    na, nb, d = 256, 256, 33
    a = jnp.asarray(np.abs(rng.normal(size=(na, d))).astype(np.float32) * 50)
    b = jnp.asarray(np.abs(rng.normal(size=(nb, d))).astype(np.float32) * 50)
    idxd, mutd = nn_mutual_mask(a, b, approx=False)
    idxl, mutl = nn_mutual_mask_lane(a, b, approx=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(idxl), np.asarray(idxd))
    np.testing.assert_array_equal(np.asarray(mutl), np.asarray(mutd))


# ---------------------------------------------------------------------------
# Value-carrying NN folds (round 5: the gather-free fused-step path)
# ---------------------------------------------------------------------------


def test_nn_search_vals_matches_argmin_gather():
    """nn_search_vals == nn_search + values[idx] on valid rows (d3 + d33)."""
    from tpu3dm.ops.nn import nn_search_dense, nn_search_vals

    rng = np.random.default_rng(0)
    for d in (3, 33):
        q = jnp.asarray(rng.normal(size=(200, d)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(311, d)).astype(np.float32))
        vals = jnp.asarray(rng.normal(size=(311, 6)).astype(np.float32))
        qm = jnp.arange(200) < 190
        tm = jnp.arange(311) < 300
        d2_ref, idx = nn_search_dense(q, t, qm, tm)
        d2_v, v = nn_search_vals(q, t, vals, qm, tm)
        # Masked queries have contractually arbitrary results in both forms.
        np.testing.assert_allclose(
            np.asarray(d2_v)[:190], np.asarray(d2_ref)[:190], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(v)[:190], np.asarray(vals)[np.asarray(idx)[:190]], atol=1e-6
        )


def test_nn_search_vals_vmapped():
    from tpu3dm.ops.nn import nn_search_dense, nn_search_vals

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 64, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 96, 3)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(4, 96, 6)).astype(np.float32))
    d2_v, v = jax.jit(jax.vmap(lambda a, b, c: nn_search_vals(a, b, c)))(q, t, vals)
    d2_ref, idx = nn_search_dense(q, t)
    np.testing.assert_allclose(np.asarray(d2_v), np.asarray(d2_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(v),
        np.take_along_axis(np.asarray(vals), np.asarray(idx)[..., None], axis=1),
        atol=1e-6,
    )


@pytest.mark.parametrize("chunk", [0, 96, 128, 4096])
@pytest.mark.parametrize("approx", [False, True])
def test_nn_mutual_vals_matches_mask_form(chunk, approx):
    """Chunked/one-shot nn_mutual_vals == nn_mutual_mask + gather on valid rows."""
    from tpu3dm.ops.nn import nn_mutual_mask, nn_mutual_vals

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(150, 33)).astype(np.float32) * 3)
    b = jnp.asarray(rng.normal(size=(321, 33)).astype(np.float32) * 3)
    vals = jnp.asarray(rng.normal(size=(321, 3)).astype(np.float32))
    ma = jnp.arange(150) < 140
    mb = jnp.arange(321) < 310
    idx, mut_ref = nn_mutual_mask(a, b, ma, mb, approx=approx)
    v, mut = nn_mutual_vals(a, b, vals, ma, mb, approx=approx, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(mut), np.asarray(mut_ref))
    np.testing.assert_allclose(
        np.asarray(v)[:140], np.asarray(vals)[np.asarray(idx)[:140]], atol=1e-6
    )


def test_fused_step_values_impl_matches_dense():
    """nn_impl='values' elects the same transform as 'dense' (plain + rescue)."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.preprocess.pipeline import preprocess_points
    from tpu3dm.registration.fused import fused_register_step

    cfg = PipelineConfig.with_voxel_size(0.3)
    sp, tp, _ = make_benchmark_pair(1500, seed=3, sigma=0.01)
    src = preprocess_points(sp, cfg.preprocess)
    tgt = preprocess_points(tp, cfg.preprocess)
    sd, td = src.down, tgt.down
    key = jax.random.PRNGKey(0)
    for rescue in (0, 2):
        outs = {}
        for impl in ("dense", "values"):
            outs[impl] = fused_register_step(
                sd.points, sd.features, sd.mask, sd.normals,
                td.points, td.features, td.mask, td.normals, key,
                dist_thresh=cfg.ransac.dist_thresh,
                icp_thresh=cfg.icp.dist_thresh,
                ransac_iterations=256, ransac_batch=256,
                icp_iterations=4, icp_solves_per_nn=2,
                rescue_restarts=rescue, rescue_modes=2,  # small program: the
                # parity claim is impl-equivalence, not mode count
                nn_impl=impl,
            )
        np.testing.assert_allclose(
            np.asarray(outs["dense"][0]), np.asarray(outs["values"][0]), atol=1e-5
        )


def test_fused_step_values_pk_large_coordinates():
    """Registration must be POSITION-INVARIANT (round-5 review finding):
    at large absolute coordinates, uncentered |a|^2+|b|^2-2ab kNN lost
    the feature stage to fp32 cancellation, the p2pl Jacobian pivoted
    about a far origin, and the f16 payload packing quantized absolute
    values.  All three are fixed by centering (feature stage, whole-step
    frame conjugation, payload shift); a pair 1000-2000 units from the
    origin must register exactly as well as the origin-centered one."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.preprocess.pipeline import preprocess_points
    from tpu3dm.registration.fused import fused_register_step

    cfg = PipelineConfig.with_voxel_size(0.3)
    sp, tp, T_true = make_benchmark_pair(1500, seed=4, sigma=0.01)
    shift = np.array([1000.0, -2000.0, 1500.0], np.float32)
    sp = sp + shift
    tp = tp + shift
    T_shifted = T_true.copy()
    # tgt' = R (src' - shift) + t + shift  =>  t' = t + shift - R shift
    T_shifted[:3, 3] = (
        T_true[:3, 3] + shift - T_true[:3, :3] @ shift
    )
    src = preprocess_points(sp, cfg.preprocess)
    tgt = preprocess_points(tp, cfg.preprocess)
    sd, td = src.down, tgt.down
    T, f, r = fused_register_step(
        sd.points, sd.features, sd.mask, sd.normals,
        td.points, td.features, td.mask, td.normals, jax.random.PRNGKey(0),
        dist_thresh=cfg.ransac.dist_thresh, icp_thresh=cfg.icp.dist_thresh,
        ransac_iterations=256, ransac_batch=256,
        icp_iterations=6, icp_solves_per_nn=2, nn_impl="values_pk",
    )
    T = np.asarray(T)
    M = T[:3, :3] @ T_shifted[:3, :3].T
    err = float(np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1))))
    moved = sp @ T[:3, :3].T + T[:3, 3]
    expect = sp @ T_shifted[:3, :3].T + T_shifted[:3, 3]
    rmse = float(np.sqrt(((moved - expect) ** 2).sum(1).mean()))
    assert err < 1.0, err
    assert rmse < 0.05, rmse
