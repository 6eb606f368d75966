"""Mesh, ring NN, hypothesis-parallel RANSAC, pair-DP on a simulated 8-device
CPU mesh (conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.core import se3
from tpu3dm.ops.nn import nn_search_xla
from tpu3dm.parallel.mesh import make_mesh
from tpu3dm.parallel.multipair import batched_ransac
from tpu3dm.parallel.ring_nn import ring_nn_search
from tpu3dm.parallel.sharded_ransac import sharded_ransac


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(1, 8)


@pytest.fixture(scope="module")
def mesh4x2():
    return make_mesh(4, 2)


def test_mesh_shapes():
    m = make_mesh(2, 4)
    assert m.shape == {"pair": 2, "block": 4}
    assert make_mesh().shape == {"pair": 8, "block": 1}


def test_ring_nn_matches_single_device(mesh8):
    rng = np.random.default_rng(0)
    nq, nt = 512, 1024
    q = jnp.asarray(rng.normal(size=(nq, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(nt, 3)).astype(np.float32))
    qm = jnp.asarray(rng.random(nq) > 0.05)
    tm = jnp.asarray(rng.random(nt) > 0.05)
    d2_ring, idx_ring = ring_nn_search(mesh8, q, t, qm, tm)
    d2_ref, idx_ref = nn_search_xla(q, t, qm, tm)
    np.testing.assert_array_equal(np.asarray(idx_ring), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(d2_ring), np.asarray(d2_ref), rtol=1e-5, atol=1e-5)


def test_ring_nn_feature_space(mesh8):
    """33-D features shard and ring the same way."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(256, 33)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(512, 33)).astype(np.float32))
    ones_q = jnp.ones(256, bool)
    ones_t = jnp.ones(512, bool)
    d2r, ir = ring_nn_search(mesh8, q, t, ones_q, ones_t)
    d2x, ix = nn_search_xla(q, t, ones_q, ones_t)
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ix))


def _corres_problem(n, outlier_frac, seed):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * 0.4
    T = np.asarray(
        se3.exp_se3(jnp.asarray(np.r_[rng.normal(size=3) * 0.4, w], dtype=jnp.float32))
    )
    q = p @ T[:3, :3].T + T[:3, 3]
    n_out = int(n * outlier_frac)
    q[:n_out] = rng.uniform(-2, 2, size=(n_out, 3))
    return p, q.astype(np.float32), T


@pytest.mark.slow
def test_sharded_ransac_recovers(mesh8):
    p, q, T = _corres_problem(400, 0.4, seed=2)
    res = sharded_ransac(
        mesh8,
        jnp.asarray(p),
        jnp.asarray(q),
        jnp.ones(400, bool),
        jax.random.PRNGKey(0),
        dist_thresh=0.1,
        iterations=8192,
    )
    err = float(
        se3.rotation_geodesic_deg(res.transformation[:3, :3], jnp.asarray(T[:3, :3]))
    )
    assert err < 2.0
    assert float(res.fitness) > 0.5


def test_batched_ransac_pair_dp(mesh4x2):
    """8 pairs sharded over a 4x2 mesh recover their own transforms."""
    P = 8
    ps, qs, Ts = [], [], []
    for i in range(P):
        p, q, T = _corres_problem(256, 0.3, seed=10 + i)
        ps.append(p)
        qs.append(q)
        Ts.append(T)
    p_b = jnp.asarray(np.stack(ps))
    q_b = jnp.asarray(np.stack(qs))
    v_b = jnp.ones((P, 256), bool)
    keys = jax.random.split(jax.random.PRNGKey(1), P)
    T_out, fit = batched_ransac(
        mesh4x2, p_b, q_b, v_b, keys, dist_thresh=0.1, iterations=4096, batch_size=1024
    )
    for i in range(P):
        err = float(
            se3.rotation_geodesic_deg(
                T_out[i, :3, :3], jnp.asarray(Ts[i][:3, :3])
            )
        )
        assert err < 2.5, f"pair {i}: {err} deg"
        assert float(fit[i]) > 0.55


@pytest.mark.slow
def test_batched_register_mesh_invariant():
    """The sharded batched register step recovers the same pose on a
    1-device and an 8-device mesh.

    Bit-equality does NOT hold: different mesh layouts compile different
    fusions, whose rounding can flip near-tie hypothesis elections — so the
    assertion is semantic (same rotation within a degree, same fitness)
    rather than exact.
    """
    import numpy as np
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.parallel.mesh import make_mesh
    from tpu3dm.parallel.register import batched_register
    from tpu3dm.preprocess.pipeline import preprocess_points

    cfg = PipelineConfig.with_voxel_size(0.3)
    sp, tp, _ = make_benchmark_pair(4000, seed=0, sigma=0.01)
    s = preprocess_points(sp, cfg.preprocess).down
    t = preprocess_points(tp, cfg.preprocess).down
    cap = max(s.capacity, t.capacity)

    def padto(a, w):
        a = np.asarray(a)
        pad = w - a.shape[0]
        return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a

    P = 8
    def rep(a):
        return jnp.asarray(np.broadcast_to(padto(a, cap), (P,) + padto(a, cap).shape).copy())

    args = [rep(s.points), rep(s.features), rep(s.mask), rep(s.normals),
            rep(t.points), rep(t.features), rep(t.mask), rep(t.normals)]
    keys = jax.random.split(jax.random.PRNGKey(0), P)

    devs = jax.devices()
    out1 = batched_register(make_mesh(1, 1, devices=devs[:1]), *args, keys,
                            ransac_iterations=512, icp_iterations=4)
    out8 = batched_register(make_mesh(len(devs), 1, devices=devs), *args, keys,
                            ransac_iterations=512, icp_iterations=4)
    T1, T8 = np.asarray(out1[0]), np.asarray(out8[0])
    for p in range(P):
        M = T1[p][:3, :3] @ T8[p][:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"pair {p}: rotation differs by {ang} deg"
        assert np.abs(T1[p][:3, 3] - T8[p][:3, 3]).max() < 0.05
    np.testing.assert_allclose(
        np.asarray(out1[1]), np.asarray(out8[1]), atol=0.05
    )


def test_approx_score_matches_exact_winner():
    """bf16 scoring (centered coords) must elect a winner whose exact refit
    lands on the same transform as full-fp32 scoring."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu3dm.parallel.multipair import ransac_pair_step

    rng = np.random.default_rng(11)
    p = rng.standard_normal((512, 3)).astype(np.float32) * 2.0 + 5.0
    ang = 0.4
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([0.3, -0.2, 0.5], np.float32)
    q = p @ R.T + t + 0.01 * rng.standard_normal((512, 3)).astype(np.float32)
    q[300:] += rng.standard_normal((212, 3)).astype(np.float32)  # outliers
    valid = np.ones(512, bool)
    key = jax.random.PRNGKey(0)

    kw = dict(dist_thresh=0.3, iterations=2048, batch_size=2048)
    T_exact, c_exact = ransac_pair_step(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(valid), key, **kw
    )
    T_approx, c_approx = ransac_pair_step(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(valid), key,
        approx_score=True, **kw
    )
    for T in (np.asarray(T_exact), np.asarray(T_approx)):
        M = T[:3, :3] @ R.T
        rot_err = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
        assert rot_err < 2.0, rot_err  # noise-limited: exact path ~1 deg here
        np.testing.assert_allclose(T[:3, 3], t, atol=0.2)
    # exact recount after refit: counts should agree closely
    assert abs(int(c_exact) - int(c_approx)) <= 5


def test_two_stage_scoring_matches_exact_winner():
    """score_subset (two-stage scoring) must elect a winner of the same
    quality as full scoring: subset counts only RANK hypotheses, the
    rescore_top survivors are re-counted exactly over all correspondences,
    so the elected count is an exact count and the refit winner must land on
    the planted transform."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu3dm.parallel.multipair import ransac_pair_step

    rng = np.random.default_rng(13)
    p = rng.standard_normal((640, 3)).astype(np.float32) * 2.0
    ang = -0.3
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    t = np.array([-0.1, 0.4, 0.2], np.float32)
    q = p @ R.T + t + 0.005 * rng.standard_normal((640, 3)).astype(np.float32)
    q[400:] += rng.standard_normal((240, 3)).astype(np.float32)  # outliers
    valid = np.ones(640, bool)
    key = jax.random.PRNGKey(3)

    kw = dict(dist_thresh=0.15, iterations=2048, batch_size=2048)
    T_full, c_full = ransac_pair_step(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(valid), key, **kw
    )
    T_sub, c_sub = ransac_pair_step(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(valid), key,
        score_subset=160, rescore_top=64, **kw
    )
    for T in (np.asarray(T_full), np.asarray(T_sub)):
        M = T[:3, :3] @ R.T
        rot_err = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
        assert rot_err < 1.0, rot_err
        np.testing.assert_allclose(T[:3, 3], t, atol=0.1)
    # Both elected counts are exact counts; the subset ranking may pick a
    # slightly different (but near-best) hypothesis before the refit.
    assert abs(int(c_full) - int(c_sub)) <= 10


def test_two_stage_scoring_degenerate_all_invalid():
    """All-checker-fail chunks must keep -1 through the exact re-score and
    leave the identity fallback in place (no accidental 0-count election of
    a garbage pose)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu3dm.parallel.multipair import ransac_pair_step

    # Collinear correspondences: every 3-point sample is degenerate, every
    # hypothesis fails the frame check and scores -1.
    n = 256
    s = np.linspace(0.0, 1.0, n, dtype=np.float32)
    p = np.stack([s, 2 * s, 3 * s], axis=1)
    q = p + 0.5
    T, count = ransac_pair_step(
        jnp.asarray(p), jnp.asarray(q), jnp.ones(n, bool),
        jax.random.PRNGKey(0), dist_thresh=1e-4, iterations=512,
        batch_size=512, score_subset=64, rescore_top=32, refit=False,
    )
    assert int(count) <= 0
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)
