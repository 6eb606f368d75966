"""Pose-graph optimization and multiway registration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.core import se3
from tpu3dm.multiway.posegraph import default_edges, optimize_pose_graph


def _rand_pose(seed, scale=0.5):
    rng = np.random.default_rng(seed)
    xi = np.r_[rng.normal(size=3) * scale, rng.normal(size=3) * scale]
    return np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)))


def _edge_measurements(poses, edges, noise=0.0, seed=0):
    """T_e with x_j = T_e x_i: T_e = P_j^-1 P_i."""
    rng = np.random.default_rng(seed)
    Ts = []
    for i, j in edges:
        T = np.linalg.inv(poses[j]) @ poses[i]
        if noise > 0:
            xi = np.r_[rng.normal(size=3), rng.normal(size=3)] * noise
            T = T @ np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)))
        Ts.append(T)
    return np.stack(Ts).astype(np.float32)


def test_pose_graph_exact_chain():
    n = 5
    poses_true = np.stack([np.eye(4, dtype=np.float32)] + [_rand_pose(i) for i in range(1, n)])
    edges = default_edges(n)
    T_meas = _edge_measurements(poses_true, edges)
    poses = np.asarray(
        optimize_pose_graph(
            jnp.asarray(T_meas),
            jnp.asarray(np.asarray(edges, np.int32)),
            jnp.ones(len(edges)),
            n_nodes=n,
            iterations=15,
        )
    )
    # Gauge: pose 0 = I; remaining poses recover exactly.
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-5)
    for k in range(n):
        np.testing.assert_allclose(poses[k], poses_true[k], atol=1e-3)


def test_pose_graph_distributes_loop_error():
    """Noisy loop: optimization beats dead-reckoning chain composition."""
    n = 6
    poses_true = np.stack([np.eye(4, dtype=np.float32)] + [_rand_pose(10 + i, 0.4) for i in range(1, n)])
    edges = default_edges(n)  # includes loop closure
    T_meas = _edge_measurements(poses_true, edges, noise=0.02, seed=1)
    poses = np.asarray(
        optimize_pose_graph(
            jnp.asarray(T_meas),
            jnp.asarray(np.asarray(edges, np.int32)),
            jnp.ones(len(edges)),
            n_nodes=n,
            iterations=25,
        )
    )
    # Dead reckoning: chain composition without the loop edge.
    dr = [np.eye(4, dtype=np.float32)]
    for e in range(n - 1):
        # x_{i+1} = T_e x_i  =>  P_{i+1} = P_i T_e^{-1}
        dr.append(dr[-1] @ np.linalg.inv(T_meas[e]))
    dr = np.stack(dr)

    def err(P):
        errs = []
        for k in range(n):
            errs.append(
                float(
                    se3.rotation_geodesic_deg(
                        jnp.asarray(P[k][:3, :3]), jnp.asarray(poses_true[k][:3, :3])
                    )
                )
            )
        return np.mean(errs)

    assert err(poses) < err(dr) + 1e-6
    assert err(poses) < 3.0


@pytest.mark.slow
def test_multiway_registration_synthetic():
    """4 jittered copies of a cloud align into a consistent frame."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.multiway.posegraph import register_multiway
    from tpu3dm.preprocess.pipeline import preprocess_points

    base = dental_arch_cloud(6000, seed=0)
    n = 4
    poses_true = [np.eye(4)] + [_rand_pose(20 + i, 0.15) for i in range(1, n)]
    cfg = PipelineConfig.with_voxel_size(0.3)
    clouds = []
    for k in range(n):
        # cloud k sees the base points expressed in its own frame:
        # x_k = P_k^{-1} x_world
        Pinv = np.linalg.inv(poses_true[k])
        pts = base @ Pinv[:3, :3].T + Pinv[:3, 3]
        clouds.append(preprocess_points(pts, cfg.preprocess))

    out = register_multiway(clouds, cfg, key=jax.random.PRNGKey(3))
    assert out.poses.shape == (n, 4, 4)
    assert (out.edge_fitness > 0.5).all()
    # World reconstruction consistency: P_k x_k should coincide across k.
    recon = [
        (base @ np.linalg.inv(poses_true[k])[:3, :3].T + np.linalg.inv(poses_true[k])[:3, 3])
        @ out.poses[k][:3, :3].T
        + out.poses[k][:3, 3]
        for k in range(n)
    ]
    for k in range(1, n):
        rmse = np.sqrt(((recon[k] - recon[0]) ** 2).sum(1).mean())
        assert rmse < 0.05, f"cloud {k} rmse {rmse}"


@pytest.mark.slow
def test_multiway_batched_matches_sequential():
    """Batched fan-out (one vmapped dispatch for all edges) aligns the same
    clouds to the same consistency as the sequential path."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.multiway.posegraph import register_multiway_batched
    from tpu3dm.preprocess.pipeline import preprocess_points

    base = dental_arch_cloud(6000, seed=0)
    n = 4
    poses_true = [np.eye(4)] + [_rand_pose(20 + i, 0.15) for i in range(1, n)]
    cfg = PipelineConfig.with_voxel_size(0.3)
    clouds = []
    for k in range(n):
        Pinv = np.linalg.inv(poses_true[k])
        pts = base @ Pinv[:3, :3].T + Pinv[:3, 3]
        clouds.append(preprocess_points(pts, cfg.preprocess))

    out = register_multiway_batched(clouds, cfg, key=jax.random.PRNGKey(3))
    assert out.poses.shape == (n, 4, 4)
    assert (out.edge_fitness > 0.3).all()
    recon = [
        (base @ np.linalg.inv(poses_true[k])[:3, :3].T + np.linalg.inv(poses_true[k])[:3, 3])
        @ out.poses[k][:3, :3].T
        + out.poses[k][:3, 3]
        for k in range(n)
    ]
    for k in range(1, n):
        rmse = np.sqrt(((recon[k] - recon[0]) ** 2).sum(1).mean())
        assert rmse < 0.05, f"cloud {k} rmse {rmse}"


def test_multiway_batched_checkpoint_resume(tmp_path):
    """A fully-checkpointed batched run resumes without recomputation."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.multiway.posegraph import register_multiway_batched
    from tpu3dm.preprocess.pipeline import preprocess_points

    base = dental_arch_cloud(4000, seed=1)
    cfg = PipelineConfig.with_voxel_size(0.3)
    poses_true = [np.eye(4), _rand_pose(31, 0.1), _rand_pose(32, 0.1)]
    clouds = []
    for k in range(3):
        Pinv = np.linalg.inv(poses_true[k])
        pts = base @ Pinv[:3, :3].T + Pinv[:3, 3]
        clouds.append(preprocess_points(pts, cfg.preprocess))

    ckpt = str(tmp_path / "ckpt")
    out1 = register_multiway_batched(clouds, cfg, key=jax.random.PRNGKey(0),
                                     checkpoint_dir=ckpt)
    out2 = register_multiway_batched(clouds, cfg, key=jax.random.PRNGKey(0),
                                     checkpoint_dir=ckpt)
    np.testing.assert_allclose(out1.poses, out2.poses, atol=1e-6)
    np.testing.assert_allclose(out1.edge_transforms, out2.edge_transforms, atol=1e-6)


@pytest.mark.slow
def test_pose_graph_robust_rejects_gross_outlier_edge():
    """One grossly wrong edge measurement (e.g. a surviving RANSAC alias):
    the Geman-McClure IRLS solve (Open3D line-process analog) recovers
    near-true poses while pure least squares is dragged off by the
    outlier."""
    n = 6
    poses_true = np.stack(
        [np.eye(4, dtype=np.float32)] + [_rand_pose(40 + i, 0.4) for i in range(1, n)]
    )
    edges = default_edges(n)  # chain + loop closure: outlier is redundant
    T_meas = _edge_measurements(poses_true, edges, noise=0.005, seed=2)
    # Corrupt edge 2 with a 60-degree alias rotation.
    bad = np.eye(4, dtype=np.float32)
    c, s = np.cos(np.pi / 3), np.sin(np.pi / 3)
    bad[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T_meas[2] = T_meas[2] @ bad

    def solve(robust_delta):
        return np.asarray(
            optimize_pose_graph(
                jnp.asarray(T_meas),
                jnp.asarray(np.asarray(edges, np.int32)),
                jnp.ones(len(edges)),
                n_nodes=n,
                iterations=25,
                robust_delta=robust_delta,
            )
        )

    def max_rot_err(poses):
        errs = []
        for k in range(n):
            M = poses[k][:3, :3] @ poses_true[k][:3, :3].T
            errs.append(np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1))))
        return max(errs)

    err_ls = max_rot_err(solve(None))
    err_gm = max_rot_err(solve(0.1))
    # LS spreads the 60-deg outlier across the loop (~30 deg max pose
    # error); the redescending loss suppresses it to the inlier noise floor.
    assert err_ls > 5.0, err_ls
    assert err_gm < 1.5, err_gm
    assert err_gm < err_ls / 5


@pytest.mark.slow
def test_pose_graph_edgewise_matches_dense():
    """The edgewise (sparse-assembly) solver must match the full-graph
    jacfwd solver — plain least squares AND the robust loss."""
    from tpu3dm.multiway.posegraph import optimize_pose_graph_edgewise

    n = 12
    poses_true = np.stack(
        [np.eye(4, dtype=np.float32)] + [_rand_pose(40 + i, 0.4) for i in range(1, n)]
    )
    edges = default_edges(n) + [(3, 9), (1, 7)]  # extra loop closures
    T_meas = _edge_measurements(poses_true, edges, noise=0.02, seed=5)
    e_arr = jnp.asarray(np.asarray(edges, np.int32))
    w_arr = jnp.asarray(np.linspace(0.5, 1.0, len(edges)).astype(np.float32))

    # Least squares is convex: both solvers must converge to the SAME
    # optimum (measured: 3e-4 max pose diff at 80 iterations; the gap
    # keeps shrinking with iterations, i.e. same optimum, different paths).
    dense = np.asarray(optimize_pose_graph(
        jnp.asarray(T_meas), e_arr, w_arr, n_nodes=n, iterations=80,
    ))
    edgewise = np.asarray(optimize_pose_graph_edgewise(
        jnp.asarray(T_meas), e_arr, w_arr, n_nodes=n, iterations=80,
    ))
    np.testing.assert_allclose(edgewise, dense, atol=1e-3)

    # The Geman-McClure IRLS objective is NON-convex; the two iteration
    # paths (LU full-graph vs Cholesky blockwise) may settle in nearby
    # local optima (measured: ~8e-3 pose diff).  Behavioral parity: both
    # must land within the same small neighbourhood and at the noise floor.
    dense_r = np.asarray(optimize_pose_graph(
        jnp.asarray(T_meas), e_arr, w_arr, n_nodes=n, iterations=30,
        robust_delta=0.1,
    ))
    edgewise_r = np.asarray(optimize_pose_graph_edgewise(
        jnp.asarray(T_meas), e_arr, w_arr, n_nodes=n, iterations=30,
        robust_delta=0.1,
    ))
    np.testing.assert_allclose(edgewise_r, dense_r, atol=3e-2)
    for poses in (dense_r, edgewise_r):
        for k in range(n):
            M = poses[k][:3, :3] @ poses_true[k][:3, :3].T
            rot = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
            assert rot < 3.0, rot


def test_pose_graph_edgewise_scales_past_dense_threshold():
    """N=128 (auto-selects edgewise): a noisy loop graph is solved to the
    noise floor — the config-5 scale the dense jacfwd path could not own."""
    from tpu3dm.multiway.posegraph import _solve_pose_graph

    n = 128
    poses_true = np.stack(
        [np.eye(4, dtype=np.float32)]
        + [_rand_pose(100 + i, 0.3) for i in range(1, n)]
    )
    edges = default_edges(n) + [(i, (i + n // 2) % n) for i in range(0, n, 16)]
    T_meas = _edge_measurements(poses_true, edges, noise=0.005, seed=9)
    poses = np.asarray(_solve_pose_graph(
        jnp.asarray(T_meas),
        jnp.asarray(np.asarray(edges, np.int32)),
        jnp.ones(len(edges)),
        n_nodes=n,
        iterations=25,
    ))

    def rot_err(Ta, Tb):
        M = Ta[:3, :3] @ Tb[:3, :3].T
        return np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))

    errs = [rot_err(poses[k], poses_true[k]) for k in range(n)]
    # Dead-reckoning baseline: compose the chain measurements only.
    # T_meas[k] (edge k -> k+1) satisfies P_{k+1} = P_k @ T_k^{-1}.
    dead = [np.eye(4, dtype=np.float32)]
    for k in range(n - 1):
        dead.append(dead[-1] @ np.linalg.inv(T_meas[k]))
    dead_errs = [rot_err(dead[k], poses_true[k]) for k in range(n)]
    # The solve must distribute the noise (loop closures every 16 nodes
    # bound the random walk) and beat dead-reckoning decisively.
    assert max(errs) < 2.0, (max(errs), max(dead_errs))
    assert max(errs) < max(dead_errs) / 2.0, (max(errs), max(dead_errs))


@pytest.mark.slow
def test_multiway_batched_mesh_fanout_matches_unsharded():
    """register_multiway_batched(mesh=...) — the multi-host pairwise
    fan-out — must reproduce the unsharded poses on the 8-device CPU mesh
    (BASELINE config 5's sharded half)."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.multiway.posegraph import register_multiway_batched
    from tpu3dm.parallel.mesh import make_mesh
    from tpu3dm.preprocess.pipeline import preprocess_points

    base = dental_arch_cloud(6000, seed=0)
    n = 8  # chain + loop = 8 edges -> one per mesh device
    poses_true = [np.eye(4)] + [_rand_pose(20 + i, 0.15) for i in range(1, n)]
    cfg = PipelineConfig.with_voxel_size(0.3)
    clouds = []
    for k in range(n):
        Pinv = np.linalg.inv(poses_true[k])
        pts = base @ Pinv[:3, :3].T + Pinv[:3, 3]
        clouds.append(preprocess_points(pts, cfg.preprocess))

    kw = dict(ransac_iterations=512, icp_iterations=6)
    plain = register_multiway_batched(clouds, cfg, key=jax.random.PRNGKey(3), **kw)
    mesh = make_mesh()  # all simulated devices on the pair axis
    sharded = register_multiway_batched(
        clouds, cfg, key=jax.random.PRNGKey(3), mesh=mesh, **kw
    )
    # Same keys, same program semantics: identical edges to fp noise.  The
    # REAL sharding invariant is edge-transform parity; the Gauss-Newton
    # pose solve amplifies the sharded dispatch's ~1e-5 edge differences
    # by ~2-3 orders (measured up to 3e-3 pose delta), so the pose check
    # is a sanity band, not a bitwise one.
    np.testing.assert_allclose(
        sharded.edge_transforms, plain.edge_transforms, atol=1e-5
    )
    np.testing.assert_allclose(sharded.poses, plain.poses, atol=1e-2)
    assert (sharded.edge_fitness > 0.3).all()
