"""Multi-way registration: pairwise fan-out + pose-graph consistency solve.

No reference counterpart (the reference registers exactly one pair,
src/main.py:26-38); required by BASELINE.json config 5: "N clouds aligned
pairwise + pose-graph consistency, sharded across hosts".

Pipeline:
  1. Pairwise registration of an edge list (chain + loop-closure edges by
     default) using the standard RANSAC+ICP pair pipeline — embarrassingly
     parallel, fanned out across devices/hosts by the pair-DP machinery.
  2. Pose-graph optimization: absolute poses {P_i} (P_0 = I gauge) minimizing
     sum_e w_e || log_se3( T_e^-1 * P_je^-1 * P_ie ) ||^2 by Gauss-Newton on
     the SE(3) manifold.  The Jacobian comes from jax.jacfwd of the residual
     map over the per-node tangent updates — exact, no hand-derived Jacobian
     blocks — and the 6N x 6N normal equations are solved densely (N is
     hundreds of clouds at most; the heavy work is step 1).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dm.core import se3


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "iterations", "robust_delta")
)
def optimize_pose_graph(
    T_meas: jax.Array,
    edges: jax.Array,
    weights: jax.Array,
    *,
    n_nodes: int,
    iterations: int = 20,
    damping: float = 1e-6,
    robust_delta: float | None = None,
) -> jax.Array:
    """Absolute poses from relative measurements.

    Args:
      T_meas: [E, 4, 4] relative transforms; edge e with (i, j) satisfies
        x_j ~= T_e x_i for points expressed in the two cloud frames.
      edges: [E, 2] int32 (i, j) node indices.
      weights: [E] nonnegative edge weights (e.g. registration fitness).
      n_nodes: number of clouds N.
      iterations: Gauss-Newton iterations.
      robust_delta: None = pure least squares.  A float enables a
        Geman-McClure robust loss via IRLS — the redescending estimator
        behind Open3D GlobalOptimization's line-process weights (Choi et
        al.): each step reweights edge e by (d^2 / (d^2 + ||r_e||^2))^2, so
        a grossly wrong pairwise measurement (a RANSAC alias that survived
        verification, a bad loop closure) loses essentially ALL influence
        instead of dragging every pose (a Huber loss only caps the pull at
        delta — a 60-degree alias still bends the loop).  The first third
        of the iterations run unweighted (poses start at identity, where
        every residual is huge; immediate reweighting would zero the whole
        graph).  The value is the SE(3)-tangent residual norm
        (radians+meters mixed) separating inliers from outliers; ~0.1 suits
        registration-quality graphs (inlier residuals ~1e-2).

    Returns:
      [N, 4, 4] world-from-cloud poses with pose 0 = identity (gauge).
    """
    E = T_meas.shape[0]
    T_inv = se3.inverse(T_meas)
    ii = edges[:, 0]
    jj = edges[:, 1]
    sqrt_w = jnp.sqrt(jnp.maximum(weights, 0.0))

    def residuals(
        deltas: jax.Array, poses: jax.Array, row_w: jax.Array
    ) -> jax.Array:
        """[E*6] row-weighted stacked residuals at perturbed poses."""
        P = poses @ se3.exp_se3(deltas)  # [N,4,4] right-perturbation
        Pi = P[ii]
        Pj = P[jj]
        M = T_inv @ se3.inverse(Pj) @ Pi
        r = se3.log_se3(M)  # [E, 6]
        return (row_w[:, None] * r).reshape(-1)

    warmup = max(1, iterations // 3)

    def gn_step(poses, step):
        zeros = jnp.zeros((n_nodes, 6), jnp.float32)
        row_w = sqrt_w
        if robust_delta is not None:
            # IRLS: freeze the robust weights at the current residuals for
            # this step.  Geman-McClure weight = (rho'(r)/r) for
            # rho = d^2 r^2 / (d^2 + r^2), redescending to ~0 for gross
            # outliers; unweighted during warmup (see docstring).
            r_raw = residuals(zeros, poses, jnp.ones((E,), jnp.float32))
            rn2 = jnp.sum(r_raw.reshape(E, 6) ** 2, axis=1)
            d2_ = jnp.float32(robust_delta) ** 2
            gm = (d2_ / (d2_ + rn2)) ** 2
            gm = jnp.where(step < warmup, 1.0, gm)
            row_w = sqrt_w * jnp.sqrt(gm)
        r0 = residuals(zeros, poses, row_w)
        J = jax.jacfwd(lambda d: residuals(d, poses, row_w))(zeros)
        J = J.reshape(E * 6, n_nodes * 6)
        # Gauge fix: freeze node 0 by zeroing its columns and pinning its
        # diagonal block.
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones((n_nodes - 1) * 6)])
        J = J * mask[None, :]
        A = J.T @ J
        A = A + (damping * jnp.trace(A) / (6 * n_nodes) + 1e-10) * jnp.eye(6 * n_nodes)
        A = A + jnp.diag(1.0 - mask)  # pin frozen coords
        b = -J.T @ r0
        delta = jnp.linalg.solve(A, b).reshape(n_nodes, 6)
        delta = delta * mask.reshape(n_nodes, 6)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        poses = poses @ se3.exp_se3(delta)
        return poses, jnp.sum(r0 * r0)

    init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_nodes, 4, 4))
    poses, costs = jax.lax.scan(
        gn_step, init, jnp.arange(iterations, dtype=jnp.int32)
    )
    return poses


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "iterations", "robust_delta")
)
def optimize_pose_graph_edgewise(
    T_meas: jax.Array,
    edges: jax.Array,
    weights: jax.Array,
    *,
    n_nodes: int,
    iterations: int = 20,
    damping: float = 1e-6,
    robust_delta: float | None = None,
) -> jax.Array:
    """``optimize_pose_graph`` with edgewise Jacobians — the scalable solve.

    The full-graph ``jax.jacfwd`` above seeds all 6N tangent coordinates
    (O(N) forward passes through every edge): exact but it caps N at a few
    hundred clouds.  Here each edge's residual depends on only TWO poses, so
    one vmapped 12-seed jacfwd per edge gives the exact per-edge Jacobian
    blocks in O(E) work, and the 6Nx6N normal equations are scatter-
    assembled from the 6x6 blocks (the classic sparse Gauss-Newton
    assembly, expressed TPU-style as one segment scatter-add instead of a
    sparse matrix library).  The dense Cholesky solve remains — (6N)^3
    flops is ~2e11 at N=1024, well inside one chip's MXU budget; past a few
    thousand clouds swap the solve for CG on the same assembled blocks.

    Semantics (gauge, damping, warmup, Geman-McClure IRRLS) are identical to
    ``optimize_pose_graph``; tests pin parity on shared graphs.
    """
    E = T_meas.shape[0]
    T_inv = se3.inverse(T_meas)
    ii = edges[:, 0]
    jj = edges[:, 1]
    w = jnp.maximum(weights, 0.0)

    def edge_residual(d12: jax.Array, Pi, Pj, Tinv) -> jax.Array:
        """[6] residual of one edge at tangent perturbations (d_i, d_j)."""
        Pi_ = Pi @ se3.exp_se3(d12[:6])
        Pj_ = Pj @ se3.exp_se3(d12[6:])
        return se3.log_se3(Tinv @ se3.inverse(Pj_) @ Pi_)

    warmup = max(1, iterations // 3)
    dim = 6 * n_nodes
    mask = jnp.concatenate([jnp.zeros(6), jnp.ones(dim - 6)])

    def gn_step(poses, step):
        Pi = poses[ii]
        Pj = poses[jj]
        zeros12 = jnp.zeros((E, 12), jnp.float32)
        r0 = jax.vmap(edge_residual)(zeros12, Pi, Pj, T_inv)  # [E, 6]
        # Exact per-edge Jacobian: 12 forward seeds per edge, vmapped.
        Je = jax.vmap(jax.jacfwd(edge_residual))(zeros12, Pi, Pj, T_inv)
        we = w
        if robust_delta is not None:
            rn2 = jnp.sum(r0 * r0, axis=1)
            d2_ = jnp.float32(robust_delta) ** 2
            gm = (d2_ / (d2_ + rn2)) ** 2
            we = w * jnp.where(step < warmup, 1.0, gm)
        Ji = Je[:, :, :6] * we[:, None, None]  # weight folded once (W J)
        Jj = Je[:, :, 6:] * we[:, None, None]
        Jiu = Je[:, :, :6]
        Jju = Je[:, :, 6:]
        # Normal equations A = J^T W J, b = -J^T W r, assembled blockwise.
        Hii = jnp.einsum("ers,ert->est", Jiu, Ji)
        Hjj = jnp.einsum("ers,ert->est", Jju, Jj)
        Hij = jnp.einsum("ers,ert->est", Jiu, Jj)
        Hji = jnp.swapaxes(Hij, 1, 2)
        bi = -jnp.einsum("ers,er->es", Ji, r0)
        bj = -jnp.einsum("ers,er->es", Jj, r0)
        Ie = ii[:, None] * 6 + jnp.arange(6)[None, :]  # [E, 6]
        Jee = jj[:, None] * 6 + jnp.arange(6)[None, :]
        A = jnp.zeros((dim, dim), jnp.float32)
        A = A.at[Ie[:, :, None], Ie[:, None, :]].add(Hii)
        A = A.at[Jee[:, :, None], Jee[:, None, :]].add(Hjj)
        A = A.at[Ie[:, :, None], Jee[:, None, :]].add(Hij)
        A = A.at[Jee[:, :, None], Ie[:, None, :]].add(Hji)
        b = jnp.zeros((dim,), jnp.float32)
        b = b.at[Ie].add(bi)
        b = b.at[Jee].add(bj)
        # Gauge fix node 0 (zero its rows/cols, pin the diagonal) + damping.
        A = A * mask[None, :] * mask[:, None]
        A = A + (damping * jnp.trace(A) / dim + 1e-10) * jnp.eye(dim)
        A = A + jnp.diag(1.0 - mask)
        b = b * mask
        delta = jax.scipy.linalg.solve(A, b, assume_a="pos").reshape(n_nodes, 6)
        delta = delta * mask.reshape(n_nodes, 6)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        cost = jnp.sum(we * jnp.sum(r0 * r0, axis=1))
        return poses @ se3.exp_se3(delta), cost

    init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_nodes, 4, 4))
    poses, _ = jax.lax.scan(
        gn_step, init, jnp.arange(iterations, dtype=jnp.int32)
    )
    return poses


# Node count above which the pose-graph solve switches from the full-graph
# jacfwd (O(N) seeds) to the edgewise assembly (O(E) work).  64 keeps every
# existing artifact (<=64 clouds) on the validated dense path.
_EDGEWISE_THRESHOLD = 65


def _solve_pose_graph(T_meas, e_arr, w_arr, *, n_nodes, iterations,
                      robust_delta=None):
    fn = (
        optimize_pose_graph_edgewise
        if n_nodes >= _EDGEWISE_THRESHOLD
        else optimize_pose_graph
    )
    return fn(
        T_meas, e_arr, w_arr, n_nodes=n_nodes, iterations=iterations,
        robust_delta=robust_delta,
    )


@dataclasses.dataclass
class MultiwayResult:
    poses: np.ndarray  # [N, 4, 4] world-from-cloud
    edges: np.ndarray  # [E, 2]
    edge_transforms: np.ndarray  # [E, 4, 4]
    edge_fitness: np.ndarray  # [E]


def default_edges(n: int, loop_closure: bool = True) -> list[tuple[int, int]]:
    """Chain 0-1-2-...-(n-1) plus the closing edge (n-1, 0)."""
    edges = [(i, i + 1) for i in range(n - 1)]
    if loop_closure and n > 2:
        edges.append((n - 1, 0))
    return edges


def register_multiway(
    clouds,
    config=None,
    *,
    edges: list[tuple[int, int]] | None = None,
    key=None,
    pose_graph_iters: int = 20,
    checkpoint_dir: str | None = None,
    robust_delta: float | None = None,
) -> MultiwayResult:
    """Align N preprocessed clouds into one frame.

    Pairwise RANSAC+ICP along the edge list, then the pose-graph solve.
    ``clouds`` are ProcessedCloud objects (preprocess/pipeline.py).

    With ``checkpoint_dir`` the run is resumable: each completed edge is
    persisted (multiway/checkpoint.py) and skipped on re-run; final poses are
    saved to ``poses.npz``.
    """
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.registration.pipeline import register_pair

    n = len(clouds)
    if n < 2:
        raise ValueError("multiway registration needs >= 2 clouds")
    if edges is None:
        edges = default_edges(n)
    if config is None:
        config = PipelineConfig.with_voxel_size(clouds[0].voxel_size)
    if key is None:
        key = jax.random.PRNGKey(0)

    store = None
    if checkpoint_dir is not None:
        from tpu3dm.multiway.checkpoint import CheckpointStore, EdgeRecord

        store = CheckpointStore(checkpoint_dir)
        store.write_manifest(
            n_clouds=n,
            edges=[list(e) for e in edges],
            voxel_size=float(clouds[0].voxel_size),
        )

    T_list, fit_list = [], []
    for e, (i, j) in enumerate(edges):
        # PRNG key consumption is per-edge and unconditional so that a
        # resumed run reproduces the exact keys of an uninterrupted one.
        key, k = jax.random.split(key)
        if store is not None:
            rec = store.get_edge(i, j)
            if rec is not None:
                T_list.append(np.asarray(rec.transformation))
                fit_list.append(rec.fitness)
                continue
        out = register_pair(clouds[i], clouds[j], config, key=k)
        T_list.append(np.asarray(out.transformation))
        fit_list.append(float(out.icp.fitness))
        if store is not None:
            store.put_edge(
                i,
                j,
                EdgeRecord(
                    transformation=np.asarray(out.transformation),
                    fitness=float(out.icp.fitness),
                    inlier_rmse=float(out.icp.inlier_rmse),
                    iterations=int(out.icp.iterations),
                ),
            )

    return _solve_poses(n, edges, T_list, fit_list, pose_graph_iters, store,
                        robust_delta)


def register_multiway_batched(
    clouds,
    config=None,
    *,
    edges: list[tuple[int, int]] | None = None,
    key=None,
    pose_graph_iters: int = 20,
    ransac_iterations: int = 4096,
    icp_iterations: int = 12,
    icp_solves_per_nn: int = 2,
    approx_score: bool = True,
    rescue_restarts: int | None = None,
    mesh=None,
    checkpoint_dir: str | None = None,
    robust_delta: float | None = None,
) -> MultiwayResult:
    """Align N preprocessed clouds with ALL edges in one device dispatch.

    The multi-way fan-out (BASELINE config 5): clouds are stacked to a common
    capacity, the edge list becomes a leading pair axis, and one jitted
    vmap(fused_register_step) registers every edge — optionally sharded over
    the ``pair`` axis of a device mesh, which is the multi-host fan-out
    (parallel/multipair.py's pattern applied to the full RANSAC+ICP step).
    Sequential equivalent: register_multiway (one register_pair per edge,
    E host round-trips instead of one).

    Checkpointing (``checkpoint_dir``) is batch-granular here: completed runs
    are reused edge-by-edge on resume, but a fresh batch recomputes all edges
    in one dispatch.
    """
    from tpu3dm.core.config import PipelineConfig

    n = len(clouds)
    if n < 2:
        raise ValueError("multiway registration needs >= 2 clouds")
    if edges is None:
        edges = default_edges(n)
    if config is None:
        config = PipelineConfig.with_voxel_size(clouds[0].voxel_size)
    if key is None:
        key = jax.random.PRNGKey(0)

    store = None
    if checkpoint_dir is not None:
        from tpu3dm.multiway.checkpoint import CheckpointStore, EdgeRecord

        store = CheckpointStore(checkpoint_dir)
        store.write_manifest(
            n_clouds=n,
            edges=[list(e) for e in edges],
            voxel_size=float(clouds[0].voxel_size),
        )
        cached = {e: store.get_edge(*e) for e in edges}
        if all(cached[e] is not None for e in edges):
            T_list = [np.asarray(cached[e].transformation) for e in edges]
            fit_list = [cached[e].fitness for e in edges]
            return _solve_poses(
                n, edges, T_list, fit_list, pose_graph_iters, store,
                robust_delta,
            )

    # Stack the downsampled clouds to one common capacity.
    cap = max(c.down.capacity for c in clouds)

    def padto(a, width):
        pad = width - a.shape[0]
        if pad == 0:
            return np.asarray(a)
        return np.concatenate([np.asarray(a), np.zeros((pad,) + a.shape[1:], a.dtype)])

    pts = jnp.asarray(np.stack([padto(c.down.points, cap) for c in clouds]))
    feat = jnp.asarray(np.stack([padto(c.down.features, cap) for c in clouds]))
    nrm = jnp.asarray(np.stack([padto(c.down.normals, cap) for c in clouds]))
    msk = jnp.asarray(np.stack([padto(c.down.mask, cap) for c in clouds]))

    e_np = np.asarray(edges, np.int32)
    keys_np = np.asarray(jax.random.split(key, len(edges)))
    # Chunk the edge axis: one vmapped dispatch over ALL edges OOMs past
    # ~128 lanes at cap 1024 (measured round 4: 256 edges allocate a
    # 12.5 GB scoring temp on a 16 GB chip).  Chunks share one compiled
    # program (equal width), padded with repeats of edge 0 — which also
    # satisfies the mesh's pair-axis quantum; padded lanes sliced off.
    n_edges = len(edges)
    quantum = int(mesh.shape["pair"]) if mesh is not None else 1
    chunk_w = min(128, -(-n_edges // quantum) * quantum)
    chunk_w = -(-chunk_w // quantum) * quantum
    e_pad = -(-n_edges // chunk_w) * chunk_w
    if e_pad > n_edges:
        e_np = np.concatenate([e_np, np.repeat(e_np[:1], e_pad - n_edges, 0)])
        keys_np = np.concatenate(
            [keys_np, np.repeat(keys_np[:1], e_pad - n_edges, 0)]
        )
    si, ti = jnp.asarray(e_np[:, 0]), jnp.asarray(e_np[:, 1])
    keys = jnp.asarray(keys_np)

    if rescue_restarts is None:
        rescue_restarts = config.ransac.rescue_restarts
    run = _edges_runner(
        float(config.ransac.dist_thresh),
        float(config.icp.dist_thresh),
        int(ransac_iterations),
        min(int(ransac_iterations), 4096),
        int(icp_iterations),
        int(icp_solves_per_nn),
        bool(approx_score),
        bool(config.ransac.mutual_filter),
        int(rescue_restarts),
    )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu3dm.parallel.mesh import PAIR_AXIS

        shard = NamedSharding(mesh, P(PAIR_AXIS))
        si = jax.device_put(si, shard)
        ti = jax.device_put(ti, shard)
        keys = jax.device_put(keys, shard)

    T_parts, fit_parts, rmse_parts = [], [], []
    for lo in range(0, e_pad, chunk_w):
        sl = slice(lo, lo + chunk_w)
        Ts, fit, rmse = run(pts, feat, msk, nrm, si[sl], ti[sl], keys[sl])
        T_parts.append(np.asarray(Ts))
        fit_parts.append(np.asarray(fit))
        rmse_parts.append(np.asarray(rmse))
    T_np = np.concatenate(T_parts)[:n_edges]
    fit_np = np.concatenate(fit_parts)[:n_edges]
    rmse = np.concatenate(rmse_parts)[:n_edges]
    T_list = [T_np[e] for e in range(len(edges))]
    fit_list = [float(fit_np[e]) for e in range(len(edges))]

    if store is not None:
        from tpu3dm.multiway.checkpoint import EdgeRecord

        rmse_np = np.asarray(rmse)
        for e, (i, j) in enumerate(edges):
            store.put_edge(
                i, j,
                EdgeRecord(
                    transformation=T_list[e],
                    fitness=fit_list[e],
                    inlier_rmse=float(rmse_np[e]),
                    iterations=ransac_iterations,
                ),
            )

    return _solve_poses(n, edges, T_list, fit_list, pose_graph_iters, store,
                        robust_delta)


@functools.lru_cache(maxsize=None)
def _edges_runner(
    dist_thresh: float,
    icp_thresh: float,
    ransac_iterations: int,
    ransac_batch: int,
    icp_iterations: int,
    icp_solves_per_nn: int,
    approx_score: bool,
    mutual_filter: bool,
    rescue_restarts: int = 0,
):
    """Jitted all-edges registration step, cached by its static parameters.

    A fresh jax.jit closure per call would recompile the whole fused step on
    every register_multiway_batched invocation (measured: 4.8 s/call instead
    of ~40 ms warm); the lru_cache keeps one compiled program per config.
    """
    from tpu3dm.registration.fused import fused_register_step

    step = functools.partial(
        fused_register_step,
        dist_thresh=dist_thresh,
        icp_thresh=icp_thresh,
        ransac_iterations=ransac_iterations,
        ransac_batch=ransac_batch,
        icp_iterations=icp_iterations,
        icp_solves_per_nn=icp_solves_per_nn,
        approx_score=approx_score,
        mutual_filter=mutual_filter,
        rescue_restarts=rescue_restarts,
    )

    @jax.jit
    def run(pts, feat, msk, nrm, si, ti, keys):
        def one(i, j, k):
            return step(
                pts[i], feat[i], msk[i], nrm[i],
                pts[j], feat[j], msk[j], nrm[j], k,
            )

        return jax.vmap(one)(si, ti, keys)

    return run


def _solve_poses(n, edges, T_list, fit_list, pose_graph_iters, store,
                 robust_delta=None):
    T_meas = jnp.asarray(np.stack(T_list), jnp.float32)
    e_arr = jnp.asarray(np.asarray(edges, np.int32))
    w_arr = jnp.asarray(np.asarray(fit_list, np.float32))
    poses = _solve_pose_graph(
        T_meas, e_arr, w_arr, n_nodes=n, iterations=pose_graph_iters,
        robust_delta=robust_delta,
    )
    poses_np = np.asarray(poses)
    if store is not None:
        store.write_poses(poses_np)
    return MultiwayResult(
        poses=poses_np,
        edges=np.asarray(edges),
        edge_transforms=np.stack(T_list),
        edge_fitness=np.asarray(fit_list),
    )
