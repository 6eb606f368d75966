"""Sharded large-cloud ICP — spatial parallelism for clouds one chip can't hold.

The reference refines with Open3D's KDTree-backed ``registration_icp`` on the
full-resolution clouds (reference: src/matcher/icp.py:42-48); at pod scale the
TPU-native equivalent shards BOTH clouds over the ``block`` mesh axis and runs
the whole refinement loop under one ``shard_map``:

  per ICP iteration:
    1. each device transforms its resident SOURCE shard by the replicated T;
    2. ring correspondence search (the ring-attention analog, SURVEY.md §5.7):
       target shards rotate around the ring with ``ppermute`` while each device
       folds a running (min-d2, target point, target normal) for its source
       shard — values are folded during the rotation, so no global gather of
       correspondences is ever needed;
    3. each device assembles its local 6x6 point-to-plane (or 3N x 6
       point-to-point) normal equations; one ``psum`` over the block axis
       yields the global J^T J / J^T r;
    4. every device solves the replicated 6x6 system and applies the same
       SE(3) update — T stays replicated by construction.

Collectives per iteration: (nb - 1) ppermutes of one target shard (+ normals
+ mask) and one psum of [6,6]+[6]+3 scalars — all ICI traffic; the O(N^2)
distance work stays resident.  Convergence uses the same relative
fitness/RMSE criteria as registration/icp.py.

Exactness: the folded (d2, q, n) is bitwise the same correspondence the
single-device dense NN would pick (ties broken on the smaller global target
index, matching parallel/ring_nn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu3dm.core import se3
from tpu3dm.ops.nn import nn_search
from tpu3dm.ops.nn_sparse import SPARSE_PAD, kd_perm, nn_blocksparse
from tpu3dm.parallel.mesh import BLOCK_AXIS
from tpu3dm.registration.result import RegistrationResult

_BIG = 1.0e30


def _pad_shards(arr: np.ndarray, nb: int, fill: float = 0.0) -> np.ndarray:
    """Pad axis 0 to a multiple of nb (host-side, once per cloud)."""
    n = arr.shape[0]
    pad = (-n) % nb
    if pad == 0:
        return np.ascontiguousarray(arr)
    filler = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, filler], axis=0)


def _prep_blocksparse_shards(
    points: np.ndarray,
    normals: np.ndarray | None,
    nb: int,
    block: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Two-level spatial partition for the block-sparse ring (host, once).

    Outer level: KD-partition the cloud into nb spatially-COMPACT shards
    (compact shards -> tight per-block AABBs -> good candidate bounds when a
    whole shard visits another device).  Inner level: KD-sort each shard at
    ``block`` granularity (nn_blocksparse's contract) and pad every shard to
    one common block-multiple length with SPARSE_PAD sentinel rows.

    Returns (points [nb*pad_len, 3], mask [nb*pad_len], normals or None).
    """
    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    shard_size = -(-n // nb)
    outer = kd_perm(pts, shard_size)
    pts_o = pts[outer]
    nrm_o = np.asarray(normals, np.float32)[outer] if normals is not None else None
    pad_len = ((shard_size + block - 1) // block) * block
    out_p = np.full((nb * pad_len, 3), SPARSE_PAD, np.float32)
    out_m = np.zeros((nb * pad_len,), bool)
    out_n = np.zeros((nb * pad_len, 3), np.float32) if normals is not None else None
    for s in range(nb):
        lo, hi = s * shard_size, min((s + 1) * shard_size, n)
        sh = pts_o[lo:hi]
        if sh.shape[0] == 0:
            continue
        inner = kd_perm(sh, block)
        dst = s * pad_len
        out_p[dst : dst + sh.shape[0]] = sh[inner]
        out_m[dst : dst + sh.shape[0]] = True
        if out_n is not None:
            out_n[dst : dst + sh.shape[0]] = nrm_o[lo:hi][inner]
    return out_p, out_m, out_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "max_iterations", "point_to_plane",
        "block_sparse", "block", "w",
    ),
)
def _icp_sharded_jit(
    src_pts: jax.Array,
    src_mask: jax.Array,
    tgt_pts: jax.Array,
    tgt_normals: jax.Array,
    tgt_mask: jax.Array,
    init_T: jax.Array,
    dist_thresh: jax.Array,
    relative_fitness: jax.Array,
    relative_rmse: jax.Array,
    *,
    mesh: Mesh,
    max_iterations: int,
    point_to_plane: bool,
    block_sparse: bool = False,
    block: int = 512,
    w: int = 8,
) -> RegistrationResult:
    nb = mesh.shape[BLOCK_AXIS]
    shard_nt = tgt_pts.shape[0] // nb
    thresh_sq = dist_thresh * dist_thresh

    def kernel(src, smask, tgt, tnrm, tmask, T0):
        ns_local = src.shape[0]
        perm = [(i, (i + 1) % nb) for i in range(nb)]
        my = jax.lax.axis_index(BLOCK_AXIS)
        n_src = jax.lax.psum(jnp.sum(smask.astype(jnp.float32)), BLOCK_AXIS)
        denom = jnp.maximum(n_src, 1.0)

        def ring_correspond(T):
            """Fold (best_d2, q, n) for the local source shard over the ring."""
            pts = se3.apply(T, src)
            # Masked source rows keep their pad coordinates (T would move
            # them): zeros on the dense path (masks exclude them from m/J),
            # SPARSE_PAD spatial sentinels on the block-sparse path.
            pts = jnp.where(smask[:, None], pts, src)

            def step(i, carry):
                bd2, bq, bn, bidx, t_blk, n_blk, m_blk, src_dev = carry
                if block_sparse:
                    # KD-blocked candidate search within the visiting shard:
                    # O(shard * w * block) instead of O(shard^2) per step.
                    # Sentinel rows (SPARSE_PAD) never win; masked results
                    # are filtered by the d2 < thresh^2 test downstream.
                    d2, idx, _ = nn_blocksparse(pts, t_blk, block=block, w=w)
                else:
                    d2, idx = nn_search(pts, t_blk, None, m_blk)
                gidx = idx + src_dev * shard_nt
                better = (d2 < bd2) | ((d2 == bd2) & (gidx < bidx))
                bd2 = jnp.where(better, d2, bd2)
                bq = jnp.where(better[:, None], t_blk[idx], bq)
                bn = jnp.where(better[:, None], n_blk[idx], bn)
                bidx = jnp.where(better, gidx, bidx)
                t_blk = jax.lax.ppermute(t_blk, BLOCK_AXIS, perm)
                n_blk = jax.lax.ppermute(n_blk, BLOCK_AXIS, perm)
                m_blk = jax.lax.ppermute(m_blk, BLOCK_AXIS, perm)
                src_dev = jax.lax.ppermute(src_dev, BLOCK_AXIS, perm)
                return bd2, bq, bn, bidx, t_blk, n_blk, m_blk, src_dev

            varying = lambda x: jax.lax.pcast(x, (BLOCK_AXIS,), to="varying")
            init = (
                varying(jnp.full((ns_local,), _BIG, jnp.float32)),
                varying(jnp.zeros((ns_local, 3), jnp.float32)),
                varying(jnp.zeros((ns_local, 3), jnp.float32)),
                varying(jnp.full((ns_local,), jnp.iinfo(jnp.int32).max, jnp.int32)),
                tgt,
                tnrm,
                tmask,
                my,
            )
            bd2, bq, bn, *_ = jax.lax.fori_loop(0, nb, step, init)
            m = (bd2 < thresh_sq) & smask
            # Global fitness / inlier RMSE (Open3D RegistrationResult
            # semantics) via psum of local sums.
            inl = jax.lax.psum(jnp.sum(m.astype(jnp.float32)), BLOCK_AXIS)
            err = jax.lax.psum(jnp.sum(jnp.where(m, bd2, 0.0)), BLOCK_AXIS)
            fitness = inl / denom
            rmse = jnp.sqrt(err / jnp.maximum(inl, 1.0))
            return pts, bq, bn, m, fitness, rmse

        def solve_step(T):
            pts, q, nrm, m, fitness, rmse = ring_correspond(T)
            # "wgt", not "w": the kernel closes over the static block-sparse
            # candidate width ``w`` — shadowing it here would be a trap.
            wgt = m.astype(jnp.float32)
            if point_to_plane:
                r = jnp.sum((pts - q) * nrm, axis=1)
                J = jnp.concatenate([nrm, jnp.cross(pts, nrm)], axis=1)
            else:
                r3 = pts - q
                eye = jnp.broadcast_to(jnp.eye(3), (pts.shape[0], 3, 3))
                Jw = -se3.hat(pts)
                J = jnp.concatenate([eye, Jw], axis=2).reshape(-1, 6)
                r = r3.reshape(-1)
                wgt = jnp.repeat(wgt, 3)
            # wgt is binary (wgt^2 == wgt), so masking J/r directly both
            # weights the normal equations AND zeroes the pad source rows
            # BEFORE products that could overflow and poison the psum.
            J = J * wgt[:, None]
            r = r * wgt
            A_local = jnp.einsum("ni,nj->ij", J, J)
            b_local = -jnp.einsum("ni,n->i", J, r)
            A = jax.lax.psum(A_local, BLOCK_AXIS)
            b = jax.lax.psum(b_local, BLOCK_AXIS)
            A = A + 1e-6 * jnp.trace(A) / 6.0 * jnp.eye(6) + 1e-12 * jnp.eye(6)
            xi = jnp.linalg.solve(A, b)
            xi = jnp.where(jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))
            return se3.exp_se3(xi) @ T, fitness, rmse

        def cond(state):
            it, _, f_cur, r_cur, converged = state
            return (it < max_iterations) & ~converged

        def body(state):
            it, T, f_cur, r_cur, _ = state
            T_new, f_new, r_new = solve_step(T)
            # Absolute deltas: Open3D's ICPConvergenceCriteria compares
            # absolute fitness/RMSE changes despite its "relative_*" field
            # names (matching registration/icp.py).
            converged = (
                (jnp.abs(f_new - f_cur) < relative_fitness)
                & (jnp.abs(r_new - r_cur) < relative_rmse)
                & (it > 0)
            )
            return it + 1, T_new, f_new, r_new, converged

        init = (
            jnp.int32(0),
            jnp.asarray(T0, jnp.float32),
            jnp.float32(-1.0),
            jnp.float32(-1.0),
            jnp.bool_(False),
        )
        it, T, _, _, _ = jax.lax.while_loop(cond, body, init)
        _, _, _, _, fitness, rmse = ring_correspond(T)
        return T, fitness, rmse, it

    spec_pts = P(BLOCK_AXIS, None)
    spec_vec = P(BLOCK_AXIS)
    rep = P()
    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec_pts, spec_vec, spec_pts, spec_pts, spec_vec, rep),
        out_specs=(rep, rep, rep, rep),
    )
    T, fitness, rmse, it = fn(
        src_pts, src_mask, tgt_pts, tgt_normals, tgt_mask, init_T
    )
    return RegistrationResult(
        transformation=T, fitness=fitness, inlier_rmse=rmse, iterations=it
    )


def icp_refine_sharded(
    mesh: Mesh,
    src_pts,
    tgt_pts,
    init_T,
    *,
    tgt_normals=None,
    dist_thresh: float,
    max_iterations: int = 30,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    point_to_plane: bool | None = None,
    block_sparse: bool = False,
    block: int = 512,
    w: int = 8,
) -> RegistrationResult:
    """ICP refinement with both clouds sharded over the mesh's block axis.

    Host-facing wrapper: pads each cloud to a multiple of the block-axis size
    (validity masks track true counts), places shards, and runs the fully
    fused on-device loop.  Semantics (metrics, convergence, thresholds) match
    the single-device ``registration.icp.icp_refine`` / ``icp_refine_large``;
    the reference counterpart is ``registration_icp`` on full-resolution
    clouds (src/matcher/icp.py:42-48) at scales one chip cannot hold.

    ``block_sparse=True`` replaces the dense per-ring-step NN with the
    KD-blocked candidate kernel (ops/nn_sparse.py): both clouds get a
    two-level spatial partition (compact shards, KD-sorted blocks within
    each), cutting each ring step from O(shard^2) to O(shard * w * block)
    distance work.  Like the single-chip block-sparse ICP it is
    candidate-bounded rather than certified-exact per step; the d2 < thresh
    correspondence test discards any non-exact long match.

    Args:
      mesh: mesh containing a ``block`` axis (other axes are untouched).
      src_pts / tgt_pts: [N, 3] arrays (NumPy or JAX).
      tgt_normals: [Nt, 3]; required for point-to-plane (default when given).
    """
    if point_to_plane is None:
        point_to_plane = tgt_normals is not None
    if point_to_plane and tgt_normals is None:
        raise ValueError("point_to_plane ICP needs target normals")
    nb = mesh.shape[BLOCK_AXIS]
    src_np = np.asarray(src_pts, np.float32)
    tgt_np = np.asarray(tgt_pts, np.float32)
    ns, nt = src_np.shape[0], tgt_np.shape[0]
    if block_sparse:
        src_p, smask, _ = _prep_blocksparse_shards(src_np, None, nb, block)
        tgt_p, tmask, nrm_p = _prep_blocksparse_shards(
            tgt_np, tgt_normals, nb, block
        )
        if nrm_p is None:
            nrm_p = np.zeros_like(tgt_p)
    else:
        # Zero-fill pads, NOT huge sentinels: a 1e30 coordinate makes the
        # -2*q.t cross term comparable to nn_search's BIG masking bias, so
        # pad rows could win the argmin with a clamped d2=0 (confirmed NaN
        # on positive-octant clouds).  Masks exclude pads on both sides.
        src_p = _pad_shards(src_np, nb, fill=0.0)
        tgt_p = _pad_shards(tgt_np, nb, fill=0.0)
        smask = np.arange(src_p.shape[0]) < ns
        tmask = np.arange(tgt_p.shape[0]) < nt
        if tgt_normals is not None:
            nrm_p = _pad_shards(np.asarray(tgt_normals, np.float32), nb)
        else:
            nrm_p = np.zeros_like(tgt_p)
    return _icp_sharded_jit(
        jnp.asarray(src_p),
        jnp.asarray(smask),
        jnp.asarray(tgt_p),
        jnp.asarray(nrm_p),
        jnp.asarray(tmask),
        jnp.asarray(init_T, jnp.float32),
        jnp.float32(dist_thresh),
        jnp.float32(relative_fitness),
        jnp.float32(relative_rmse),
        mesh=mesh,
        max_iterations=max_iterations,
        point_to_plane=point_to_plane,
        block_sparse=block_sparse,
        block=block,
        w=w,
    )
