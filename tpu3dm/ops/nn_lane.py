"""Lane-fused NN kernels — a measured NEGATIVE result, kept as opt-in.

Hypothesis (round-3b dissection, docs/STATUS.md): at the fused step's
shapes ([B=2048, M=1024] x [N=1024] per lane) the dense NN stage runs ~3.5x
its MXU-tile speed-of-light, presumed HBM-bound on a materialized [B, M, N]
distance matrix; a lane-per-grid-step Pallas kernel that keeps distance
tiles in VMEM should recover it.

Measured outcome (2026-08-20, v5e, full fused step A/B at B=2048 cap 1024,
identical quality gates): the lane kernels are SLOWER — distinct regime
377.4 ms vs 237.6 dense (1.6x), and even routing only the d3 ICP search
through the lane kernel costs 373.2 ms.  Conclusion: XLA does NOT pay the
naive materialization cost here — it fuses the argmin/min reductions into
the batched matmul loop — while 2048 single-lane grid steps pay per-step
pipeline overheads the model ignored.  The dense formulation stays the
production default (registration/fused.py ``nn_impl="dense"``); these
kernels remain available (``nn_impl="lane"`` / ``"lane_icp"``) for other
toolchains/shapes, with exactness guaranteed by the interpret-mode parity
tests.  This mirrors the earlier finding for the query-tiled kernels under
vmap (docs/ROOFLINE.md "regime scoping").

Design (what was built): ONE grid step per batch lane.  The whole [M, d]
query block and [N, d] target block sit in VMEM; the kernel loops target
sub-blocks as unrolled VMEM slices, keeping the running (min, argmin) in
registers — the [M, N] distance matrix never exists anywhere.  ``jax.vmap``
batches the single-lane ``pallas_call`` by adding a batch grid dimension,
which is exactly the lane-per-step schedule.

Two kernels:
  - ``nn_search_lane``: top-1 NN, VPU-direct expansion for d < 8 (3-D ICP
    correspondences; the MXU would run at 3/128 tile efficiency), MXU
    matmul for d >= 8.
  - ``nn_mutual_mask_lane``: forward argmin + column-min mutuality test
    (ops/nn.py nn_mutual_mask semantics) in the SAME pass — the per-block
    column minima are exact globals because every query row is resident,
    and the "column min at my argmin" is tracked per row with a one-hot
    min instead of a minor-axis gather.

Both fall back to the dense XLA path off-TPU, and are exact (fp32 forms
bit-match the dense oracle; tests/test_ops.py).

Reference role: the Open3D KDTree searches these accelerate are the ICP
correspondence search (src/matcher/icp.py:42) and the FPFH feature matching
with mutual filter (src/matcher/ransac.py:47,85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3dm.core.cloud import round_up as _round_up
from tpu3dm.ops.nn import BIG, SMALL_D_MAX, nn_mutual_mask, nn_search_dense


def _pad_rows(a, n, fill=0.0):
    pad = n - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# Kernels (single lane; vmap adds the batch grid dimension)
# ---------------------------------------------------------------------------


def _lane_nn_smalld_kernel(q_ref, tT_ref, bias_ref, d2_ref, idx_ref, *, tb):
    """Top-1 NN, VPU expansion (d < 8).  ``tT_ref`` is [d, N] transposed so
    each dimension's row broadcasts along lanes; ``bias_ref`` is 0 valid /
    BIG masked+padded, making the accumulator the TRUE squared distance."""
    m, d = q_ref.shape[0], q_ref.shape[1]
    n = tT_ref.shape[1]
    best_d2 = jnp.full((m,), BIG, jnp.float32)
    best_idx = jnp.zeros((m,), jnp.int32)
    for j in range(n // tb):
        sl = slice(j * tb, (j + 1) * tb)
        acc = bias_ref[0:1, sl]  # [1, tb] broadcasts over rows
        for k in range(d):  # static unroll (d = 3 for points)
            diff = q_ref[:, k : k + 1] - tT_ref[k : k + 1, sl]
            acc = acc + diff * diff
        tile_min = jnp.min(acc, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, dimension=1)
        tile_arg = jnp.min(
            jnp.where(acc <= tile_min[:, None], col, jnp.int32(2**30)), axis=1
        )
        better = tile_min < best_d2
        best_d2 = jnp.where(better, tile_min, best_d2)
        best_idx = jnp.where(better, tile_arg + j * tb, best_idx)
    d2_ref[0, :] = best_d2
    idx_ref[0, :] = best_idx


def _lane_nn_mxu_kernel(q_ref, tT_ref, bsq_ref, d2_ref, idx_ref, *, tb, approx):
    """Top-1 NN, MXU cross term (d >= 8).  Accumulator is |t|^2 - 2 q.t;
    the per-row |q|^2 cannot change the argmin and is re-added outside.
    ``tT_ref`` is [d, N] pre-transposed: Mosaic's matmul wants the standard
    (row x column) contraction — the transposed-rhs form fails to compile
    ("Bad lhs type")."""
    m = q_ref.shape[0]
    n = tT_ref.shape[1]
    q = q_ref[:, :]
    if approx:
        q = q.astype(jnp.bfloat16)
    best_d2 = jnp.full((m,), BIG, jnp.float32)
    best_idx = jnp.zeros((m,), jnp.int32)
    for j in range(n // tb):
        tblk = tT_ref[:, j * tb : (j + 1) * tb]
        if approx:
            tblk = tblk.astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            q, tblk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [m, tb]
        acc = bsq_ref[0:1, j * tb : (j + 1) * tb] - 2.0 * cross
        tile_min = jnp.min(acc, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, dimension=1)
        tile_arg = jnp.min(
            jnp.where(acc <= tile_min[:, None], col, jnp.int32(2**30)), axis=1
        )
        better = tile_min < best_d2
        best_d2 = jnp.where(better, tile_min, best_d2)
        best_idx = jnp.where(better, tile_arg + j * tb, best_idx)
    d2_ref[0, :] = best_d2
    idx_ref[0, :] = best_idx


def _lane_mutual_kernel(
    a_ref, bT_ref, asq_ref, bsq_ref, d2_ref, idx_ref, colb_ref, *, tb, approx
):
    """Forward argmin + per-row column-min-at-argmin in one pass.

    The accumulator is the full |a|^2 + |b|^2 - 2ab matrix tile (both masked
    squared norms included — the column minimum ranges over rows, so the row
    constant matters there, unlike the pure-NN kernels).  Because every
    query row is resident, a block's column minima are exact GLOBAL column
    minima for its columns; when a row's best switches into this block, the
    matching column minimum is captured through a one-hot min (a dynamic
    gather along the minor axis would lower ~300x slower on TPU).

    ``bT_ref`` is [d, N] pre-transposed (standard-contraction Mosaic form).
    Always fp32: the deployed Mosaic toolchain rejects bf16 matmul operands
    outright ("Bad lhs type", measured 2026-08-20 on v5e — both transposed
    and standard contractions, 33-wide and 128-padded), so the dense path's
    bf16 trick is not available in-kernel."""
    del approx  # fp32 only; see docstring
    m = a_ref.shape[0]
    n = bT_ref.shape[1]
    a = a_ref[:, :]
    asq = asq_ref[0, :]  # [m], BIG at masked rows
    best_d2 = jnp.full((m,), BIG, jnp.float32)
    best_idx = jnp.zeros((m,), jnp.int32)
    best_col = jnp.full((m,), BIG, jnp.float32)
    for j in range(n // tb):
        bblk = bT_ref[:, j * tb : (j + 1) * tb]
        cross = jax.lax.dot_general(
            a, bblk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [m, tb]
        acc = asq[:, None] + bsq_ref[0:1, j * tb : (j + 1) * tb] - 2.0 * cross
        tile_min = jnp.min(acc, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, dimension=1)
        tile_arg = jnp.min(
            jnp.where(acc <= tile_min[:, None], col, jnp.int32(2**30)), axis=1
        )
        tile_colmin = jnp.min(acc, axis=0)  # exact global colmin of block j
        col_at_arg = jnp.min(
            jnp.where(col == tile_arg[:, None], tile_colmin[None, :], BIG),
            axis=1,
        )
        better = tile_min < best_d2
        best_d2 = jnp.where(better, tile_min, best_d2)
        best_idx = jnp.where(better, tile_arg + j * tb, best_idx)
        best_col = jnp.where(better, col_at_arg, best_col)
    d2_ref[0, :] = best_d2
    idx_ref[0, :] = best_idx
    colb_ref[0, :] = best_col


# ---------------------------------------------------------------------------
# Wrappers (vmap-compatible: all shapes static, batching adds the grid dim)
# ---------------------------------------------------------------------------

# Target sub-block width: [M, tb] fp32 accumulator tiles of 1 MB at M=1024
# keep the whole working set a few MB of VMEM.
_LANE_TB = 256


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_search_lane(
    query: jax.Array,
    target: jax.Array,
    query_mask: jax.Array | None = None,
    target_mask: jax.Array | None = None,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-1 NN with the lane-fused kernel (nn_search contract).

    TPU only (callers dispatch; off-TPU use ops.nn.nn_search).  Designed to
    be called under ``jax.vmap`` over a pair-lane batch axis.
    """
    nq, d = query.shape
    nt = target.shape[0]
    tb = min(_LANE_TB, _round_up(nt, 128))
    nq_p = _round_up(nq, 8)
    nt_p = _round_up(nt, tb)
    query_p = _pad_rows(query, nq_p)

    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, nq_p), jnp.float32),
        jax.ShapeDtypeStruct((1, nq_p), jnp.int32),
    ]

    if d < SMALL_D_MAX:
        bias = jnp.zeros((nt,), jnp.float32)
        if target_mask is not None:
            bias = jnp.where(target_mask, bias, BIG)
        bias_p = _pad_rows(bias, nt_p, fill=BIG)
        tT = _pad_rows(target, nt_p).T  # [d, nt_p]
        d2, idx = pl.pallas_call(
            functools.partial(_lane_nn_smalld_kernel, tb=tb),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(query_p, tT, bias_p.reshape(1, nt_p))
        return jnp.maximum(d2[0, :nq], 0.0), idx[0, :nq]

    tgt_T = _pad_rows(target, nt_p).T  # [d, nt_p]
    tsq = jnp.sum(target * target, axis=-1)
    if target_mask is not None:
        tsq = jnp.where(target_mask, tsq, BIG)
    tsq_p = _pad_rows(tsq, nt_p, fill=BIG)
    d2, idx = pl.pallas_call(
        functools.partial(_lane_nn_mxu_kernel, tb=tb, approx=False),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(query_p, tgt_T, tsq_p.reshape(1, nt_p))
    q_sq = jnp.sum(query * query, axis=-1)
    return jnp.maximum(d2[0, :nq] + q_sq, 0.0), idx[0, :nq]


@functools.partial(jax.jit, static_argnames=("approx", "interpret"))
def nn_mutual_mask_lane(
    a: jax.Array,
    b: jax.Array,
    mask_a: jax.Array | None = None,
    mask_b: jax.Array | None = None,
    *,
    approx: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Forward NN + mutuality mask with the lane-fused kernel.

    Same contract and tie semantics as ops.nn.nn_mutual_mask (on exact ties
    every tying row passes).  ``approx`` is ACCEPTED FOR API PARITY ONLY and
    executes in exact fp32: the deployed Mosaic rejects bf16 matmul operands
    in Pallas kernels (kernel docstring) — results equal the dense EXACT
    path, not the dense bf16 path.
    """
    na, d = a.shape
    nb = b.shape[0]
    tb = min(_LANE_TB, _round_up(nb, 128))
    na_p = _round_up(na, 8)
    nb_p = _round_up(nb, tb)

    asq = jnp.sum(a * a, axis=-1)
    if mask_a is not None:
        asq = jnp.where(mask_a, asq, BIG)
    bsq = jnp.sum(b * b, axis=-1)
    if mask_b is not None:
        bsq = jnp.where(mask_b, bsq, BIG)

    a_p = _pad_rows(a, na_p)
    bT_p = _pad_rows(b, nb_p).T  # [d, nb_p]
    asq_p = _pad_rows(asq, na_p, fill=BIG)
    bsq_p = _pad_rows(bsq, nb_p, fill=BIG)
    # ``approx`` is accepted for API parity with nn_mutual_mask but executes
    # in fp32: Mosaic rejects bf16 matmul operands on this toolchain (kernel
    # docstring).  fp32 is strictly more accurate; the knob still selects
    # bf16 on the dense path.

    d2, idx, colb = pl.pallas_call(
        functools.partial(_lane_mutual_kernel, tb=tb, approx=approx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((1, na_p), jnp.float32),
            jax.ShapeDtypeStruct((1, na_p), jnp.int32),
            jax.ShapeDtypeStruct((1, na_p), jnp.float32),
        ],
        interpret=interpret,
    )(a_p, bT_p, asq_p.reshape(1, na_p), bsq_p.reshape(1, nb_p))

    mutual = d2[0, :na] <= colb[0, :na]
    if mask_a is not None:
        mutual = mutual & mask_a
    return idx[0, :na], mutual


# ---------------------------------------------------------------------------
# Backend dispatchers used by the fused register step
# ---------------------------------------------------------------------------


def nn_search_hot(query, target, query_mask=None, target_mask=None):
    """Opt-in lane-kernel route (``nn_impl="lane"/"lane_icp"``): lane kernel
    on TPU, dense XLA elsewhere.  NOT the default — measured slower than
    dense at registration shapes (module docstring)."""
    if jax.default_backend() == "tpu":
        return nn_search_lane(query, target, query_mask, target_mask)
    return nn_search_dense(query, target, query_mask, target_mask)


def nn_mutual_mask_hot(a, b, mask_a=None, mask_b=None, *, approx=False):
    """Opt-in lane-kernel route for the feature stage (see nn_search_hot)."""
    if jax.default_backend() == "tpu":
        return nn_mutual_mask_lane(a, b, mask_a, mask_b, approx=approx)
    return nn_mutual_mask(a, b, mask_a, mask_b, approx=approx)
