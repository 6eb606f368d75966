"""Block-sparse nearest-neighbor search for large (1M+) clouds.

Brute-force tiled NN (ops/nn.py) is exact but O(Nq*Nt): at 1M x 1M the
K=3 distance matmul runs the MXU at ~2% utilization and takes ~16 s/call on
v5e.  Real 3D clouds are surfaces — almost all target blocks are provably
irrelevant to a given query block.  This module exploits that with the TPU
block-sparse pattern (the same shape as block-sparse attention):

  1. Both clouds are spatially sorted (Morton order, host-side, once per
     cloud) so consecutive points are spatial neighbors and fixed-size blocks
     are compact balls.
  2. Per-block centroids/radii give a lower bound on the distance from every
     query block to every target block:  lb = max(0, |cq-ct| - rq - rt).
  3. Each query block visits only its W best-bounded target blocks.  The
     Pallas kernel streams exactly those blocks HBM->VMEM via a
     scalar-prefetched block-index table (PrefetchScalarGridSpec) — no
     gathered copy of the target is ever materialized.
  4. Exactness certificate: unvisited blocks all have lb >= the largest
     visited bound ``lb_max``, so any query whose found neighbor satisfies
     sqrt(d2) <= lb_max is *provably* exact.  For radius-bounded uses (ICP
     discards matches beyond dist_thresh — registration/icp.py) the result
     is exact whenever dist_thresh <= lb_max.

Replaces the role of Open3D's KDTree (reference: ply.py:111,119,134,
icp.py:42-48) for the large-cloud regime; SURVEY.md §5.7 / BASELINE config 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Padding sentinel: far enough that padded rows never win a min, small enough
# that squared distances stay comfortably inside float32.
SPARSE_PAD = 1.0e6


# ---------------------------------------------------------------------------
# Host-side spatial sort
# ---------------------------------------------------------------------------

def morton_perm(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting points along a 3D Morton (Z-order) curve.

    Host-side NumPy (device sorts are compile-time poison on the remote TPU
    stack — see ops/compact.py).  2^bits cells per axis.
    """
    pts = np.asarray(points, dtype=np.float64)
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-12)
    q = np.minimum(
        ((pts - lo) / span * (2**bits - 1)).astype(np.uint64), 2**bits - 1
    )

    def spread(x):
        # interleave bits: x -> x with two zero bits between each bit
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code, kind="stable")


def kd_perm(points: np.ndarray, block: int) -> np.ndarray:
    """Permutation grouping points into tight KD-partition leaves of exactly
    ``block`` points (recursive widest-axis median split, host-side).

    Much tighter blocks than a Morton sort: Z-order jumps give a few blocks
    whose bounding box spans the whole cloud, wrecking distance bounds; median
    splits give balanced, compact, non-overlapping boxes.  Requires
    len(points) to be a block multiple (pad_sorted pads afterwards, so call
    this on the raw cloud and append sentinels at the end).

    Dispatches to the threaded C++ partition (native/tpu3dm_native.cpp
    t3n_kd_perm, ~50x faster at 1M points) when the native tier is built;
    this NumPy recursion is the fallback and the parity oracle.
    """
    from tpu3dm import native as _native

    nat = _native.kd_perm(points, block)
    if nat is not None:
        return nat

    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    out: list[np.ndarray] = []

    def rec(idx: np.ndarray) -> None:
        if len(idx) <= block:
            out.append(idx)
            return
        p = pts[idx]
        ax = int(np.argmax(p.max(axis=0) - p.min(axis=0)))
        nb = len(idx) // block  # how many blocks this span will produce
        k = (nb // 2) * block if len(idx) % block == 0 else len(idx) // 2
        if k == 0:
            k = len(idx) // 2
        part = np.argpartition(p[:, ax], k)
        rec(idx[part[:k]])
        rec(idx[part[k:]])

    rec(np.arange(n))
    return np.concatenate(out)


def pad_sorted(points: np.ndarray, block: int) -> np.ndarray:
    """Pad a sorted cloud to a block multiple with far-away sentinel rows."""
    n = points.shape[0]
    pad = (-n) % block
    if pad == 0:
        return np.asarray(points, np.float32)
    return np.concatenate(
        [points, np.full((pad, 3), SPARSE_PAD, points.dtype)], axis=0
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Candidate selection (device, cheap)
# ---------------------------------------------------------------------------

def _block_bounds(points: jax.Array, block: int):
    """Per-block AABB (lo, hi [B,3]) and centroid [B,3], sentinel-aware."""
    nb = points.shape[0] // block
    pb = points.reshape(nb, block, 3)
    valid = pb[:, :, 0] < SPARSE_PAD * 0.5
    v3 = valid[:, :, None]
    lo = jnp.min(jnp.where(v3, pb, 3.0e38), axis=1)
    hi = jnp.max(jnp.where(v3, pb, -3.0e38), axis=1)
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)
    cen = jnp.sum(jnp.where(v3, pb, 0.0), axis=1) / cnt[:, None]
    return lo, hi, cen


def candidate_blocks(
    query: jax.Array, target: jax.Array, block: int, w: int
) -> tuple[jax.Array, jax.Array]:
    """(idx [nqb, w] int32, cert_lb [nqb] f32).

    idx: the W best target blocks per query block, ranked by box-to-box
    distance (ties among touching boxes broken by centroid distance).
    cert_lb: minimum box-to-box distance over the UNVISITED blocks — any
    query in block i whose found neighbor satisfies sqrt(d2) <= cert_lb[i]
    provably has its true NN among the visited blocks.  For radius-bounded
    uses (ICP discards matches beyond dist_thresh) the search is exact
    whenever dist_thresh <= cert_lb[i].
    """
    qlo, qhi, qc = _block_bounds(query, block)
    tlo, thi, tc = _block_bounds(target, block)
    # Box-to-box gap per dim: max(0, lo1-hi2, lo2-hi1); distance = |gap|.
    gap = jnp.maximum(
        jnp.maximum(qlo[:, None, :] - thi[None, :, :], tlo[None, :, :] - qhi[:, None, :]),
        0.0,
    )  # [nqb, ntb, 3]
    aabb = jnp.sqrt(jnp.sum(gap * gap, axis=-1))  # [nqb, ntb]
    cdist = jnp.sqrt(
        jnp.maximum(
            jnp.sum(qc * qc, 1)[:, None]
            + jnp.sum(tc * tc, 1)[None, :]
            - 2.0 * (qc @ tc.T),
            0.0,
        )
    )
    # Selection key: box distance dominates; centroid distance breaks the
    # many ties among touching/overlapping boxes by actual proximity.
    sel = aabb * 1024.0 + cdist

    # Iterative masked argmin: w rounds of (argmin, mask out).  Avoids
    # lax.top_k/sort, whose lowering is pathologically slow to compile on the
    # remote TPU stack (ops/compact.py).
    def pick(carry, _):
        sel_m, aabb_m = carry
        j = jnp.argmin(sel_m, axis=1)  # [nqb]
        rows = jnp.arange(sel_m.shape[0])
        sel_m = sel_m.at[rows, j].set(jnp.float32(3e38))
        aabb_m = aabb_m.at[rows, j].set(jnp.float32(3e38))
        return (sel_m, aabb_m), j.astype(jnp.int32)

    (_, aabb_left), idx = jax.lax.scan(pick, (sel, aabb), None, length=w)
    # Exact certificate: the tightest bound among blocks NOT visited.
    cert_lb = jnp.min(aabb_left, axis=1)
    return idx.T, cert_lb


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _sparse_nn_kernel(idx_ref, q_ref, t_ref, tsq_ref, d2_ref, i_ref, *, w, block):
    """Running-argmin over the W scalar-prefetch-selected target blocks.

    The distance tile is computed TRANSPOSED ([target, query]) so both the min
    and the first-occurrence argmin reduce over sublanes (axis 0) instead of
    lanes — measured 21% faster than the lane-reduction orientation at 1M
    points.  The prefetch table is flat 1-D: a [nqb, w] 2-D scalar operand
    pads its minor dim to 128 lanes in SMEM (nqb=4096 -> 2 MB > the 1 MB SMEM
    budget), while [nqb*w] stays compact, which is what makes small blocks
    compile at all.
    """
    jj = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        d2_ref[:, :] = jnp.full_like(d2_ref, 3.0e38)
        i_ref[:, :] = jnp.zeros_like(i_ref)

    i = pl.program_id(0)
    q = q_ref[:, :]  # [TQ, 3]
    t = t_ref[:, :]  # [TT, 3]
    cross = jax.lax.dot_general(
        t, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TT, TQ]
    d2 = tsq_ref[:, 0][:, None] - 2.0 * cross
    tile_min = jnp.min(d2, axis=0)  # [TQ] — sublane reduction
    row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=0)
    tile_arg = jnp.min(
        jnp.where(d2 <= tile_min[None, :], row, jnp.int32(2**30)), axis=0
    )
    tile_arg = tile_arg + idx_ref[i * w + jj] * block
    better = tile_min < d2_ref[0, :]
    d2_ref[0, :] = jnp.where(better, tile_min, d2_ref[0, :])
    i_ref[0, :] = jnp.where(better, tile_arg, i_ref[0, :])


@functools.partial(jax.jit, static_argnames=("block", "w", "interpret"))
def nn_search_blocksparse(
    query: jax.Array,
    target: jax.Array,
    *,
    block: int = 512,
    w: int = 8,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-1 NN visiting only W candidate target blocks per query block.

    Both clouds must be spatially sorted (kd_perm/morton_perm) and padded to a
    block multiple with SPARSE_PAD rows (pad_sorted).  Returns
    (d2 [Nq], idx [Nq] into the sorted target, cert_lb [nqb] certificate).
    """
    nq, d = query.shape
    nt = target.shape[0]
    assert nq % block == 0 and nt % block == 0, "pad_sorted first"
    nqb = nq // block
    w = min(w, nt // block)

    idx, lb_max = candidate_blocks(query, target, block, w)

    tsq = jnp.sum(target * target, axis=-1)
    # Sentinel rows keep their huge |t|^2, so they can never win the min.

    grid = (nqb, w)
    kern = functools.partial(_sparse_nn_kernel, w=w, block=block)
    d2, gi = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block, d), lambda i, jj, idx_ref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block, d), lambda i, jj, idx_ref: (idx_ref[i * w + jj], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block, 1), lambda i, jj, idx_ref: (idx_ref[i * w + jj], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, block), lambda i, jj, idx_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block), lambda i, jj, idx_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
        ],
        interpret=interpret,
    )(idx.reshape(-1), query, target, tsq.reshape(nt, 1))

    q_sq = jnp.sum(query * query, axis=-1)
    best_d2 = jnp.maximum(d2[0] + q_sq, 0.0)
    return best_d2, gi[0], lb_max


def nn_blocksparse(
    query: jax.Array,
    target: jax.Array,
    *,
    block: int = 512,
    w: int = 8,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Backend-dispatching block-sparse NN (Pallas on TPU, gathered XLA on CPU)."""
    if jax.default_backend() in ("cpu",):
        return nn_search_blocksparse_xla(query, target, block=block, w=w)
    return nn_search_blocksparse(query, target, block=block, w=w)


# ---------------------------------------------------------------------------
# Pure-XLA reference implementation (CPU tests / fallback)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block", "w"))
def nn_search_blocksparse_xla(
    query: jax.Array,
    target: jax.Array,
    *,
    block: int = 512,
    w: int = 8,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Same algorithm with a gathered [nqb, w*block, 3] candidate tensor."""
    nq, _ = query.shape
    nt = target.shape[0]
    assert nq % block == 0 and nt % block == 0
    nqb = nq // block
    w = min(w, nt // block)
    idx, lb_max = candidate_blocks(query, target, block, w)

    tb = target.reshape(nt // block, block, 3)
    cand = tb[idx]  # [nqb, w, block, 3]
    cand = cand.reshape(nqb, w * block, 3)
    qb = query.reshape(nqb, block, 3)
    d2 = (
        jnp.sum(cand * cand, -1)[:, None, :]
        - 2.0 * jnp.einsum("bqd,bcd->bqc", qb, cand)
        + jnp.sum(qb * qb, -1)[:, :, None]
    )  # [nqb, block, w*block]
    within = jnp.argmin(d2, axis=-1)  # [nqb, block]
    best = jnp.maximum(jnp.min(d2, axis=-1), 0.0)
    blk = within // block  # which candidate slot
    off = within % block
    gidx = idx[jnp.arange(nqb)[:, None], blk] * block + off
    return best.reshape(-1), gidx.reshape(-1).astype(jnp.int32), lb_max
