"""Ring nearest-neighbour search — spatial parallelism for 1M+ point clouds.

The long-context axis of this workload is point count N, and the N^2 object is
the pairwise-distance matrix (SURVEY.md §5.7).  This is the ring-attention
analog: shard target points over the ``block`` mesh axis, and rotate each
device's resident target shard around the ring with ``ppermute`` while a
running (min-distance, global-argmin) is folded per resident query shard.
Exact (not approximate), memory O(shard^2), and the rotation overlaps compute
on ICI.

Built on the same tiled NN kernel as the single-chip path (ops/nn.py); the
collective layer is shard_map + lax.ppermute — no NCCL/MPI analog needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpu3dm.ops.nn import nn_search
from tpu3dm.parallel.mesh import BLOCK_AXIS


def _local_nn(query, target, tmask):
    return nn_search(query, target, None, tmask)


def ring_nn_search(
    mesh: Mesh,
    query: jax.Array,
    target: jax.Array,
    query_mask: jax.Array,
    target_mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-1 NN with query AND target sharded over the block axis.

    Args:
      mesh: mesh containing a ``block`` axis of size B.
      query: [Nq, 3or D] — sharded along axis 0 into B shards.
      target: [Nt, D] — sharded along axis 0 into B shards (Nt % B == 0).
      query_mask / target_mask: matching validity masks.

    Returns:
      (d2 [Nq], idx [Nq]) with idx global into target — bitwise identical to
      the single-device nn_search on the gathered arrays.
    """
    nb = mesh.shape[BLOCK_AXIS]
    shard_nt = target.shape[0] // nb

    def kernel(q, t, qm, tm):
        # q: [nq_local, D], t: [shard_nt, D] resident shard.
        my = jax.lax.axis_index(BLOCK_AXIS)
        perm = [(i, (i + 1) % nb) for i in range(nb)]

        def step(i, carry):
            best_d2, best_idx, t_blk, tm_blk, src_dev = carry
            d2, idx = _local_nn(q, t_blk, tm_blk)
            idx_g = idx + src_dev * shard_nt
            # Tie-break on the smaller global index so the result is identical
            # to the single-device kernel regardless of ring visit order.
            better = (d2 < best_d2) | ((d2 == best_d2) & (idx_g < best_idx))
            best_d2 = jnp.where(better, d2, best_d2)
            best_idx = jnp.where(better, idx_g, best_idx)
            t_blk = jax.lax.ppermute(t_blk, BLOCK_AXIS, perm)
            tm_blk = jax.lax.ppermute(tm_blk, BLOCK_AXIS, perm)
            src_dev = jax.lax.ppermute(src_dev, BLOCK_AXIS, perm)
            return best_d2, best_idx, t_blk, tm_blk, src_dev

        # pcast: the running best starts as a replicated constant but the loop
        # writes device-varying values into it — mark it varying up front.
        init = (
            jax.lax.pcast(jnp.full((q.shape[0],), 1e30, jnp.float32), (BLOCK_AXIS,), to="varying"),
            jax.lax.pcast(jnp.zeros((q.shape[0],), jnp.int32), (BLOCK_AXIS,), to="varying"),
            t,
            tm,
            my,
        )
        best_d2, best_idx, *_ = jax.lax.fori_loop(0, nb, step, init)
        return best_d2, best_idx

    spec_pts = P(BLOCK_AXIS, None)
    spec_vec = P(BLOCK_AXIS)
    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_vec, spec_vec),
        out_specs=(spec_vec, spec_vec),
    )
    return fn(query, target, query_mask, target_mask)


def ring_nn_jit(mesh: Mesh):
    """Jitted ring NN bound to a mesh (convenience for benchmarks)."""
    return jax.jit(functools.partial(ring_nn_search, mesh))
