"""Sort-free stable compaction.

``jnp.argsort``/``jnp.sort`` compile pathologically slowly on the TPU remote
compiler (measured: 7-37 s at N=20k, and any compile over ~10 s degrades the
session dispatch path), while scatters compile in under a second.  Compaction
— move valid rows to the front, stable — doesn't need a sort: destination
slots follow directly from prefix sums, and the permutation is materialized
with one scatter.
"""

from __future__ import annotations

import jax.numpy as jnp


def compaction_permutation(valid):
    """Permutation ``perm`` such that ``a[perm]`` puts valid rows first.

    Stable within both groups — identical to ``jnp.argsort(~valid)`` (stable
    argsort of the inverted mask) but built from cumsum + one scatter.
    """
    m = valid.shape[0]
    vi = valid.astype(jnp.int32)
    n_valid = jnp.sum(vi)
    rank_valid = jnp.cumsum(vi) - 1  # slot among valid rows
    rank_invalid = n_valid + jnp.cumsum(1 - vi) - 1  # after the valid block
    dest = jnp.where(valid, rank_valid, rank_invalid)  # bijective
    return (
        jnp.zeros((m,), jnp.int32).at[dest].set(jnp.arange(m, dtype=jnp.int32))
    )
