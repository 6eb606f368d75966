"""Sort-free compaction permutation (ops/compact.py) vs the argsort oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.ops.compact import compaction_permutation


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 7, 256, 1000])
def test_matches_stable_argsort(seed, n):
    rng = np.random.default_rng(seed)
    valid = jnp.asarray(rng.uniform(size=n) < 0.6)
    got = compaction_permutation(valid)
    want = jnp.argsort(~valid, stable=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_all_valid_and_all_invalid():
    for valid in (jnp.ones(16, bool), jnp.zeros(16, bool)):
        got = compaction_permutation(valid)
        np.testing.assert_array_equal(np.asarray(got), np.arange(16))


def test_is_permutation_under_jit():
    valid = jnp.asarray([True, False, True, True, False, False, True, False])
    got = np.asarray(jax.jit(compaction_permutation)(valid))
    assert sorted(got.tolist()) == list(range(8))
    # valid rows first, stable order
    np.testing.assert_array_equal(got[:4], [0, 2, 3, 6])
    np.testing.assert_array_equal(got[4:], [1, 4, 5, 7])
