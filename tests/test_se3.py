"""SE(3) utilities: algebraic identities and round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.core import se3


def rand_xi(key, scale=1.0):
    return jax.random.normal(key, (6,)) * scale


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exp_log_so3_roundtrip(seed):
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (3,)) * 0.8
    R = se3.exp_so3(w)
    # R is a rotation
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(R)) == pytest.approx(1.0, abs=1e-5)
    w2 = se3.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_log_so3_small_angle():
    R = se3.exp_so3(jnp.array([1e-6, -2e-6, 1e-6]))
    w = se3.log_so3(R)
    np.testing.assert_allclose(np.asarray(w), [1e-6, -2e-6, 1e-6], atol=1e-6)


def test_log_so3_near_pi():
    axis = jnp.array([1.0, 0.0, 0.0])
    w = axis * (jnp.pi - 1e-4)
    R = se3.exp_so3(w)
    w2 = se3.log_so3(R)
    np.testing.assert_allclose(np.abs(np.asarray(w2)), np.abs(np.asarray(w)), atol=1e-3)


@pytest.mark.parametrize("seed", [0, 3])
def test_exp_log_se3_roundtrip(seed):
    key = jax.random.PRNGKey(seed)
    xi = rand_xi(key, 0.7)
    T = se3.exp_se3(xi)
    xi2 = se3.log_se3(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_compose_inverse():
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    A = se3.exp_se3(rand_xi(k1))
    B = se3.exp_se3(rand_xi(k2))
    C = se3.compose(A, B)
    I = se3.compose(se3.inverse(A), se3.compose(C, se3.inverse(B)))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_apply_matches_matrix():
    key = jax.random.PRNGKey(9)
    T = se3.exp_se3(rand_xi(key))
    pts = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
    out = se3.apply(T, pts)
    hom = jnp.concatenate([pts, jnp.ones((50, 1))], axis=1)
    expect = (np.asarray(T) @ np.asarray(hom).T).T[:, :3]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_random_transform_magnitude():
    """Rotation <= 3*30deg composed, translation bounded; center preserved-ish
    (parity with _visualize_matcher.py:294-337 semantics)."""
    center = jnp.array([1.0, 2.0, 3.0])
    T = se3.random_transform(jax.random.PRNGKey(0), center)
    R = se3.rotation(T)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    # center maps to center + translation with |t| <= 0.1*sqrt(3)
    moved = se3.apply(T, center[None])[0]
    assert float(jnp.linalg.norm(moved - center)) <= 0.1 * np.sqrt(3) + 1e-5


def test_vmapped_exp():
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    xis = jax.vmap(rand_xi)(keys)
    Ts = jax.vmap(se3.exp_se3)(xis)
    assert Ts.shape == (16, 4, 4)
    dets = jnp.linalg.det(Ts[:, :3, :3])
    np.testing.assert_allclose(np.asarray(dets), np.ones(16), atol=1e-4)
