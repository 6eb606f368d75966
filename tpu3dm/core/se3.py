"""SE(3) rigid-transform utilities (pure JAX, branchless).

The reference manipulates 4x4 NumPy matrices ad hoc (Kabsch assembly at
src/matcher/ransac.py:153-188, random test transforms at
src/visualize_matcher/_visualize_matcher.py:294-337).  Here SE(3) is a small
functional library: everything jits, vmaps, and differentiates, and the
exp/log maps needed by ICP's 6-DoF update and the pose-graph solver are
closed-form with Taylor fallbacks near zero (no data-dependent branching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def identity() -> jax.Array:
    return jnp.eye(4, dtype=jnp.float32)


def make(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble a 4x4 transform from rotation ``[3,3]`` and translation ``[3]``."""
    T = jnp.zeros((4, 4), dtype=R.dtype).at[3, 3].set(1.0)
    return T.at[:3, :3].set(R).at[:3, 3].set(t)


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """Matrix product A @ B (apply B first, then A)."""
    return A @ B


def inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


def apply(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply 4x4 transform to ``[..., N, 3]`` points: ``p @ R^T + t``.

    Same transpose-saving formulation the reference's fast path uses
    (src/matcher/ransac.py:239-277).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...nj,...ij->...ni", points, R) + t[..., None, :]


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: ``[..., 3] -> [..., 3, 3]`` skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues formula with Taylor guard at theta -> 0. ``[...,3] -> [...,3,3]``."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # sin(x)/x and (1-cos(x))/x^2 with series fallback (branchless select).
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log_so3(R: jax.Array) -> jax.Array:
    """Inverse of exp_so3. ``[...,3,3] -> [...,3]``. Branchless, safe near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # axis * sin(theta) * 2 from the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # w = theta / (2 sin theta) * v ; near theta=0: 0.5 * v
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + _EPS))
    w_generic = scale[..., None] * v
    # Near theta = pi the antisymmetric part vanishes; recover the axis from
    # the symmetric part: R + I = 2 n n^T at theta = pi, so the largest column
    # of (R + I) is proportional to n.
    S = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    n_pi = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    w_pi = theta[..., None] * n_pi
    return jnp.where((jnp.pi - theta < 1e-3)[..., None], w_pi, w_generic)


def exp_se3(xi: jax.Array) -> jax.Array:
    """se(3) exponential: ``xi = [rho(3), w(3)] -> 4x4``.

    Used by ICP's per-iteration update (reference counterpart: Open3D's
    TransformationEstimationPointToPlane 6-DoF solve, src/matcher/icp.py:47).
    """
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / (theta2 + _EPS))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * (W @ W)
    V = eye + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    out = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def log_se3(T: jax.Array) -> jax.Array:
    """Inverse of exp_se3: ``4x4 -> [rho(3), w(3)]``."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - A / (2.0 * B + _EPS)) / (theta2 + _EPS))
    Vinv = eye - 0.5 * W + coef[..., None, None] * (W @ W)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, w], axis=-1)


def euler_zyx(angles: jax.Array) -> jax.Array:
    """R = Rz @ Ry @ Rx from ``[ax, ay, az]`` — the reference visualizer's
    random-transform convention (_visualize_matcher.py:305-315)."""
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)
    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cx, -sx], -1),
            jnp.stack([zero, sx, cx], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        -2,
    )
    Rz = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], -1),
            jnp.stack([sz, cz, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    return Rz @ Ry @ Rx


def random_transform(
    key: jax.Array,
    center: jax.Array,
    *,
    max_angle: float = jnp.pi / 6,
    max_translation: float = 0.1,
) -> jax.Array:
    """Random rigid perturbation about ``center``.

    Parity with the reference's "Random Transform" button
    (_visualize_matcher.py:294-337): per-axis uniform rotation in
    ``±max_angle`` composed ZYX, uniform translation in ``±max_translation``,
    rotation applied about the given center.
    """
    k1, k2 = jax.random.split(key)
    angles = jax.random.uniform(k1, (3,), minval=-max_angle, maxval=max_angle)
    trans = jax.random.uniform(k2, (3,), minval=-max_translation, maxval=max_translation)
    R = euler_zyx(angles)
    offset = -R @ center + center + trans
    return make(R, offset)


def rotation_geodesic_deg(Ra: jax.Array, Rb: jax.Array) -> jax.Array:
    """Angle (degrees) between two rotations — test/validation metric."""
    M = Ra @ jnp.swapaxes(Rb, -1, -2)
    trace = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_t))
