"""Batched rigid-transform fitting (Kabsch / Horn), branchless.

The reference fits one hypothesis at a time with NumPy SVD + try/except +
NaN-guard fallback to identity (src/matcher/ransac.py:104-192).  On TPU the
fit runs for thousands of hypotheses per dispatch, so it must be exception-free
and vmappable:

  - ``fit_rigid_horn``: Horn's quaternion method — the optimal rotation is the
    dominant eigenvector of a 4x4 symmetric matrix built from the cross
    covariance, solved exactly with batched ``jnp.linalg.eigh`` (cheap on TPU
    at 4x4: ~0.2 ms for 4096 fits measured on v5e).  Quaternions *never*
    produce a reflection, which replaces the reference's det(R)<0 fix
    (ransac.py:173-176).
  - ``fit_rigid_svd``: jnp.linalg.svd Kabsch with the same det fix — the
    parity oracle (slower on TPU; used in tests and small batches).

Degenerate inputs (collinear/coplanar/duplicate samples — the reference's
crash-test suite, test_ransac_crash.py:27-79) still yield a valid rotation
(the eigenvector exists; ties pick an arbitrary optimum); non-finite results
fall back to identity via jnp.where (reference semantics: ransac.py:184-192,
fallback result with fitness 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dm.ops.sym4 import dominant_eigvec_sym4



def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
            ),
        ],
        -2,
    )


def fit_rigid_horn(p: jax.Array, q: jax.Array, w: jax.Array | None = None) -> jax.Array:
    """Least-squares rigid transform T with q ~ R p + t.

    Args:
      p: [..., M, 3] source sample points.
      q: [..., M, 3] target sample points.
      w: optional [..., M] nonnegative weights.

    Returns:
      [..., 4, 4] transform.  Branchless; identity fallback on non-finite.
    """
    if w is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    cp = jnp.einsum("...m,...mi->...i", wn, p)
    cq = jnp.einsum("...m,...mi->...i", wn, q)
    pc = p - cp[..., None, :]
    qc = q - cq[..., None, :]
    # Cross covariance S_ab = sum_m w_m p_a q_b
    S = jnp.einsum("...m,...ma,...mb->...ab", wn, pc, qc)
    sxx, sxy, sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    syx, syy, syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    szx, szy, szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    # Horn's 4x4 N matrix; dominant eigenvector = optimal quaternion.
    N = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1),
        ],
        -2,
    )
    # Dominant eigenvector of N = optimal quaternion.  N is traceless
    # symmetric, so the analytic Newton-on-quartic + adjugate solver applies
    # (ops/sym4.py) — pure VPU arithmetic.  jnp.linalg.eigh was measured at
    # ~4 us/matrix on v5e (264 ms for a 64k-hypothesis dispatch, dominating
    # the pipeline); power/Rayleigh iteration stalls on the near-degenerate
    # spectra 3-point problems produce.
    v = dominant_eigvec_sym4(N)
    R = quat_to_rot(v)
    t = cq - jnp.einsum("...ab,...b->...a", R, cp)

    T = jnp.zeros(p.shape[:-2] + (4, 4), p.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    # Identity fallback on any non-finite entry (reference: ransac.py:184-192).
    finite = jnp.all(jnp.isfinite(T), axis=(-2, -1), keepdims=True)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=p.dtype), T.shape)
    return jnp.where(finite, T, eye)


def fit_rigid_svd(p: jax.Array, q: jax.Array) -> jax.Array:
    """Kabsch via SVD with reflection fix — parity oracle for fit_rigid_horn
    (the reference's exact algorithm, ransac.py:150-183)."""
    cp = jnp.mean(p, axis=-2)
    cq = jnp.mean(q, axis=-2)
    pc = p - cp[..., None, :]
    qc = q - cq[..., None, :]
    H = jnp.einsum("...ma,...mb->...ab", pc, qc)
    U, _, Vt = jnp.linalg.svd(H, full_matrices=False)
    R = jnp.einsum("...ba,...cb->...ac", Vt, U)  # V U^T
    det = jnp.linalg.det(R)
    # Reflection fix: flip the last row of Vt where det < 0.
    flip = jnp.where(det < 0, -1.0, 1.0)
    Vt_fixed = Vt.at[..., 2, :].multiply(flip[..., None])
    R = jnp.einsum("...ba,...cb->...ac", Vt_fixed, U)
    t = cq - jnp.einsum("...ab,...b->...a", R, cp)
    T = jnp.zeros(p.shape[:-2] + (4, 4), p.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    finite = jnp.all(jnp.isfinite(T), axis=(-2, -1), keepdims=True)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=p.dtype), T.shape)
    return jnp.where(finite, T, eye)
