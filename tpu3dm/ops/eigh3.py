"""Closed-form symmetric 3x3 eigen-solver (batched, branchless).

Normal estimation needs the smallest eigenvector of a 3x3 covariance per point
(the reference gets this from Open3D's C++ `estimate_normals`, ply.py:110-112).
A general eigensolver (`jnp.linalg.eigh`) is iterative and scalar-bound on
TPU; for 3x3 symmetric matrices the spectrum has an exact trigonometric
solution (Smith 1961) that vmaps into pure VPU arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigvals_sym3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric ``[..., 3, 3]`` matrices, ascending ``[..., 3]``."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    # det(B)/2 with B = (A - qI) / p
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # Diagonal matrices (p1 ~ 0): eigenvalues are the sorted diagonal.
    diag = jnp.stack([a00, a11, a22], axis=-1)
    diag_sorted = jnp.sort(diag, axis=-1)
    analytic = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    is_diag = (p1 <= _EPS)[..., None]
    return jnp.where(is_diag, diag_sorted, analytic)


def smallest_eigvec_sym3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Smallest eigenpair of symmetric ``[..., 3, 3]`` matrices.

    Returns (eigenvalue ``[...]``, unit eigenvector ``[..., 3]``).  Branchless:
    the eigenvector is the largest-norm cross product of rows of
    ``A - lambda_min I`` (rows span the orthogonal complement), with a fixed
    fallback axis for fully degenerate (isotropic) inputs.
    """
    evals = eigvals_sym3(A)
    lam = evals[..., 0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    M = A - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # [..., 3, 3]
    norms = jnp.sum(cands * cands, axis=-1)  # [..., 3]
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    vnorm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    # Degenerate (isotropic covariance): arbitrary but fixed direction.
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape
    )
    ok = vnorm > 1e-10
    v = jnp.where(ok, v / jnp.where(ok, vnorm, 1.0), fallback)
    return lam, v
