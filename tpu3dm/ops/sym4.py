"""Dominant eigenpair of symmetric traceless 4x4 matrices — analytic, batched.

Purpose-built for Horn's quaternion rigid fit (registration/kabsch.py): the
optimal rotation is the dominant eigenvector of a traceless symmetric 4x4
matrix, needed for ~10^5 matrices per RANSAC dispatch.  ``jnp.linalg.eigh`` is
iterative and costs ~4 us/matrix on TPU (measured: 264 ms for 64k fits —
dominating the whole pipeline); this closed-ish form is pure vectorized VPU
arithmetic:

  1. lambda_max: Newton iteration on the characteristic quartic
     f(x) = x^4 + p x^2 + q x + r  (traceless => no cubic term), started from
     the Frobenius upper bound.  All roots are real (symmetric matrix), so
     Newton from above the largest root converges monotonically — no
     branching, fixed iteration count.
  2. eigenvector: for A = N - lambda I (rank 3), adj(A) = c * v v^T, so every
     nonzero column of the adjugate is the eigenvector; take the column with
     the largest diagonal cofactor (|v_i|^2-weighted) for stability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEWTON_ITERS = 24


def _char_poly_coeffs(N: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(p, q, r) of x^4 + p x^2 + q x + r for traceless symmetric N."""
    N2 = N @ N
    tr2 = jnp.trace(N2, axis1=-2, axis2=-1)
    tr3 = jnp.trace(N2 @ N, axis1=-2, axis2=-1)
    p = -0.5 * tr2
    q = -tr3 / 3.0
    r = _det4(N)
    return p, q, r


def _det3(M: jax.Array) -> jax.Array:
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def _det4(A: jax.Array) -> jax.Array:
    """Explicit cofactor expansion (cheaper to compile/run than LU det)."""
    rows = (1, 2, 3)
    idx = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    total = None
    for j in range(4):
        M = A[..., rows, :][..., :, idx[j]]
        term = ((-1.0) ** j) * A[..., 0, j] * _det3(M)
        total = term if total is None else total + term
    return total


def dominant_eigvec_sym4(N: jax.Array) -> jax.Array:
    """Unit eigenvector for the largest eigenvalue of ``[..., 4, 4]``
    symmetric traceless matrices."""
    p, q, r = _char_poly_coeffs(N)
    # Upper bound: lambda_max^2 <= tr(N^2) = -2p.
    lam = jnp.sqrt(jnp.maximum(-2.0 * p, 0.0)) + 1e-6

    def newton(lam, _):
        lam2 = lam * lam
        f = ((lam2 + p) * lam + q) * lam + r
        fp = (4.0 * lam2 + 2.0 * p) * lam + q
        step = f / jnp.where(jnp.abs(fp) > 1e-20, fp, 1e-20)
        # Monotone from above: never step past zero correction direction.
        return lam - step, None

    lam, _ = jax.lax.scan(newton, lam, None, length=_NEWTON_ITERS)

    A = N - lam[..., None, None] * jnp.broadcast_to(
        jnp.eye(4, dtype=N.dtype), N.shape
    )

    # Adjugate columns: adj(A)[i, j] = (-1)^(i+j) * minor(A, j, i).
    idx = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]

    def minor(j, i):
        rows = idx[j]
        cols = idx[i]
        M = A[..., rows, :][..., :, cols]
        return _det3(M)

    # adj columns stacked: col_j[i] = adj[i, j]
    cols = []
    for j in range(4):
        col = jnp.stack(
            [((-1.0) ** (i + j)) * minor(j, i) for i in range(4)], axis=-1
        )
        cols.append(col)
    adj_cols = jnp.stack(cols, axis=-1)  # [..., i, j]

    # Column choice: diagonal of adj is c * v_i^2 >= 0 (up to sign of c);
    # largest magnitude picks the best-conditioned column.
    diag = jnp.stack([adj_cols[..., k, k] for k in range(4)], axis=-1)
    best = jnp.argmax(jnp.abs(diag), axis=-1)
    v = jnp.take_along_axis(adj_cols, best[..., None, None], axis=-1)[..., 0]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = norm > 1e-20
    v = jnp.where(ok, v / jnp.where(ok, norm, 1.0), jnp.array([1.0, 0, 0, 0], N.dtype))
    return v
