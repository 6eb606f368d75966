"""Standalone registration evaluation — Open3D ``evaluate_registration`` parity.

The reference consumes fitness/inlier_rmse off the results its RANSAC/ICP
calls return (benchmark_ransac.py:199-200); Open3D users also call
``o3d.pipelines.registration.evaluate_registration(src, tgt, max_dist, T)``
directly to grade an arbitrary transform.  This module provides that API,
plus the 6x6 information matrix Open3D's multiway pipeline attaches to
pose-graph edges (``get_information_matrix_from_point_clouds``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dm.core import se3
from tpu3dm.core.cloud import PointCloud
from tpu3dm.ops.nn import nn_search
from tpu3dm.registration.result import RegistrationResult


@jax.jit
def evaluate_registration(
    src: PointCloud,
    tgt: PointCloud,
    max_distance: jax.Array | float,
    transformation: jax.Array | None = None,
) -> RegistrationResult:
    """Grade ``transformation`` on a pair (Open3D evaluate_registration).

    fitness = inlier correspondences / valid source points;
    inlier_rmse = RMSE of inlier correspondence distances.  ``iterations``
    is 0 (no optimization happened).
    """
    T = jnp.eye(4) if transformation is None else jnp.asarray(transformation)
    thresh_sq = jnp.asarray(max_distance, jnp.float32) ** 2
    pts = se3.apply(T, src.points)
    d2, _ = nn_search(pts, tgt.points, src.mask, tgt.mask)
    m = (d2 < thresh_sq) & src.mask
    n_src = jnp.maximum(jnp.sum(src.mask.astype(jnp.int32)), 1)
    fitness = jnp.sum(m.astype(jnp.float32)) / n_src.astype(jnp.float32)
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(m, d2, 0.0)) / jnp.maximum(jnp.sum(m), 1)
    )
    return RegistrationResult(
        transformation=jnp.asarray(T, jnp.float32),
        fitness=fitness,
        inlier_rmse=rmse,
        iterations=jnp.int32(0),
    )


@functools.partial(jax.jit, static_argnames=())
def information_matrix(
    src: PointCloud,
    tgt: PointCloud,
    max_distance: jax.Array | float,
    transformation: jax.Array,
) -> jax.Array:
    """6x6 pose-graph edge information matrix (Open3D
    ``get_information_matrix_from_point_clouds`` semantics).

    Sum over inlier correspondences of G^T G where G = [I | -[q]_x] is the
    derivative of the correspondence residual w.r.t. the SE(3) tangent at
    the TARGET point q (Open3D evaluates G at the target-frame point).  The
    matrix's trace scales with inlier count and its anisotropy encodes which
    pose directions the overlap actually constrains — a flat overlap region
    constrains translation along its normal far more than sliding motions.
    Used to weight pose-graph edges beyond the scalar fitness.
    """
    T = jnp.asarray(transformation, jnp.float32)
    thresh_sq = jnp.asarray(max_distance, jnp.float32) ** 2
    pts = se3.apply(T, src.points)
    d2, idx = nn_search(pts, tgt.points, src.mask, tgt.mask)
    m = (d2 < thresh_sq) & src.mask
    w = m.astype(jnp.float32)
    q = tgt.points[idx]  # [N, 3] matched target points
    # G rows per correspondence: d(residual)/d(xi) = [I_3 | -[q]_x].
    eye = jnp.broadcast_to(jnp.eye(3), (q.shape[0], 3, 3))
    G = jnp.concatenate([eye, -se3.hat(q)], axis=2)  # [N, 3, 6]
    Gw = G * w[:, None, None]
    return jnp.einsum("nij,nik->jk", Gw, G)
