"""Registration result container (pytree).

Mirrors Open3D's ``RegistrationResult`` (transformation / fitness /
inlier_rmse) consumed throughout the reference (ransac.py:129-192,
benchmark_ransac.py:199-200), plus the hypothesis/iteration count actually
spent — needed for early-stop accounting that the reference logs
(_visualize_matcher.py:432-450).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["transformation", "fitness", "inlier_rmse", "iterations"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class RegistrationResult:
    transformation: jax.Array  # [4,4]
    fitness: jax.Array  # scalar: inlier fraction
    inlier_rmse: jax.Array  # scalar: RMSE over inlier correspondences
    iterations: jax.Array  # scalar int: hypotheses or ICP iterations spent

    @staticmethod
    def identity() -> "RegistrationResult":
        return RegistrationResult(
            transformation=jnp.eye(4, dtype=jnp.float32),
            fitness=jnp.float32(0.0),
            inlier_rmse=jnp.float32(0.0),
            iterations=jnp.int32(0),
        )
