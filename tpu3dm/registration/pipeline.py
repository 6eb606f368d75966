"""End-to-end pair registration (reference: src/main.py:24-39).

load/preprocess two clouds -> batched RANSAC on FPFH correspondences
(coarse) -> point-to-plane ICP on full resolution (fine).  Unlike the
reference's main (which drops voxel_size on the floor — the stale-call-site
bug at src/main.py:34,38), configuration threads one PipelineConfig through
every stage.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.preprocess.pipeline import ProcessedCloud, load_cloud, preprocess_points
from tpu3dm.registration.icp import refine_registration
from tpu3dm.registration.ransac import global_registration
from tpu3dm.registration.result import RegistrationResult
from tpu3dm.utils.logging import setup_logging
from tpu3dm.utils.profiler import profile_block

logger = setup_logging(__name__)


@dataclasses.dataclass
class PairRegistration:
    """Full pipeline output for one cloud pair."""

    ransac: RegistrationResult
    icp: RegistrationResult
    source: ProcessedCloud
    target: ProcessedCloud

    @property
    def transformation(self) -> jax.Array:
        return self.icp.transformation


def register_pair(
    src: ProcessedCloud,
    tgt: ProcessedCloud,
    config: PipelineConfig | None = None,
    *,
    key: jax.Array | None = None,
    restarts: int = 1,
) -> PairRegistration:
    """RANSAC + ICP registration of two preprocessed clouds.

    ``restarts`` > 1 enables ICP-verified multi-restart RANSAC
    (registration/large.py coarse_pose_with_verification): near-symmetric
    geometry produces RANSAC aliases whose inlier count TIES the true pose
    (measured on the synthetic arch at 6k points: a 60-degree alias at
    fitness 0.335 vs the true pose at 0.330) — a few verification ICP
    iterations discriminate where the inlier metric cannot.  Default 1
    preserves reference semantics (ransac.py:20-59 has no rescue).
    """
    if config is None:
        config = PipelineConfig.with_voxel_size(src.voxel_size)
    if key is None:
        key = jax.random.PRNGKey(0)

    with profile_block("ransac"):
        if restarts > 1:
            from tpu3dm.registration.large import coarse_pose_with_verification

            coarse = coarse_pose_with_verification(
                src.down, tgt.down, config, key, restarts=restarts
            )
        else:
            coarse = global_registration(src.down, tgt.down, config.ransac, key)
        jax.block_until_ready(coarse.transformation)
    logger.info(
        "RANSAC: fitness=%.4f rmse=%.4f iters=%d",
        float(coarse.fitness),
        float(coarse.inlier_rmse),
        int(coarse.iterations),
    )
    with profile_block("icp"):
        fine = refine_registration(
            src.full, tgt.full, coarse.transformation, config.icp
        )
        jax.block_until_ready(fine.transformation)
    logger.info(
        "ICP: fitness=%.4f rmse=%.4f iters=%d",
        float(fine.fitness),
        float(fine.inlier_rmse),
        int(fine.iterations),
    )
    return PairRegistration(ransac=coarse, icp=fine, source=src, target=tgt)


def register_files(
    src_path: str | Path,
    tgt_path: str | Path,
    config: PipelineConfig | None = None,
    *,
    key: jax.Array | None = None,
) -> PairRegistration:
    """Load, preprocess, and register two PLY files (main.py:24-39 parity)."""
    if config is None:
        config = PipelineConfig()
    with profile_block("preprocess"):
        src = load_cloud(src_path, config.preprocess)
        tgt = load_cloud(tgt_path, config.preprocess)
    return register_pair(src, tgt, config, key=key)


def register_arrays(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    config: PipelineConfig | None = None,
    *,
    key: jax.Array | None = None,
) -> PairRegistration:
    """Preprocess and register two raw host point arrays."""
    if config is None:
        config = PipelineConfig()
    with profile_block("preprocess"):
        src = preprocess_points(src_points, config.preprocess)
        tgt = preprocess_points(tgt_points, config.preprocess)
    return register_pair(src, tgt, config, key=key)
