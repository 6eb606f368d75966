"""tpu3dm — a TPU-native 3D point-cloud registration engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
pipeline (KTC-Security-Circle/3d-matching): PLY/STL ingest, voxel
downsampling, normal estimation, FPFH features, RANSAC global registration,
and point-to-plane ICP refinement — designed array-first for TPU rather than
ported.  See SURVEY.md for the structural analysis and build plan.
"""

import jax as _jax

# Registration is geometry: transform recovery degrades visibly under the TPU
# default bf16 matmul passes.  Default to full-precision f32 matmuls; the
# throughput-critical kernels (NN search, hypothesis scoring) opt back into
# lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

from tpu3dm.core.cloud import PointCloud, from_numpy, to_numpy
from tpu3dm.core.config import (
    IcpConfig,
    PipelineConfig,
    PreprocessConfig,
    RansacConfig,
)

__version__ = "0.1.0"

__all__ = [
    "PointCloud",
    "from_numpy",
    "to_numpy",
    "PipelineConfig",
    "PreprocessConfig",
    "RansacConfig",
    "IcpConfig",
]
