"""Stream a manifest of PLY files from disk to registered transforms.

The reference benchmark treats preprocessing as its phase 1
(benchmark_ransac.py:31-60) and registers one preprocessed pair; the
production question is the END-TO-END rate: files on disk in, transforms
out.  ``stream_register_pairs`` (tpu3dm/registration/stream.py) pipelines
that path:

  - windowed threaded ingest: native PLY parse + voxel hash on host
    threads, one window prefetched ahead;
  - ``fuse_device=True``: ONE compiled program per window computes the
    FPFH features AND runs RANSAC+ICP — only the downsampled points cross
    the host link (~10 KB/cloud), features never round-trip;
  - results stream back one window behind the dispatch.

    python examples/07_streaming.py
"""

import tempfile

import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.registration.stream import (
    make_stream_manifest,
    stream_quality,
    stream_register_pairs,
)

N_PAIRS = 6
WINDOW = 2

with tempfile.TemporaryDirectory(prefix="tpu3dm_stream_example_") as tmp:
    # A manifest of fresh PLY files (each pair carries a known ground truth).
    pair_paths, trues, moments = make_stream_manifest(
        tmp, N_PAIRS, n_points=2000, sigma=0.005
    )
    cfg = PipelineConfig.with_voxel_size(0.3)

    result = stream_register_pairs(
        pair_paths,
        cfg,
        window=WINDOW,
        down_cap=768,  # pinned feature capacity: one compile for all windows
        fuse_device=True,
        ransac_iterations=1024,
        icp_iterations=4,
    )

    q = stream_quality(result, trues, moments)
    print(
        f"{N_PAIRS} fresh pairs in {result.total_seconds:.2f}s "
        f"({result.fresh_pairs_per_sec:.1f} pairs/s incl. compile; steady "
        f"{result.steady_pairs_per_sec:.1f}); worst rotation error "
        f"{q['rot_err_deg_worst_pair']:.3f} deg"
    )
    assert q["quality_ok"], q
    assert result.window_pairs == [WINDOW] * (N_PAIRS // WINDOW)
    assert np.isfinite(result.transforms).all()
    print("quality gate: OK")
