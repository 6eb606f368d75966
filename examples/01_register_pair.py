"""Register one pair of point clouds — the reference `src/main.py` flow.

Reference (KTC-Security-Circle/3d-matching, src/main.py:24-39):
    src = Ply(src_path); tgt = Ply(tgt_path)
    T = global_registration(src, tgt).transformation
    result = refine_registration(src, tgt, T)

tpu3dm equivalent below.  Run anywhere (CPU or TPU):
    python examples/01_register_pair.py
"""

import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points
from tpu3dm.registration.pipeline import register_pair


def main() -> None:
    # One config object carries every reference constant (voxel size drives
    # the RANSAC/ICP thresholds and feature radii exactly like the
    # reference's scattered 1.5*voxel / 0.4*voxel / 2*voxel / 5*voxel).
    cfg = PipelineConfig.with_voxel_size(0.3)

    # Synthetic benchmark pair with a known ground-truth transform; with
    # real scans use preprocess.pipeline.load_cloud("scan.ply", cfg.preprocess).
    src_pts, tgt_pts, T_true = make_benchmark_pair(20_000, seed=0, sigma=0.01)

    src = preprocess_points(src_pts, cfg.preprocess)  # the reference's Ply()
    tgt = preprocess_points(tgt_pts, cfg.preprocess)

    out = register_pair(src, tgt, cfg)  # RANSAC coarse + point-to-plane ICP

    T = np.asarray(out.icp.transformation)
    M = T[:3, :3] @ T_true[:3, :3].T
    rot_err = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
    print(f"RANSAC fitness    : {float(out.ransac.fitness):.3f}")
    print(f"ICP fitness       : {float(out.icp.fitness):.3f}")
    print(f"ICP inlier RMSE   : {float(out.icp.inlier_rmse):.4f}")
    print(f"rotation error    : {rot_err:.4f} deg (vs planted ground truth)")
    assert rot_err < 1.0


if __name__ == "__main__":
    main()
