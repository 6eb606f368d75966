"""Align N clouds into one frame: pairwise registration + pose-graph solve.

No reference counterpart (the reference only ever registers one pair); this
is the multi-way axis from the build's north star.  All pairwise edges run
as ONE batched device dispatch, then a gauge-fixed Gauss-Newton solve on
SE(3) distributes the loop-closure error.

    python examples/03_multiway.py
"""

import numpy as np

from tpu3dm.core import se3
from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import dental_arch_cloud
from tpu3dm.multiway.posegraph import register_multiway_batched
from tpu3dm.preprocess.pipeline import preprocess_points_batch


def main() -> None:
    cfg = PipelineConfig.with_voxel_size(0.3)

    # 5 scans of the same object, each expressed in its own (unknown) frame:
    # cloud k sees x_k = P_k^{-1} x_world for a random true pose P_k.
    import jax.numpy as jnp

    base = dental_arch_cloud(8_000, seed=0)
    n = 5
    rng = np.random.default_rng(1)
    poses_true = [np.eye(4)]
    for _ in range(n - 1):
        xi = np.r_[rng.normal(size=3) * 0.15, rng.normal(size=3) * 0.15]
        poses_true.append(np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32))))
    raws = []
    for P in poses_true:
        Pinv = np.linalg.inv(P)
        raws.append(base @ Pinv[:3, :3].T + Pinv[:3, 3])
    clouds = preprocess_points_batch(raws, cfg.preprocess, workers=4)

    out = register_multiway_batched(clouds, cfg)  # chain + loop-closure edges

    # World-reconstruction consistency: P_k x_k must coincide across k.
    recon = [raws[k] @ out.poses[k][:3, :3].T + out.poses[k][:3, 3] for k in range(n)]
    for k in range(1, n):
        rmse = np.sqrt(((recon[k] - recon[0]) ** 2).sum(1).mean())
        print(f"cloud {k}: edge fitness {out.edge_fitness[k-1]:.3f}, "
              f"world-frame consistency RMSE {rmse:.4f}")
        assert rmse < 0.05

    # Long runs: pass checkpoint_dir="ck" — each pairwise edge persists as
    # it completes and re-runs resume where they stopped.


if __name__ == "__main__":
    main()
