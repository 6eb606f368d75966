"""Register large (100k-1M+ point) clouds with block-sparse full-res ICP.

The reference handles large clouds by voxel downsampling and hands full-res
ICP to Open3D's C++ KDTree (src/matcher/icp.py:42-48).  Here the full-res
refinement runs on device with the KD-blocked sparse NN kernel: coarse pose
from the downsampled clouds (two-mode RANSAC + ICP-verified restarts), then
block-sparse point-to-plane ICP at full resolution.

    python examples/04_large_cloud.py            # ~150k points, CPU-friendly
"""

import numpy as np

from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.registration.large import register_arrays_large


def main() -> None:
    src_pts, tgt_pts, T_true = make_benchmark_pair(150_000, seed=0, sigma=0.005)

    refined, coarse = register_arrays_large(src_pts, tgt_pts)

    T = np.asarray(refined.transformation)
    M = T[:3, :3] @ T_true[:3, :3].T
    rot = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
    print(f"coarse fitness  : {float(coarse.fitness):.3f}")
    print(f"refined fitness : {float(refined.fitness):.3f}")
    print(f"refined RMSE    : {float(refined.inlier_rmse):.4f}")
    print(f"rotation error  : {rot:.4f} deg")
    assert rot < 0.5

    # At pod scale, pass mesh=parallel.mesh.make_mesh(1, n_devices) to run
    # the full-res refinement as the sharded ring ICP (both clouds sharded
    # over the block axis, one psum of the 6x6 normal equations per
    # iteration) — see examples/05_sharded_mesh.py.


if __name__ == "__main__":
    main()
