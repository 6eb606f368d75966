import time
import jax, numpy as np
T0=time.time()
def tick(m): print(f"[{time.time()-T0:8.2f}s] {m}", flush=True)
from tpu3dm.core.cloud import from_numpy
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.normals import estimate_normals
from tpu3dm.preprocess.fpfh import compute_fpfh
from tpu3dm.preprocess.voxel import voxel_downsample_host
tick(f"imports backend={jax.default_backend()}")
src_pts, _, _ = make_benchmark_pair(seed=0)
full = from_numpy(src_pts)
np.asarray(full.points)  # real sync
tick("from_numpy synced")
down = voxel_downsample_host(src_pts, 0.3)
np.asarray(down.points)
tick("voxel synced")
for rep in range(2):
    nd = estimate_normals(down, 0.6)
    np.asarray(nd.normals)
    tick(f"normals_down synced rep{rep}")
for rep in range(2):
    fd = compute_fpfh(nd, 1.5)
    np.asarray(fd.features)
    tick(f"fpfh synced rep{rep}")
for rep in range(2):
    nf = estimate_normals(full, 0.6)
    np.asarray(nf.normals)
    tick(f"normals_full synced rep{rep}")
