import time, sys
T0 = time.time()
def tick(msg):
    print(f"[{time.time()-T0:8.2f}s] {msg}", flush=True)
tick("start")
import jax
tick("jax imported")
import numpy as np
from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points
from tpu3dm.registration.fused import fused_register_step
tick(f"tpu3dm imported backend={jax.default_backend()}")
src_pts, tgt_pts, T_true = make_benchmark_pair(seed=0)
tick("benchmark pair made")
cfg = PipelineConfig.with_voxel_size(0.3)
src = preprocess_points(src_pts, cfg.preprocess)
tick("cloud 1 done")
tgt = preprocess_points(tgt_pts, cfg.preprocess)
tick("cloud 2 done")
from tpu3dm.utils.profiler import Profiler
print(Profiler.report(), flush=True)
