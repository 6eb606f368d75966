import time
T0 = time.time()
def tick(msg):
    print(f"[{time.time()-T0:8.2f}s] {msg}", flush=True)
import jax
import numpy as np
from tpu3dm.utils import profiler as prof
_orig_enter, _orig_exit = prof.Profiler.__enter__, prof.Profiler.__exit__
def enter(self):
    tick(f"ENTER {self.name}")
    return _orig_enter(self)
def exit(self, *e):
    _orig_exit(self, *e)
    tick(f"EXIT  {self.name}")
prof.Profiler.__enter__, prof.Profiler.__exit__ = enter, exit
from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points
tick(f"imports done backend={jax.default_backend()}")
src_pts, tgt_pts, T_true = make_benchmark_pair(seed=0)
cfg = PipelineConfig.with_voxel_size(0.3)
src = preprocess_points(src_pts, cfg.preprocess)
tick("cloud 1 done")
tgt = preprocess_points(tgt_pts, cfg.preprocess)
tick("cloud 2 done")
