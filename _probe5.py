import time, jax, numpy as np
import jax.numpy as jnp
T0=time.time()
def tick(m): print(f"[{time.time()-T0:8.2f}s] {m}", flush=True)
np.asarray(jax.device_put(np.ones(8, np.float32)))
tick("session warm")
from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points
from tpu3dm.registration.fused import fused_register_step
cfg = PipelineConfig.with_voxel_size(0.3)
src_pts, tgt_pts, T_true = make_benchmark_pair(seed=0)
src = preprocess_points(src_pts, cfg.preprocess)
tgt = preprocess_points(tgt_pts, cfg.preprocess)
np.asarray(src.down.points); np.asarray(tgt.full.normals)
tick("preprocess done+synced")

sd, td = src.down, tgt.down
def step(key):
    return fused_register_step(
        sd.points, sd.mask, sd.features, td.points, td.mask, td.features,
        tgt.full.points, tgt.full.mask, tgt.full.normals,
        src.full.points, src.full.mask,
        cfg, key)
for B in (16, 64, 128):
    batched = jax.jit(jax.vmap(step))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    keys = jax.device_put(np.asarray(keys))
    t0=time.time()
    out = batched(keys)
    np.asarray(out[1])  # real sync on fitness
    tick(f"B={B} compile+first: {time.time()-t0:.2f}s")
    # pre-split keys on host
    allk = [jax.device_put(np.asarray(jax.random.split(jax.random.PRNGKey(i+1), B))) for i in range(4)]
    for k in allk: np.asarray(k)
    times=[]
    for k in allk:
        t0=time.time()
        out = batched(k)
        np.asarray(out[1])
        times.append(time.time()-t0)
    best=min(times)
    tick(f"B={B} times={[f'{t*1e3:.1f}' for t in times]} ms best={best*1e3:.1f}ms -> {B/best:.1f} pairs/s")
