"""Round-5 op-level trace of the fused distinct-pair batch (values_pk).

Captures one warm batch under jax.profiler.trace and aggregates device-plane
op durations from the .xplane.pb (xprof protos) — the same attribution
method as the round-4 ROOFLINE table.  Prints the top ops by total ms.
"""

from __future__ import annotations

import glob
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

PAIR_BATCH = 2048
DISTINCT_PAIRS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.preprocess.pipeline import preprocess_points_batch
    from tpu3dm.registration.fused import fused_register_step

    np.asarray(jax.device_put(np.ones(8, np.float32)))
    cfg = PipelineConfig.with_voxel_size(0.3)
    raw = []
    for s in range(DISTINCT_PAIRS):
        sp, tp, _ = make_benchmark_pair(20_000, seed=s, sigma=0.01)
        raw.extend([sp, tp])
    procs = preprocess_points_batch(raw, cfg.preprocess, full_normals=False)
    np.asarray(procs[-1].down.features)
    clouds = [(procs[i], procs[i + 1]) for i in range(0, len(procs), 2)]
    cap = max(max(c[0].down.capacity, c[1].down.capacity) for c in clouds)
    log(f"cap={cap}")

    def padto(a, w):
        a = np.asarray(a)
        pad = w - a.shape[0]
        return a if pad == 0 else np.concatenate(
            [a, np.zeros((pad,) + a.shape[1:], a.dtype)]
        )

    reps = PAIR_BATCH // DISTINCT_PAIRS

    def stack(attr, which):
        base = np.stack([padto(getattr(c[which].down, attr), cap) for c in clouds])
        return jax.device_put(np.tile(base, (reps,) + (1,) * (base.ndim - 1)))

    args = [stack(a, w) for w in (0, 1) for a in ("points", "features", "mask", "normals")]
    keys = jax.device_put(np.asarray(jax.random.split(jax.random.PRNGKey(7), PAIR_BATCH)))

    def step(sp, sf, sm, sn, tp, tf, tm, tn, k):
        return fused_register_step(
            sp, sf, sm, sn, tp, tf, tm, tn, k,
            dist_thresh=cfg.ransac.dist_thresh, icp_thresh=cfg.icp.dist_thresh,
            ransac_iterations=4096, ransac_batch=4096,
            icp_iterations=8, icp_solves_per_nn=4,
            approx_score=True, approx_features=True,
        )

    batched = jax.jit(jax.vmap(step))
    out = batched(*args, keys)
    np.asarray(out[1].ravel()[:4])
    t0 = time.time()
    out = batched(*args, keys)
    np.asarray(out[1].ravel()[:4])
    log(f"warm batch: {(time.time()-t0)*1e3:.1f} ms")

    tmp = tempfile.mkdtemp(prefix="tpu3dm_trace_")
    with jax.profiler.trace(tmp):
        out = batched(*args, keys)
        np.asarray(out[1].ravel()[:4])
    pbs = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    log(f"trace files: {pbs}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    total = defaultdict(float)
    for pb in pbs:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(pb, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    total[name] += ev.duration_ps / 1e9  # ps -> ms
    rows = sorted(total.items(), key=lambda kv: -kv[1])
    dev_total = sum(total.values())
    print(f"device total (all planes/lines, incl. overlap double-count): {dev_total:.1f} ms")
    for name, ms in rows[:25]:
        print(f"{ms:8.1f} ms  {name}")


if __name__ == "__main__":
    main()
