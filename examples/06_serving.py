"""Serve registrations online — micro-batched requests, one shared engine.

No reference counterpart (the reference is a batch script); this is the
production deployment shape: a long-lived process owns the compiled
programs, concurrent clients submit single pairs, and the engine coalesces
them into capacity-bucketed device dispatches (tpu3dm/serve/engine.py).

Two tiers shown here:
  1. in-process ``ServeEngine`` — library users embedding registration in
     their own service;
  2. the TCP server + client — cross-process deployment
     (``tpu3dm serve`` CLI starts the same server standalone).

    python examples/06_serving.py
"""

import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points_batch
from tpu3dm.serve import (
    RegistrationClient,
    RegistrationServer,
    ServeConfig,
    ServeEngine,
)


def rot_err_deg(T, T_true):
    M = np.asarray(T)[:3, :3] @ np.asarray(T_true)[:3, :3].T
    return float(np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1))))


def main() -> None:
    cfg = PipelineConfig.with_voxel_size(0.3)
    # Small work knobs keep this example quick on CPU; production keeps the
    # defaults (4096 hypotheses, 8 ICP iterations).
    serve_cfg = ServeConfig(
        max_batch=8, max_delay_ms=100.0, bucket_multiple=64,
        ransac_iterations=512, icp_iterations=4,
    )

    # Four independent "requests": pairs with known ground truth.
    raws, trues = [], []
    for seed in range(4):
        s, t, T = make_benchmark_pair(1500, seed=seed, sigma=0.005)
        raws.append((s, t))
        trues.append(T)
    flat = [p for pair in raws for p in pair]
    procs = preprocess_points_batch(flat, cfg.preprocess, full_normals=False)
    pairs = [(procs[i], procs[i + 1]) for i in range(0, len(procs), 2)]

    # --- tier 1: in-process engine -----------------------------------------
    with ServeEngine(cfg, serve_cfg) as engine:
        futures = [engine.submit(s, t) for s, t in pairs]  # all before linger ends
        results = [f.result(timeout=600) for f in futures]
        stats = engine.stats()

    for r, T_true in zip(results, trues):
        err = rot_err_deg(r.transformation, T_true)
        assert err < 2.0, err
    assert stats["batches"] == 1, stats  # four requests shared one dispatch
    print(f"engine: {stats['requests']} requests in {stats['batches']} batch, "
          f"mean latency {stats['latency_ms']['mean']:.0f} ms")

    # --- tier 2: TCP server + client ---------------------------------------
    with RegistrationServer(port=0, pipeline=cfg, serve=serve_cfg) as server:
        with RegistrationClient(server.host, server.port, timeout=600) as client:
            assert client.ping()
            resp = client.register(raws[0][0], raws[0][1])  # raw [n,3] arrays
            err = rot_err_deg(np.asarray(resp["transformation"]), trues[0])
            assert err < 2.0, err
            print(f"server: fitness {resp['fitness']:.2f}, "
                  f"rot err {err:.3f} deg, bucket {resp['bucket']}")
    print("ok")


if __name__ == "__main__":
    main()
