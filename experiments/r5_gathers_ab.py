"""Round-5 on-chip A/B: value-carrying NN fold vs index+gather (nn_impl).

Replicates bench.py's two timed regimes (same-pair headline and the
8-distinct-pairs tiled batch at the shared cap) for each nn_impl variant.
Run ONE at a time through the axon tunnel; prints a JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

PAIR_BATCH = 2048
RANSAC_HYPOTHESES = 4096
ICP_ITERS = 8
ICP_SOLVES_PER_NN = 4
DISTINCT_PAIRS = 8
N_POINTS = 20_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.preprocess.pipeline import preprocess_points, preprocess_points_batch
    from tpu3dm.registration.fused import fused_register_step

    # Variant spec: "<impl>" or "<impl>@sr<rows>" (sampler row cap).
    specs = sys.argv[1:] or ["dense", "values"]
    impls = []
    for sp_arg in specs:
        if "@sr" in sp_arg:
            impl, rows = sp_arg.split("@sr")
            impls.append((impl, int(rows)))
        else:
            impls.append((sp_arg, 0))
    log(f"backend={jax.default_backend()} impls={impls}")
    t0 = time.time()
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    log(f"session warm-up: {time.time()-t0:.2f}s")

    cfg = PipelineConfig.with_voxel_size(0.3)
    src_pts, tgt_pts, T_true = make_benchmark_pair(N_POINTS, seed=0, sigma=0.01)
    src = preprocess_points(src_pts, cfg.preprocess)
    tgt = preprocess_points(tgt_pts, cfg.preprocess)

    # Distinct pairs, tiled (same construction as bench.py).
    raw, t_trues = [], [T_true]
    for s in range(1, DISTINCT_PAIRS):
        sp, tp, tt = make_benchmark_pair(N_POINTS, seed=s, sigma=0.01)
        raw.extend([sp, tp])
        t_trues.append(tt)
    procs = preprocess_points_batch(raw, cfg.preprocess, full_normals=False)
    np.asarray(procs[-1].down.features)
    clouds = [(src, tgt)] + [(procs[i], procs[i + 1]) for i in range(0, len(procs), 2)]
    cap = max(max(c[0].down.capacity, c[1].down.capacity) for c in clouds)
    log(f"cap={cap}")

    def padto(a, w):
        a = np.asarray(a)
        pad = w - a.shape[0]
        return a if pad == 0 else np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])

    reps = PAIR_BATCH // DISTINCT_PAIRS

    def stack(attr, which):
        base = np.stack([padto(getattr(c[which].down, attr), cap) for c in clouds])
        return jax.device_put(np.tile(base, (reps,) + (1,) * (base.ndim - 1)))

    sp_, sf_, sm_, sn_ = (stack(a, 0) for a in ("points", "features", "mask", "normals"))
    tp_, tf_, tm_, tn_ = (stack(a, 1) for a in ("points", "features", "mask", "normals"))
    dkeys = jax.device_put(np.asarray(jax.random.split(jax.random.PRNGKey(7), PAIR_BATCH)))
    skeys = jax.device_put(np.asarray(jax.random.split(jax.random.PRNGKey(0), PAIR_BATCH)))
    sd, td = src.down, tgt.down

    t_true_tiled = np.tile(np.stack(t_trues), (reps, 1, 1))

    for impl, srows in impls:
        def step_d(spts, sfeat, smask, snrm, tpts, tfeat, tmask, tnrm, key):
            return fused_register_step(
                spts, sfeat, smask, snrm, tpts, tfeat, tmask, tnrm, key,
                dist_thresh=cfg.ransac.dist_thresh,
                icp_thresh=cfg.icp.dist_thresh,
                ransac_iterations=RANSAC_HYPOTHESES,
                ransac_batch=RANSAC_HYPOTHESES,
                icp_iterations=ICP_ITERS,
                icp_solves_per_nn=ICP_SOLVES_PER_NN,
                approx_score=True,
                approx_features=True,
                nn_impl=impl,
                sample_rows=srows,
            )

        batched_d = jax.jit(jax.vmap(step_d))

        # -- distinct regime --
        t0 = time.time()
        out_d = batched_d(sp_, sf_, sm_, sn_, tp_, tf_, tm_, tn_, dkeys)
        np.asarray(out_d[1].ravel()[:4])
        compile_s = time.time() - t0
        Td = np.asarray(out_d[0])
        Md = Td[:, :3, :3] @ np.swapaxes(t_true_tiled[:, :3, :3], 1, 2)
        trd = np.clip((np.trace(Md, axis1=1, axis2=2) - 1) / 2, -1, 1)
        rot_max = float(np.degrees(np.arccos(trd)).max())
        dt = []
        for _ in range(3):
            t0 = time.time()
            out_d = batched_d(sp_, sf_, sm_, sn_, tp_, tf_, tm_, tn_, dkeys)
            np.asarray(out_d[1].ravel()[:4])
            dt.append(time.time() - t0)
        distinct_ms = float(np.median(dt)) * 1e3

        # -- same-pair regime --
        def step_s(key):
            return step_d(sd.points, sd.features, sd.mask, sd.normals,
                          td.points, td.features, td.mask, td.normals, key)

        batched_s = jax.jit(jax.vmap(step_s))
        out = batched_s(skeys)
        np.asarray(out[1])
        st = []
        for _ in range(3):
            t0 = time.time()
            out = batched_s(skeys)
            np.asarray(out[1])
            st.append(time.time() - t0)
        same_ms = float(np.median(st)) * 1e3
        Ts = np.asarray(out[0])
        Ms = Ts[:, :3, :3] @ T_true[:3, :3].T
        trs = np.clip((np.trace(Ms, axis1=1, axis2=2) - 1) / 2, -1, 1)
        same_rot_max = float(np.degrees(np.arccos(trs)).max())

        rec = {
            "impl": impl,
            "sample_rows": srows,
            "distinct_ms": round(distinct_ms, 1),
            "distinct_pairs_per_sec": round(PAIR_BATCH / (distinct_ms / 1e3), 1),
            "distinct_rot_max_deg": round(rot_max, 3),
            "same_ms": round(same_ms, 1),
            "same_pairs_per_sec": round(PAIR_BATCH / (same_ms / 1e3), 1),
            "same_rot_max_deg": round(same_rot_max, 3),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(rec), flush=True)
        log(json.dumps(rec))


if __name__ == "__main__":
    main()
