"""Diagnose the round-5 scan-family sweep failures: which nn_impl is at
fault, and does the adaptive budget fire?  Registers one scan pair (and one
plate pair at overlap 0.5) across impls x rescue, 16 seeds each."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.preprocess.pipeline import preprocess_points_batch
    from tpu3dm.registration.fused import fused_register_step

    np.asarray(jax.device_put(np.ones(8, np.float32)))
    cfg = PipelineConfig.with_voxel_size(0.3)
    seeds = 16

    cases = [
        ("scan", 1.0),
        ("scan", 0.6),
        ("plate", 0.5),
    ]
    impls = sys.argv[1:] or ["dense", "values_pk", "values_b16"]

    for family, ov in cases:
        src, tgt, T_true = make_benchmark_pair(
            20_000, seed=17, overlap=ov, sigma=0.01, family=family
        )
        ps, pt = preprocess_points_batch(
            [src.astype(np.float32), tgt.astype(np.float32)],
            cfg.preprocess, full_normals=False,
        )
        sd, td = ps.down, pt.down

        def cap_to(pc, cap):
            import jax.numpy as jnp
            pad = cap - pc.points.shape[0]
            if pad <= 0:
                return pc.points, pc.features, pc.mask, pc.normals
            z = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
            )
            return z(pc.points), z(pc.features), z(pc.mask), z(pc.normals)

        cap = max(sd.points.shape[0], td.points.shape[0])
        spts, sfeat, smask, snrm = cap_to(sd, cap)
        tpts, tfeat, tmask, tnrm = cap_to(td, cap)
        keys = jax.device_put(
            np.asarray(jax.random.split(jax.random.PRNGKey(round(ov * 1000)), seeds))
        )
        for impl in impls:
            for rr, adapt, modes in (
                (2, 0, 6), (2, 32768, 6),
            ):
                def step(k):
                    return fused_register_step(
                        spts, sfeat, smask, snrm, tpts, tfeat, tmask, tnrm, k,
                        dist_thresh=cfg.ransac.dist_thresh,
                        icp_thresh=cfg.icp.dist_thresh,
                        ransac_iterations=4096, ransac_batch=4096,
                        icp_iterations=8, icp_solves_per_nn=4,
                        approx_score=True, approx_features=True,
                        rescue_restarts=rr, adapt_iterations=adapt,
                        rescue_modes=modes, nn_impl=impl,
                    )

                out = jax.jit(jax.vmap(step))(keys)
                T = np.asarray(out[0])
                fit = np.asarray(out[1])
                M = T[:, :3, :3] @ T_true[:3, :3].T
                tr = np.clip((np.trace(M, axis1=1, axis2=2) - 1) / 2, -1, 1)
                errs = np.degrees(np.arccos(tr))
                print(json.dumps({
                    "family": family, "overlap": ov, "impl": impl,
                    "rescue": rr, "adapt": adapt, "modes": modes,
                    "ok_2deg": int((errs < 2.0).sum()), "seeds": seeds,
                    "med_err": round(float(np.median(errs)), 2),
                    "fit_med": round(float(np.median(fit)), 3),
                }), flush=True)


if __name__ == "__main__":
    main()
