"""Round-5 stream device-rate dissection: FPFH pair-chunk x rescue config.

measure_fused_device_rate at window=128/cap=896 for each variant; run with
TPU3DM_FPFH_PAIR_CHUNK set per invocation (module-level constant).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main() -> None:
    import jax

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.registration.stream import measure_fused_device_rate

    np.asarray(jax.device_put(np.ones(8, np.float32)))
    cfg = PipelineConfig.with_voxel_size(0.3)
    chunk = os.environ.get("TPU3DM_FPFH_PAIR_CHUNK", "128")
    for rescue, modes in ((0, 6), (2, 2), (2, 6)):
        rate = measure_fused_device_rate(
            cfg, window=128, down_cap=896,
            ransac_iterations=4096, icp_iterations=8, icp_solves_per_nn=4,
            approx_score=True, rescue_restarts=rescue,
            **({"rescue_modes": modes} if rescue else {}),
        )
        print(json.dumps({
            "pair_chunk": chunk, "rescue": rescue, "modes": modes,
            "device_pairs_per_sec": round(rate, 1),
        }), flush=True)
        if not int(os.environ.get("TPU3DM_STREAM_AB_ALL", "1")):
            break


if __name__ == "__main__":
    main()
