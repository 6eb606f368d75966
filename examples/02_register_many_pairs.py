"""Register MANY pairs in batched device dispatches — the production path.

No reference counterpart (the reference registers exactly one pair); this is
the cloud-pairs/sec axis the TPU build adds.  Mixed-size pairs are grouped
into capacity buckets so small pairs never pay for the largest pair's
padding, and results come back in input order.

    python examples/02_register_many_pairs.py
"""

import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points_batch
from tpu3dm.registration.batch import register_pairs_batched


def main() -> None:
    cfg = PipelineConfig.with_voxel_size(0.3)

    # Build 4 pairs of different sizes; batched ingest preprocesses every
    # cloud's features in ONE compiled device program.
    raw, trues = [], []
    for seed, n in enumerate((6_000, 9_000, 12_000, 15_000)):
        s, t, T = make_benchmark_pair(n, seed=seed, sigma=0.01)
        raw.extend([s, t])
        trues.append(T)
    # full_normals=False: batched registration uses the downsampled clouds
    # only, and full-res normal estimation is the dominant ingest cost.
    procs = preprocess_points_batch(
        raw, cfg.preprocess, workers=4, full_normals=False
    )
    pairs = [(procs[i], procs[i + 1]) for i in range(0, len(procs), 2)]

    res = register_pairs_batched(pairs, cfg, ransac_iterations=2048)

    for i, T_true in enumerate(trues):
        M = res.transforms[i][:3, :3] @ T_true[:3, :3].T
        rot = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
        print(
            f"pair {i}: bucket cap {res.bucket_of_pair[i]:4d}  "
            f"fitness {res.ransac_fitness[i]:.3f}  rot err {rot:.3f} deg"
        )
        assert rot < 2.0

    # For manifests of thousands of pairs: `tpu3dm register-batch manifest.txt
    # --window 256 --checkpoint-dir ck` streams ingest in windows (the next
    # window's files parse on host threads while this one registers on
    # device) and survives interruption.


if __name__ == "__main__":
    main()
