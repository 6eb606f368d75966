"""Scale out over a device mesh: pair-parallel batches + sharded large ICP.

Runs on a SIMULATED 8-device CPU mesh so it works anywhere; on a real TPU
slice delete the two env lines and the same code spans the chips (the mesh
axes ride ICI).  Two axes are shown:

  * pair axis (DP): many registrations sharded over devices — zero
    inter-device collectives (each lane is independent).
  * block axis (SP): ONE huge pair, both clouds sharded over devices; ring
    correspondences via ppermute, one psum of the 6x6 normal equations per
    ICP iteration.

    python examples/05_sharded_mesh.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    import jax  # noqa: E402 (after the env setup above)

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.parallel.mesh import make_mesh
    from tpu3dm.preprocess.pipeline import preprocess_points_batch
    from tpu3dm.registration.batch import register_pairs_batched
    from tpu3dm.registration.large import register_arrays_large

    cfg = PipelineConfig.with_voxel_size(0.3)
    print(f"devices: {len(jax.devices())}")

    # --- pair-axis DP: 4 pairs sharded over a (pair=4, block=2) mesh --------
    raw, trues = [], []
    for seed in range(4):
        s, t, T = make_benchmark_pair(5_000, seed=seed, sigma=0.01)
        raw.extend([s, t])
        trues.append(T)
    procs = preprocess_points_batch(raw, cfg.preprocess, workers=4)
    pairs = [(procs[i], procs[i + 1]) for i in range(0, 8, 2)]
    mesh = make_mesh(4, 2)
    res = register_pairs_batched(pairs, cfg, mesh=mesh, ransac_iterations=2048)
    for i, T in enumerate(trues):
        M = res.transforms[i][:3, :3] @ T[:3, :3].T
        rot = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
        print(f"DP pair {i}: rot err {rot:.3f} deg")
        assert rot < 2.0

    # --- block-axis SP: one 60k-point pair, full-res ICP sharded ------------
    s, t, T = make_benchmark_pair(60_000, seed=9, sigma=0.005)
    refined, _ = register_arrays_large(s, t, cfg, mesh=make_mesh(1, 8))
    M = np.asarray(refined.transformation)[:3, :3] @ T[:3, :3].T
    rot = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
    print(f"SP sharded ICP: fitness {float(refined.fitness):.3f}, "
          f"rot err {rot:.3f} deg")
    assert rot < 0.5


if __name__ == "__main__":
    main()
