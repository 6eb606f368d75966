"""Capacity-bucketed batch registration (registration/batch.py)."""

import numpy as np
import pytest

from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points_batch
from tpu3dm.registration.batch import register_pairs_batched


def _rot_err_deg(T, T_true):
    M = np.asarray(T)[:3, :3] @ np.asarray(T_true)[:3, :3].T
    return float(np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1))))


@pytest.fixture(scope="module")
def mixed_pairs():
    """Pairs of deliberately different sizes -> multiple capacity buckets."""
    cfg = PipelineConfig.with_voxel_size(0.3)
    raw, trues = [], []
    for seed, n in [(0, 4000), (1, 20000), (2, 4500)]:
        s, t, T = make_benchmark_pair(n, seed=seed, sigma=0.01)
        raw.extend([s, t])
        trues.append(T)
    procs = preprocess_points_batch(raw, cfg.preprocess)
    pairs = [(procs[i], procs[i + 1]) for i in range(0, len(procs), 2)]
    return cfg, pairs, trues


def test_batched_recovers_transforms(mixed_pairs):
    cfg, pairs, trues = mixed_pairs
    res = register_pairs_batched(pairs, cfg, ransac_iterations=4096)
    assert res.transforms.shape == (3, 4, 4)
    for i, T_true in enumerate(trues):
        assert _rot_err_deg(res.transforms[i], T_true) < 2.0, i
        assert res.ransac_fitness[i] > 0.2


def test_buckets_are_tight(mixed_pairs):
    """Small pairs must NOT be dragged to the big pair's capacity."""
    cfg, pairs, _ = mixed_pairs
    res = register_pairs_batched(pairs, cfg, ransac_iterations=1024)
    caps = sorted(set(res.bucket_of_pair))
    assert len(caps) >= 2, "expected distinct capacity buckets"
    # the two small clouds share the small bucket; the 20k pair is alone
    assert res.bucket_of_pair[0] == res.bucket_of_pair[2] == caps[0]
    assert res.bucket_of_pair[1] == caps[-1]


def test_empty_input():
    res = register_pairs_batched([])
    assert res.transforms.shape == (0, 4, 4)
    assert res.bucket_of_pair == []


def test_mesh_sharded_batch(mixed_pairs):
    """Bucketed dispatch through the pair-sharded mesh path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (CPU-simulated) mesh")
    from tpu3dm.parallel.mesh import make_mesh

    cfg, pairs, trues = mixed_pairs
    mesh = make_mesh()  # all devices on the pair axis
    res = register_pairs_batched(pairs, cfg, mesh=mesh, ransac_iterations=2048)
    for i, T_true in enumerate(trues):
        assert _rot_err_deg(res.transforms[i], T_true) < 2.0, i


class TestCheckpointResume:
    """register_pairs_batched kill/resume (VERDICT r1 item 9)."""

    def test_resume_skips_completed(self, mixed_pairs, tmp_path):
        from tpu3dm.multiway.checkpoint import CheckpointStore

        cfg, pairs, trues = mixed_pairs
        names = [f"pair-{i}" for i in range(len(pairs))]
        store = CheckpointStore(tmp_path / "ck")
        res1 = register_pairs_batched(
            pairs, cfg, ransac_iterations=1024,
            checkpoint=store, pair_names=names,
        )
        assert all(c > 0 for c in res1.bucket_of_pair)

        # Full resume: every pair restored, NO dispatch may happen.
        import tpu3dm.registration.batch as batch_mod

        def boom(*a, **k):
            raise AssertionError("dispatched despite complete checkpoint")

        orig = batch_mod._batched_step
        batch_mod._batched_step = boom
        try:
            res2 = register_pairs_batched(
                pairs, cfg, ransac_iterations=1024,
                checkpoint=store, pair_names=names,
            )
        finally:
            batch_mod._batched_step = orig
        assert all(c == -1 for c in res2.bucket_of_pair)
        np.testing.assert_allclose(res2.transforms, res1.transforms, atol=1e-6)
        np.testing.assert_allclose(res2.ransac_fitness, res1.ransac_fitness, atol=1e-6)

    def test_partial_resume_recomputes_missing(self, mixed_pairs, tmp_path):
        """A killed run (one record missing) recomputes only that pair."""
        from tpu3dm.multiway.checkpoint import CheckpointStore

        cfg, pairs, trues = mixed_pairs
        names = [f"pair-{i}" for i in range(len(pairs))]
        store = CheckpointStore(tmp_path / "ck2")
        res1 = register_pairs_batched(
            pairs, cfg, ransac_iterations=1024,
            checkpoint=store, pair_names=names,
        )
        store._pair_path(names[1]).unlink()  # simulate mid-run kill

        res2 = register_pairs_batched(
            pairs, cfg, ransac_iterations=1024,
            checkpoint=store, pair_names=names,
        )
        assert res2.bucket_of_pair[0] == -1
        assert res2.bucket_of_pair[2] == -1
        assert res2.bucket_of_pair[1] > 0  # recomputed
        for i, T_true in enumerate(trues):
            assert _rot_err_deg(res2.transforms[i], T_true) < 2.0, i
