"""Checkpoint/resume for multi-way runs (multiway/checkpoint.py)."""

import numpy as np
import jax
import pytest

from tpu3dm.multiway.checkpoint import CheckpointStore, EdgeRecord


def _record(seed=0):
    rng = np.random.default_rng(seed)
    return EdgeRecord(
        transformation=np.eye(4) + rng.normal(0, 1e-3, (4, 4)),
        fitness=0.87,
        inlier_rmse=0.012,
        iterations=23,
    )


def test_edge_roundtrip(tmp_path):
    store = CheckpointStore(tmp_path)
    assert store.get_edge(0, 1) is None
    rec = _record()
    store.put_edge(0, 1, rec)
    back = store.get_edge(0, 1)
    np.testing.assert_allclose(back.transformation, rec.transformation)
    assert back.fitness == pytest.approx(rec.fitness)
    assert back.iterations == rec.iterations
    assert store.completed_edges() == [(0, 1)]


def test_corrupt_edge_treated_as_absent(tmp_path):
    store = CheckpointStore(tmp_path)
    store.put_edge(2, 3, _record())
    (tmp_path / "edge_0002_0003.npz").write_bytes(b"not an npz")
    assert store.get_edge(2, 3) is None


def test_manifest_and_poses(tmp_path):
    store = CheckpointStore(tmp_path)
    store.write_manifest(n_clouds=3, edges=[[0, 1], [1, 2]], voxel_size=0.3)
    m = store.read_manifest()
    assert m["n_clouds"] == 3
    poses = np.stack([np.eye(4)] * 3)
    store.write_poses(poses)
    np.testing.assert_allclose(store.read_poses(), poses)


def test_multiway_resume_skips_completed_edges(tmp_path, monkeypatch):
    """Interrupt after first run, re-run: no pairwise registrations redone,
    identical poses."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.multiway import posegraph
    from tpu3dm.preprocess.pipeline import preprocess_points

    base = dental_arch_cloud(3000, seed=0)
    rng = np.random.default_rng(4)
    cfg = PipelineConfig.with_voxel_size(0.3)
    clouds = []
    for k in range(3):
        jitter = rng.normal(0, 0.001, base.shape)
        clouds.append(preprocess_points(base + jitter, cfg.preprocess))

    ckpt = tmp_path / "run1"
    out1 = posegraph.register_multiway(
        clouds, cfg, key=jax.random.PRNGKey(1), checkpoint_dir=str(ckpt)
    )
    store = CheckpointStore(ckpt)
    assert len(store.completed_edges()) == len(out1.edges)
    assert store.read_poses() is not None

    calls = []
    import tpu3dm.registration.pipeline as regpipe

    def boom(*a, **kw):
        calls.append(1)
        raise AssertionError("register_pair must not run on resume")

    monkeypatch.setattr(regpipe, "register_pair", boom)
    out2 = posegraph.register_multiway(
        clouds, cfg, key=jax.random.PRNGKey(1), checkpoint_dir=str(ckpt)
    )
    assert not calls
    np.testing.assert_allclose(out2.poses, out1.poses, atol=1e-6)


def test_multiway_partial_resume(tmp_path):
    """Deleting one edge file recomputes exactly that edge."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.multiway.posegraph import register_multiway
    from tpu3dm.preprocess.pipeline import preprocess_points

    base = dental_arch_cloud(3000, seed=1)
    cfg = PipelineConfig.with_voxel_size(0.3)
    rng = np.random.default_rng(5)
    clouds = [
        preprocess_points(base + rng.normal(0, 0.001, base.shape), cfg.preprocess)
        for _ in range(3)
    ]
    ckpt = tmp_path / "run"
    out1 = register_multiway(
        clouds, cfg, key=jax.random.PRNGKey(2), checkpoint_dir=str(ckpt)
    )
    edges = CheckpointStore(ckpt).completed_edges()
    victim = edges[1]
    (ckpt / f"edge_{victim[0]:04d}_{victim[1]:04d}.npz").unlink()

    out2 = register_multiway(
        clouds, cfg, key=jax.random.PRNGKey(2), checkpoint_dir=str(ckpt)
    )
    # Unconditional per-edge key consumption => recomputed edge gets the same
    # key as in the uninterrupted run => identical transforms throughout.
    np.testing.assert_allclose(out2.edge_transforms, out1.edge_transforms, atol=1e-5)
    np.testing.assert_allclose(out2.poses, out1.poses, atol=1e-5)
