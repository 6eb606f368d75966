"""Disk->result streaming pipeline (registration/stream.py)."""

import jax
import numpy as np
import pytest

from tpu3dm.core.config import PipelineConfig
from tpu3dm.registration.batch import register_pairs_batched
from tpu3dm.registration.stream import (
    make_stream_manifest,
    stream_quality,
    stream_register_pairs,
)

N_POINTS = 1500
KW = dict(ransac_iterations=512, icp_iterations=4, bucket_multiple=64)


@pytest.mark.slow
def test_stream_matches_batched_and_is_window_invariant(tmp_path):
    """The streamed path must produce exactly the whole-manifest batched
    results, for ANY window size (positional keys), and pass the gate."""
    cfg = PipelineConfig.with_voxel_size(0.3)
    pair_paths, trues, moments = make_stream_manifest(
        tmp_path, 6, n_points=N_POINTS, sigma=0.005
    )

    res2 = stream_register_pairs(pair_paths, cfg, window=2, **KW)
    assert res2.window_pairs == [2, 2, 2]
    assert res2.total_seconds > 0 and res2.fresh_pairs_per_sec > 0
    assert res2.steady_pairs_per_sec is not None

    q = stream_quality(res2, trues, moments)
    assert q["quality_ok"], q
    assert q["rot_err_deg_worst_pair"] < 2.0

    # Window-size invariance: same per-pair keys regardless of windowing.
    res4 = stream_register_pairs(pair_paths, cfg, window=4, **KW)
    np.testing.assert_allclose(res2.transforms, res4.transforms, atol=1e-6)

    # Whole-manifest batched call with the same master key: identical.
    from tpu3dm.io.loader import preprocess_files_batch

    paths = sorted({p for pair in pair_paths for p in pair})
    procs = dict(zip(paths, preprocess_files_batch(
        paths, cfg.preprocess, full_normals=False
    )))
    direct = register_pairs_batched(
        [(procs[a], procs[b]) for a, b in pair_paths], cfg,
        key=jax.random.PRNGKey(0), **KW,
    )
    np.testing.assert_allclose(res2.transforms, direct.transforms, atol=1e-5)


@pytest.mark.slow
def test_stream_fused_device_path(tmp_path):
    """The fused ingest+register dispatch (one program per window) agrees
    with the generic streamed path and passes the quality gate, including
    a padded final window."""
    cfg = PipelineConfig.with_voxel_size(0.3)
    pair_paths, trues, moments = make_stream_manifest(
        tmp_path, 5, n_points=N_POINTS, sigma=0.005, seed0=20
    )
    fused = stream_register_pairs(
        pair_paths, cfg, window=2, down_cap=768, fuse_device=True, **KW
    )
    assert fused.window_pairs == [2, 2, 1]  # final window padded internally
    q = stream_quality(fused, trues, moments)
    assert q["quality_ok"], q

    generic = stream_register_pairs(
        pair_paths, cfg, window=2, down_cap=768, **KW
    )
    # Same keys, same algorithm — numerically equivalent (not bit-identical:
    # the fused program partitions/fuses differently).
    for Tf, Tg in zip(fused.transforms, generic.transforms):
        M = Tf[:3, :3] @ Tg[:3, :3].T
        rot = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
        assert rot < 0.5, (rot, Tf, Tg)
        np.testing.assert_allclose(Tf[:3, 3], Tg[:3, 3], atol=0.02)


@pytest.mark.slow
def test_stream_benchmark_smoke(tmp_path, monkeypatch):
    """The --stream benchmark phase runs end-to-end, writes the artifact,
    and gates quality."""
    from tpu3dm.apps.benchmark import run_stream_benchmark

    monkeypatch.chdir(tmp_path)
    r = run_stream_benchmark(
        6, n_points=N_POINTS, window=2, down_cap=768,
        ransac_iterations=512, icp_iterations=4,
        out_json=str(tmp_path / "stream.json"),
    )
    assert (tmp_path / "stream.json").exists()
    assert r["quality_ok"], r
    assert r["fresh_pairs_per_sec"] > 0
    assert r["host_ingest_pairs_per_sec"] > 0
    assert len(r["window_done_s"]) == 3


def test_stream_down_cap_pins_feature_shape(tmp_path):
    """down_cap pins the down capacity so every window compiles once."""
    cfg = PipelineConfig.with_voxel_size(0.3)
    pair_paths, trues, moments = make_stream_manifest(
        tmp_path, 4, n_points=N_POINTS, sigma=0.005, seed0=50
    )
    res = stream_register_pairs(
        pair_paths, cfg, window=2, down_cap=512, **KW
    )
    q = stream_quality(res, trues, moments)
    assert q["quality_ok"], q
    # All pairs must land in the pinned bucket (<= down_cap valid points).
    assert all(b >= 512 for b in res.bucket_of_pair)


@pytest.mark.slow
def test_symmetry_probe_retry_path():
    """Hard-pair escalation (round 5): low-fitness results re-elect via
    symmetry probes about the target's principal axes
    (fused.verify_elect_probes).  Forcing the retry on every pair
    (threshold 1.0) must preserve correct registrations — the original
    elected pose is among the probes and annealed fine counts decide."""
    import tempfile

    from tpu3dm.registration.stream import (
        make_stream_manifest,
        stream_register_pairs,
    )

    cfg = PipelineConfig.with_voxel_size(0.3)
    with tempfile.TemporaryDirectory() as tmp:
        paths, trues, _ = make_stream_manifest(
            tmp, 4, n_points=3000, sigma=0.01, family="mix"
        )
        res = stream_register_pairs(
            paths, cfg, window=2, down_cap=768, fuse_device=True,
            ransac_iterations=512, icp_iterations=4, icp_solves_per_nn=2,
            rescue_restarts=2, retry_below_fitness=1.0,
        )
        assert res.retry_pairs == [0, 1, 2, 3]
        assert res.retry_seconds > 0
        for i, Tt in enumerate(trues):
            M = res.transforms[i][:3, :3] @ np.asarray(Tt)[:3, :3].T
            err = float(np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1))))
            assert err < 2.0, (i, err)
