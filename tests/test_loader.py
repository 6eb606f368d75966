"""Threaded/prefetching data loader (io/loader.py) and windowed batch CLI."""

import json

import numpy as np
import pytest

from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.loader import (
    iter_preprocessed_windows,
    read_ply_many,
    voxel_downsample_many,
)
from tpu3dm.io.ply import read_ply, write_ply
from tpu3dm.io.synthetic import make_benchmark_pair


@pytest.fixture(scope="module")
def manifest_files(tmp_path_factory):
    """4 pairs (8 distinct clouds) + a manifest file."""
    d = tmp_path_factory.mktemp("batchclouds")
    paths = []
    for s in range(4):
        src, tgt, _ = make_benchmark_pair(3000, seed=s, sigma=0.005)
        a, b = d / f"s{s}.ply", d / f"t{s}.ply"
        write_ply(a, src)
        write_ply(b, tgt)
        paths.append((str(a), str(b)))
    mf = d / "manifest.txt"
    mf.write_text("\n".join(f"{a} {b}" for a, b in paths))
    return mf, paths


def test_read_ply_many_matches_serial(manifest_files):
    _, paths = manifest_files
    flat = [p for pair in paths for p in pair]
    threaded = read_ply_many(flat, workers=4)
    for p, got in zip(flat, threaded):
        np.testing.assert_array_equal(got["points"], read_ply(p)["points"])


def test_read_ply_many_propagates_error_with_path(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"not a ply at all")
    with pytest.raises(Exception, match="bad.ply"):
        read_ply_many([bad], workers=4)


def test_voxel_downsample_many_matches_serial(manifest_files):
    from tpu3dm.preprocess.voxel import voxel_downsample_host

    _, paths = manifest_files
    clouds = [read_ply(p)["points"] for p, _ in paths]
    threaded = voxel_downsample_many(clouds, 0.3, workers=4)
    for c, got in zip(clouds, threaded):
        want = voxel_downsample_host(c, 0.3)
        np.testing.assert_array_equal(
            np.asarray(got.points), np.asarray(want.points)
        )
        np.testing.assert_array_equal(
            np.asarray(got.mask), np.asarray(want.mask)
        )


@pytest.mark.slow
def test_window_iterator_covers_manifest_and_skips(manifest_files):
    _, paths = manifest_files
    cfg = PipelineConfig.with_voxel_size(0.3).preprocess
    skip = {paths[0][0]}  # pretend pair 0's source is checkpoint-covered
    seen_idxs, seen_paths = [], set()
    for idxs, procs in iter_preprocessed_windows(
        paths, cfg, window=3, workers=2, skip_paths=skip
    ):
        seen_idxs.extend(idxs)
        seen_paths.update(procs.keys())
        for p, proc in procs.items():
            assert int(np.asarray(proc.down.mask).sum()) > 0
    assert seen_idxs == list(range(len(paths)))  # windows of 3 + 1
    assert paths[0][0] not in seen_paths
    assert paths[0][1] in seen_paths


def test_window_iterator_propagates_ingest_error(manifest_files, tmp_path):
    _, paths = manifest_files
    bad = tmp_path / "missing.ply"
    cfg = PipelineConfig.with_voxel_size(0.3).preprocess
    broken = paths[:1] + [(str(bad), paths[0][1])]
    it = iter_preprocessed_windows(broken, cfg, window=1, workers=2)
    next(it)  # first window is fine
    with pytest.raises(Exception, match="missing.ply"):
        for _ in it:
            pass


@pytest.mark.slow
def test_cli_register_batch_windowed_matches_whole(manifest_files, tmp_path):
    """--window N streams ingest but must register every pair with the same
    per-pair key as the whole-manifest mode -> identical transforms."""
    from tpu3dm.apps.cli import main

    mf, paths = manifest_files
    out_whole = tmp_path / "whole.json"
    out_win = tmp_path / "win.json"
    assert main([
        "register-batch", str(mf), "--out", str(out_whole),
        "--ransac-iterations", "512", "--io-workers", "2",
    ]) == 0
    assert main([
        "register-batch", str(mf), "--out", str(out_win),
        "--ransac-iterations", "512", "--window", "3", "--io-workers", "2",
    ]) == 0
    whole = json.loads(out_whole.read_text())
    win = json.loads(out_win.read_text())
    assert len(whole) == len(win) == len(paths)
    for w, v in zip(whole, win):
        np.testing.assert_allclose(
            np.asarray(w["transformation"]),
            np.asarray(v["transformation"]),
            atol=1e-6,
        )
        assert w["ransac_fitness"] > 0.2


@pytest.mark.slow
def test_pair_keys_override_matches_positional_split():
    import jax

    from tpu3dm.preprocess.pipeline import preprocess_points_batch
    from tpu3dm.registration.batch import register_pairs_batched

    cfg = PipelineConfig.with_voxel_size(0.3)
    raw = []
    for s in range(2):
        a, b, _ = make_benchmark_pair(3000, seed=10 + s, sigma=0.005)
        raw.extend([a, b])
    procs = preprocess_points_batch(raw, cfg.preprocess)
    pairs = [(procs[0], procs[1]), (procs[2], procs[3])]
    key = jax.random.PRNGKey(5)
    res_a = register_pairs_batched(pairs, cfg, key=key, ransac_iterations=512)
    keys = np.asarray(jax.random.split(key, 2))
    res_b = register_pairs_batched(
        pairs, cfg, pair_keys=keys, ransac_iterations=512
    )
    np.testing.assert_array_equal(res_a.transforms, res_b.transforms)
    # Per-pair subsetting reproduces pair 1's result: same key -> same
    # hypotheses; tolerance absorbs XLA re-vectorizing the batch=1 dispatch.
    res_c = register_pairs_batched(
        pairs[1:], cfg, pair_keys=keys[1:], ransac_iterations=512
    )
    np.testing.assert_allclose(
        res_a.transforms[1], res_c.transforms[0], atol=1e-5
    )


def test_full_normals_skip_only_affects_full_cloud():
    """full_normals=False must leave the down cloud (what the batch path
    registers) bitwise identical and only drop the full-res normals — the
    dominant ingest cost."""
    from tpu3dm.preprocess.pipeline import preprocess_points_batch

    cfg = PipelineConfig.with_voxel_size(0.3)
    a, b, _ = make_benchmark_pair(4000, seed=0, sigma=0.005)
    with_n = preprocess_points_batch([a, b], cfg.preprocess)
    without = preprocess_points_batch([a, b], cfg.preprocess, full_normals=False)
    for w, wo in zip(with_n, without):
        np.testing.assert_array_equal(
            np.asarray(w.down.features), np.asarray(wo.down.features)
        )
        np.testing.assert_array_equal(
            np.asarray(w.down.normals), np.asarray(wo.down.normals)
        )
        # Skipped full normals stay the zero-filled placeholder.
        assert np.abs(np.asarray(w.full.normals)).sum() > 0
        assert np.abs(np.asarray(wo.full.normals)).sum() == 0
        np.testing.assert_array_equal(
            np.asarray(w.full.points), np.asarray(wo.full.points)
        )
