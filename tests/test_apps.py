"""CLI subcommands, crashtest suite, viz exports, crop, trace."""

import json

import numpy as np
import pytest

from tpu3dm.io.ply import read_ply, write_ply
from tpu3dm.io.synthetic import dental_arch_cloud, make_benchmark_pair


@pytest.fixture(scope="module")
def small_pair_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clouds")
    src, tgt, T = make_benchmark_pair(4000, seed=1, sigma=0.005)
    write_ply(d / "src.ply", src)
    write_ply(d / "tgt.ply", tgt)
    return d / "src.ply", d / "tgt.ply", T


def test_cli_register_files(small_pair_files, tmp_path, capsys):
    from tpu3dm.apps.cli import main

    src, tgt, T = small_pair_files
    rc = main([
        "register", str(src), str(tgt),
        "--out-ply", str(tmp_path / "reg.ply"),
        "--out-html", str(tmp_path / "reg.html"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["icp"]["fitness"] > 0.8
    T_est = np.asarray(out["transformation"])
    np.testing.assert_allclose(T_est[:3, :3], T[:3, :3], atol=0.05)
    # artifacts exist and parse
    data = read_ply(tmp_path / "reg.ply")
    assert "colors" in data
    html = (tmp_path / "reg.html").read_text()
    assert "canvas" in html and "DATA" in html


@pytest.mark.slow
def test_cli_register_large_honors_flags(small_pair_files, tmp_path, capsys):
    """--large must honor --out-ply/--out-html/--restarts (VERDICT r1 item 8:
    these flags were silently dropped on the large path)."""
    from tpu3dm.apps.cli import main

    src, tgt, T = small_pair_files
    rc = main([
        "register", str(src), str(tgt), "--large", "--restarts", "1",
        "--out-ply", str(tmp_path / "lg.ply"),
        "--out-html", str(tmp_path / "lg.html"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["path"] == "large"
    assert out["icp"]["fitness"] > 0.8
    T_est = np.asarray(out["transformation"])
    np.testing.assert_allclose(T_est[:3, :3], T[:3, :3], atol=0.05)
    data = read_ply(tmp_path / "lg.ply")
    assert "colors" in data
    assert "canvas" in (tmp_path / "lg.html").read_text()


def test_cli_convert_stl(tmp_path):
    import struct

    from tpu3dm.apps.cli import main

    tris = np.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[1, 0, 0], [1, 1, 0], [0, 1, 0]]],
        dtype="<f4",
    )
    stl = tmp_path / "m.stl"
    with open(stl, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, dtype="<f4").tobytes())
            f.write(t.tobytes())
            f.write(struct.pack("<H", 0))
    rc = main(["convert", str(stl), str(tmp_path / "m.ply")])
    assert rc == 0
    data = read_ply(tmp_path / "m.ply")
    assert data["points"].shape == (4, 3)


def test_cli_trim_fraction(tmp_path):
    from tpu3dm.apps.cli import main

    pts = dental_arch_cloud(2000, seed=0)
    write_ply(tmp_path / "c.ply", pts)
    rc = main([
        "trim", str(tmp_path / "c.ply"), str(tmp_path / "t.ply"),
        "--fraction", "0.5", "--axis", "0",
    ])
    assert rc == 0
    out = read_ply(tmp_path / "t.ply")
    assert 0 < out["points"].shape[0] < 2000
    assert out["points"][:, 0].max() <= pts[:, 0].min() + 0.51 * (
        pts[:, 0].max() - pts[:, 0].min()
    )


def test_cli_trim_empty_falls_back(tmp_path):
    from tpu3dm.apps.cli import main

    pts = dental_arch_cloud(500, seed=0)
    write_ply(tmp_path / "c.ply", pts)
    rc = main([
        "trim", str(tmp_path / "c.ply"), str(tmp_path / "t.ply"),
        "--bounds", "1e6", "2e6", "1e6", "2e6", "1e6", "2e6",
    ])
    assert rc == 0
    out = read_ply(tmp_path / "t.ply")
    assert out["points"].shape[0] == 500  # original written back (trim_ply.py:26-36)


def test_cli_trace(small_pair_files, tmp_path):
    from tpu3dm.apps.cli import main

    src, tgt, _ = small_pair_files
    out = tmp_path / "trace.jsonl"
    rc = main([
        "trace", str(src), str(tgt),
        "--noise-ratio", "1.0", "--update-interval", "128",
        "--out", str(out),
    ])
    assert rc == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) >= 1
    # Loose floor: this asserts the trace machinery works, not match quality
    # (capped Open3D-parity FPFH lands ~0.20 on this noisy pair).
    assert rows[-1]["best_fitness"] > 0.15
    # best fitness is monotonically nondecreasing
    bests = [r["best_fitness"] for r in rows]
    assert all(b2 >= b1 for b1, b2 in zip(bests, bests[1:]))


def test_crashtest_suite_passes():
    from tpu3dm.apps.crashtest import run_all_crash_tests

    results = run_all_crash_tests()
    failed = [r.name for r in results if not r.passed]
    assert not failed, f"crash tests failed: {failed}"


def test_cli_multiway(tmp_path):
    from tpu3dm.apps.cli import main

    base = dental_arch_cloud(4000, seed=2)
    rng = np.random.default_rng(0)
    files = []
    for k in range(3):
        jitter = rng.uniform(-0.05, 0.05, 3)
        write_ply(tmp_path / f"c{k}.ply", base + jitter)
        files.append(str(tmp_path / f"c{k}.ply"))
    rc = main(["multiway", *files, "--out", str(tmp_path / "poses.json")])
    assert rc == 0
    poses = json.loads((tmp_path / "poses.json").read_text())
    assert len(poses["poses"]) == 3
    assert min(poses["edge_fitness"]) > 0.5


@pytest.mark.slow
def test_multiway_benchmark_smoke(tmp_path):
    """Structure check at tiny scale (quality is validated at the real
    20k-point config by the committed artifact — small arches can
    mis-register due to shape symmetry, so no quality gate here)."""
    from tpu3dm.apps.benchmark import run_multiway_benchmark

    out = tmp_path / "mw.json"
    r = run_multiway_benchmark(3, n_points=6000, out_json=str(out))
    assert set(r) >= {"warm_s", "edges_per_sec", "rot_err_deg_mean",
                      "rot_err_deg_max", "min_edge_fitness"}
    assert r["edges_per_sec"] > 0
    assert json.loads(out.read_text())["config"]["n_clouds"] == 3


def test_cli_trace_animation(small_pair_files, tmp_path):
    """--out-anim: animated replay (reference GUI animation analog) with one
    frame per trace row, each carrying that chunk's best transform."""
    from tpu3dm.apps.cli import main

    src, tgt, _ = small_pair_files
    out = tmp_path / "tr.jsonl"
    anim = tmp_path / "anim.html"
    rc = main([
        "trace", str(src), str(tgt), "--update-interval", "256",
        "--out", str(out), "--out-anim", str(anim),
    ])
    assert rc == 0
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert all("best_T" in r for r in rows)
    # every best_T is a valid rigid transform (orthonormal rotation block)
    T_last = np.asarray(rows[-1]["best_T"])
    R = T_last[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    html = anim.read_text()
    assert '"frames"' in html and "scrub" in html
    assert html.count('"T"') == len(rows)


def test_cli_info(capsys):
    from tpu3dm.apps.cli import main

    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["device_count"] >= 1
    assert out["native_tier"] == "loaded"
    assert out["default_matmul_precision"] == "highest"


@pytest.mark.slow
def test_overlap_benchmark_smoke(tmp_path):
    """Overlap sweep runs end-to-end; full overlap must register reliably."""
    from tpu3dm.apps.benchmark import run_overlap_benchmark

    out = tmp_path / "overlap.json"
    r = run_overlap_benchmark(
        (1.0, 0.6), n_points=3000, seeds=4,
        ransac_iterations=512, rescue_restarts=1, out_json=str(out),
    )
    assert out.exists()
    full = r["rows"][0]
    assert full["overlap"] == 1.0
    assert full["plain"]["success_rate_2deg"] == 1.0, full
    assert full["rescue"]["success_rate_2deg"] == 1.0, full


def test_cli_bench_forwards_all_phase_flags():
    """`tpu3dm bench` must forward every phase flag to the benchmark parser
    (a dropped flag silently runs the wrong benchmark)."""
    from tpu3dm.apps.cli import _reargs, build_parser

    ap = build_parser()
    a = ap.parse_args(
        ["bench", "--serve", "5", "--serve-clients", "2", "--multiway", "4",
         "--fpfh-ab", "--overlap-sweep", "--scaling-model", "--track-memory"]
    )
    out = _reargs(a)
    for flag in ("--serve", "--multiway", "--fpfh-ab", "--overlap-sweep",
                 "--scaling-model", "--track-memory", "--serve-clients",
                 "--serve-distinct"):
        assert flag in out, (flag, out)
    # and the forwarded list must itself parse cleanly
    from tpu3dm.apps.benchmark import add_args
    import argparse

    bp = argparse.ArgumentParser()
    add_args(bp)
    bp.parse_args(out)
