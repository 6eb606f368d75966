"""Profiler + kernel-roofline utility tests.

Covers the reference profiler surface (src/utils/profiler.py:21-278): named
spans as context manager / decorator / profile_block, aggregate stats, report
formats, reset, and the opt-in memory tracking (reference psutil path
:14-18,100-119 — stdlib /proc here).
"""

import json

import numpy as np

from tpu3dm.utils.profiler import (
    Profiler,
    TimingStats,
    device_memory_stats,
    profile,
    profile_block,
)


def setup_function(_fn):
    Profiler.reset()
    Profiler.enable_memory_tracking(False)


def test_span_records_stats():
    for _ in range(3):
        with profile_block("unit/span"):
            pass
    stats = Profiler.get_stats()["unit/span"]
    assert stats.count == 3
    assert stats.total >= 0.0
    assert stats.min <= stats.median <= stats.max


def test_decorator_records_qualname_span():
    @profile()
    def work(x):
        return x + 1

    assert work(1) == 2
    (name,) = [k for k in Profiler.get_stats() if "work" in k]
    assert Profiler.get_stats()[name].count == 1


def test_report_and_json(tmp_path):
    with profile_block("unit/a"):
        pass
    report = Profiler.report()
    assert "unit/a" in report
    p = tmp_path / "spans.json"
    Profiler.save_json(p)
    data = json.loads(p.read_text())
    assert data["unit/a"]["count"] == 1
    txt = tmp_path / "spans.txt"
    Profiler.save_report(txt)
    assert "unit/a" in txt.read_text()


def test_memory_tracking_opt_in():
    Profiler.enable_memory_tracking(True)
    blobs = []
    with profile_block("unit/alloc"):
        blobs.append(np.ones((4_000_000,), np.float64))  # ~32 MB
    stats = Profiler.get_stats()["unit/alloc"]
    assert len(stats.rss_deltas) == 1
    # RSS accounting is noisy; just require the field landed in the dict.
    d = stats.as_dict()
    assert "avg_rss_delta_mb" in d
    # off by default: a new span must not record deltas
    Profiler.enable_memory_tracking(False)
    with profile_block("unit/noalloc"):
        pass
    assert not Profiler.get_stats()["unit/noalloc"].rss_deltas


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    for _dev, d in stats.items():
        assert all(isinstance(v, int) for v in d.values())


def test_timingstats_empty_safe():
    s = TimingStats("empty")
    assert s.avg == 0.0 and s.median == 0.0 and s.min == 0.0 and s.max == 0.0


# --------------------------------------------------------------------------
# kernel roofline cost model (apps/kernelbench.py)
# --------------------------------------------------------------------------


def test_roofline_model_binding_resource():
    from tpu3dm.apps.kernelbench import PEAKS, _nn_case, _score_case

    peaks = PEAKS["tpu"]
    # NN at D=3 is VPU-bound under the model (matmul has only 6 flops/entry).
    nn = _nn_case(65536, 65536, 3, 512, dense=False)
    nn.time_s = 0.1
    r = nn.roofline(peaks)
    assert r["sol_bound"] == "vpu"
    assert 0 < r["pct_of_sol"] <= 100 or r["pct_of_sol"] > 0
    # Scorer contracts over 16 << 128 dims: MXU-tile-throughput-bound.
    sc = _score_case(4096, 4096, 512, dense=True)
    sc.time_s = 0.01
    r2 = sc.roofline(peaks)
    assert r2["sol_bound"] == "mxu"
    assert r2["entries"] == 4096 * 4096
