"""Every example under examples/ must run green (they assert their own
quality gates).  Examples are user-facing documentation; a broken example is
a broken doc."""

import runpy
import sys
from pathlib import Path

import pytest

# Measured CPU-mesh wall times (full-suite --durations, round 4): the
# sharded-mesh and large-cloud examples dominate the whole suite.
_SLOW = {"05_sharded_mesh.py", "04_large_cloud.py", "01_register_pair.py",
         "06_serving.py", "02_register_many_pairs.py", "03_multiway.py",
         "07_streaming.py"}
EXAMPLES = [
    pytest.param(p, marks=[pytest.mark.slow] if p.name in _SLOW else [])
    for p in sorted((Path(__file__).parent.parent / "examples").glob("*.py"))
]


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path, monkeypatch):
    # Examples call main() under __main__; run them the way a user would.
    monkeypatch.setattr(sys, "argv", [str(path)])
    runpy.run_path(str(path), run_name="__main__")
