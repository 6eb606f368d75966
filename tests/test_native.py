"""Native host-runtime tier (native/tpu3dm_native.cpp via ctypes).

Each native kernel is checked against its NumPy oracle; everything skips
cleanly when no toolchain is available (the framework must run pure-Python).
"""

import numpy as np
import pytest

from tpu3dm import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_parse_floats_basic():
    out = native.parse_floats(b"  1.5 -2e3\n3.25\t4 ", 4)
    np.testing.assert_allclose(out, [1.5, -2000.0, 3.25, 4.0])


def test_parse_floats_malformed():
    with pytest.raises(ValueError):
        native.parse_floats(b"1.0 abc 2.0", 3)


def test_parse_floats_truncated():
    with pytest.raises(ValueError):
        native.parse_floats(b"1.0 2.0", 3)


def test_voxel_downsample_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-5.0, 5.0, size=(20_000, 3))
    got = native.voxel_downsample(pts, 0.4)

    lo = pts.min(axis=0)
    ijk = np.floor((pts - lo) / 0.4).astype(np.int64)
    _, inverse, counts = np.unique(ijk, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.shape[0], 3))
    np.add.at(sums, inverse, pts)
    ref = sums / counts[:, None]

    assert got.shape == ref.shape
    # Same lexicographic (i,j,k) output order as np.unique(axis=0).
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_voxel_downsample_single_voxel():
    pts = np.full((100, 3), 0.25) + np.random.default_rng(0).normal(0, 1e-4, (100, 3))
    got = native.voxel_downsample(pts, 10.0)
    assert got.shape == (1, 3)
    np.testing.assert_allclose(got[0], pts.mean(axis=0), atol=1e-9)


def test_extract_xyz_strided_f4():
    rec = np.zeros(64, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("c", "u1")])
    rec["x"] = np.arange(64)
    rec["y"] = np.arange(64) * 2.0
    rec["z"] = np.arange(64) * 3.0
    got = native.extract_xyz(rec.tobytes(), 64, rec.itemsize, [0, 4, 8], [0, 0, 0], False)
    np.testing.assert_allclose(got[:, 1], np.arange(64) * 2.0)


def test_extract_xyz_f8_bigendian():
    rec = np.zeros(8, dtype=[("x", ">f8"), ("y", ">f8"), ("z", ">f8")])
    rec["x"] = np.arange(8) + 0.5
    rec["y"] = -np.arange(8)
    rec["z"] = np.arange(8) * 0.125
    got = native.extract_xyz(rec.tobytes(), 8, 24, [0, 8, 16], [1, 1, 1], True)
    np.testing.assert_allclose(got[:, 0], np.arange(8) + 0.5)
    np.testing.assert_allclose(got[:, 2], np.arange(8) * 0.125)


def test_cloud_stats_threaded():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100_000, 3))
    lo, hi, c = native.cloud_stats(pts)
    np.testing.assert_allclose(lo, pts.min(axis=0))
    np.testing.assert_allclose(hi, pts.max(axis=0))
    np.testing.assert_allclose(c, pts.mean(axis=0), atol=1e-9)


def test_ascii_ply_roundtrip_uses_native(tmp_path):
    """End to end: ASCII PLY write -> read goes through the native parser."""
    from tpu3dm.io.ply import read_ply, write_ply

    pts = np.random.default_rng(1).uniform(-1, 1, (500, 3))
    p = tmp_path / "cloud.ply"
    write_ply(p, pts, binary=False)
    back = read_ply(p)
    np.testing.assert_allclose(back["points"], pts, atol=1e-12)
