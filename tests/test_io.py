"""PLY/STL IO round trips and PointCloud container behaviour."""

import numpy as np
import pytest

from tpu3dm.core import cloud as cloudlib
from tpu3dm.io import ply as plyio
from tpu3dm.io import stl as stlio
from tpu3dm.io.synthetic import dental_arch_cloud, make_benchmark_pair


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    pts = np.random.default_rng(0).uniform(-2, 2, size=(257, 3))
    nrm = np.random.default_rng(1).normal(size=(257, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    path = tmp_path / "cloud.ply"
    plyio.write_ply(path, pts, normals=nrm, binary=binary)
    data = plyio.read_ply(path)
    np.testing.assert_allclose(data["points"], pts, atol=1e-12 if binary else 1e-9)
    np.testing.assert_allclose(data["normals"], nrm, atol=1e-12 if binary else 1e-9)


def test_ply_colors_roundtrip(tmp_path):
    pts = np.zeros((10, 3))
    colors = np.linspace(0, 1, 30).reshape(10, 3)
    path = tmp_path / "c.ply"
    plyio.write_ply(path, pts, colors=colors)
    data = plyio.read_ply(path)
    np.testing.assert_allclose(data["colors"], colors, atol=1 / 255.0)


def test_ply_float32_ascii(tmp_path):
    """Hand-written ASCII file with float properties and a comment."""
    path = tmp_path / "h.ply"
    path.write_text(
        "ply\nformat ascii 1.0\ncomment hi\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 1 2\n3.5 -4 5e-1\n"
    )
    data = plyio.read_ply(path)
    np.testing.assert_allclose(data["points"], [[0, 1, 2], [3.5, -4, 0.5]])


def test_ply_empty_rejected(tmp_path):
    path = tmp_path / "e.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 0\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    with pytest.raises(ValueError, match="empty"):
        plyio.read_ply(path)


def test_ply_not_a_ply(tmp_path):
    path = tmp_path / "x.ply"
    path.write_bytes(b"not a ply file")
    with pytest.raises(plyio.PlyError):
        plyio.read_ply(path)


def test_ply_with_faces_skipped(tmp_path):
    """Vertex + face elements: faces must be skipped cleanly (binary)."""
    import struct

    pts = np.arange(9, dtype="<f4").reshape(3, 3)
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
    )
    with open(tmp_path / "f.ply", "wb") as f:
        f.write(header.encode())
        f.write(pts.tobytes())
        f.write(struct.pack("<B3i", 3, 0, 1, 2))
    data = plyio.read_ply(tmp_path / "f.ply")
    np.testing.assert_allclose(data["points"], pts)


def test_stl_binary_roundtrip(tmp_path):
    """Write a minimal binary STL by hand; vertices dedupe like trimesh."""
    import struct

    tris = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],  # shares 2 vertices
        ],
        dtype="<f4",
    )
    path = tmp_path / "m.stl"
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, dtype="<f4").tobytes())
            f.write(t.tobytes())
            f.write(struct.pack("<H", 0))
    mesh = stlio.read_stl(path)
    assert mesh["vertices"].shape == (4, 3)  # 6 corners, 4 unique
    assert mesh["triangles"].shape == (2, 3)


def test_stl_ascii(tmp_path):
    path = tmp_path / "a.stl"
    path.write_text(
        "solid test\n"
        " facet normal 0 0 1\n  outer loop\n"
        "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
        "  endloop\n endfacet\nendsolid test\n"
    )
    mesh = stlio.read_stl(path)
    assert mesh["vertices"].shape == (3, 3)


def test_pointcloud_padding_and_transform():
    pts = dental_arch_cloud(500, seed=0)
    pc = cloudlib.from_numpy(pts)
    assert pc.capacity >= 500 and pc.capacity % 256 == 0
    assert int(pc.count) == 500
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    import jax.numpy as jnp

    moved = pc.transform(jnp.asarray(T, dtype=jnp.float32))
    got = cloudlib.to_numpy(moved)["points"]
    np.testing.assert_allclose(got, pts + np.array([1, 2, 3]), atol=1e-4)
    # padding rows stay zero
    assert float(np.abs(np.asarray(moved.points)[500:]).sum()) == 0.0


def test_pointcloud_empty_rejected():
    with pytest.raises(ValueError):
        cloudlib.from_numpy(np.zeros((0, 3)))


def test_benchmark_pair_ground_truth():
    src, tgt, T = make_benchmark_pair(2000, seed=3)
    moved = src @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(moved, tgt, atol=1e-9)


def test_ply_truncated_binary(tmp_path):
    """Binary payload shorter than the header promises must raise."""
    from tpu3dm.io.ply import PlyError, read_ply, write_ply

    p = tmp_path / "t.ply"
    pts = np.random.default_rng(0).uniform(-1, 1, (100, 3))
    write_ply(p, pts, binary=True)
    data = p.read_bytes()
    p.write_bytes(data[: len(data) - 37])
    with pytest.raises(PlyError):
        read_ply(p)


def test_ply_big_endian(tmp_path):
    """binary_big_endian files parse correctly."""
    from tpu3dm.io.ply import read_ply

    pts = np.array([[1.5, -2.0, 3.25], [0.0, 4.0, -1.0]])
    header = (
        "ply\nformat binary_big_endian 1.0\nelement vertex 2\n"
        "property double x\nproperty double y\nproperty double z\nend_header\n"
    )
    p = tmp_path / "be.ply"
    p.write_bytes(header.encode() + pts.astype(">f8").tobytes())
    back = read_ply(p)["points"]
    np.testing.assert_allclose(back, pts)


def test_ply_garbage_bytes(tmp_path):
    """Random bytes with a .ply extension must raise, not crash."""
    from tpu3dm.io.ply import PlyError, read_ply

    p = tmp_path / "junk.ply"
    p.write_bytes(bytes(range(256)) * 16)
    with pytest.raises((PlyError, ValueError)):
        read_ply(p)


def test_stl_binary_starting_with_solid(tmp_path):
    """Some binary STL exporters start with 'solid' — size equation must win."""
    from tpu3dm.io.stl import read_stl

    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    rec = np.zeros(1, dtype=[("normal", "<f4", 3), ("verts", "<f4", (3, 3)), ("attr", "<u2")])
    rec["verts"] = tri
    header = b"solid binary-exporter" + b" " * 59
    p = tmp_path / "s.stl"
    p.write_bytes(header + np.uint32(1).tobytes() + rec.tobytes())
    out = read_stl(p)
    assert out["triangles"].shape == (1, 3)
    assert out["vertices"].shape[0] == 3


def test_ascii_ply_scientific_notation(tmp_path):
    """Native parser must handle exponents and mixed whitespace."""
    from tpu3dm.io.ply import read_ply

    header = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    p = tmp_path / "sci.ply"
    p.write_text(header + "1e-3\t-2.5E2 4\n0.125 3e4\t-1\n")
    back = read_ply(p)["points"]
    np.testing.assert_allclose(back, [[1e-3, -250.0, 4.0], [0.125, 3e4, -1.0]])
