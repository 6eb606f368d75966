"""ctypes bindings for the C++ host-runtime tier (native/tpu3dm_native.cpp).

The device compute path is JAX/XLA/Pallas; this is the *host* native tier —
fast ingest kernels filling the role Open3D's C++ core plays for the
reference (PLY parsing ply.py:80, voxel downsample ply.py:106).

Everything here is optional: callers use :func:`available` / the ``None``
return of :func:`lib` and fall back to the NumPy implementations, so the
framework runs from a plain checkout.  ``make -C native`` builds the library;
:func:`build` does the same from Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SO = Path(__file__).with_name("libtpu3dm_native.so")
_lib: ctypes.CDLL | None = None
_tried = False

_c_double_p = ctypes.POINTER(ctypes.c_double)


def build(quiet: bool = True) -> bool:
    """Compile the native library (requires g++).  Returns success."""
    src_dir = Path(__file__).resolve().parents[2] / "native"
    if not (src_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(src_dir)],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _SO.exists()


def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None when unavailable.

    Builds on first use when a toolchain is present (disable with
    TPU3DM_NO_NATIVE=1).
    """
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TPU3DM_NO_NATIVE"):
        return None
    if not _SO.exists() and not build():
        return None
    try:
        L = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    L.t3n_parse_floats.restype = ctypes.c_long
    L.t3n_parse_floats.argtypes = [
        ctypes.c_char_p, ctypes.c_long, _c_double_p, ctypes.c_long,
    ]
    L.t3n_voxel_downsample.restype = ctypes.c_long
    L.t3n_voxel_downsample.argtypes = [
        _c_double_p, ctypes.c_long, ctypes.c_double, _c_double_p, ctypes.c_long,
    ]
    L.t3n_extract_xyz.restype = ctypes.c_int
    L.t3n_extract_xyz.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, _c_double_p,
    ]
    L.t3n_cloud_stats.restype = None
    L.t3n_cloud_stats.argtypes = [
        _c_double_p, ctypes.c_long, _c_double_p, _c_double_p, _c_double_p,
    ]
    L.t3n_kd_perm.restype = None
    L.t3n_kd_perm.argtypes = [
        _c_double_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    _lib = L
    return _lib


def available() -> bool:
    return lib() is not None


# ---------------------------------------------------------------------------
# NumPy-facing wrappers
# ---------------------------------------------------------------------------

def parse_floats(buf: bytes, expected: int) -> np.ndarray | None:
    """Parse whitespace-separated numbers; None if native tier unavailable.

    Raises ValueError on malformed input or count mismatch (same contract as
    the NumPy fallback in io/ply.py).
    """
    L = lib()
    if L is None:
        return None
    out = np.empty(expected, dtype=np.float64)
    got = L.t3n_parse_floats(
        buf, len(buf), out.ctypes.data_as(_c_double_p), expected
    )
    if got < 0:
        raise ValueError("malformed numeric token in ASCII payload")
    if got != expected:
        raise ValueError(f"expected {expected} numbers, parsed {got}")
    return out


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray | None:
    """Per-voxel mean downsample; None if native tier unavailable."""
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    out = np.empty((n, 3), dtype=np.float64)
    m = L.t3n_voxel_downsample(
        pts.ctypes.data_as(_c_double_p), n, float(voxel),
        out.ctypes.data_as(_c_double_p), n,
    )
    if m < 0:  # cannot happen: output <= input points
        raise RuntimeError("voxel_downsample capacity overflow")
    return out[:m].copy()


def extract_xyz(
    buf: bytes, count: int, stride: int, offsets, types, swap: bool
) -> np.ndarray | None:
    """Strided xyz extraction from a binary PLY vertex block.

    ``types``: per-column 0=float32 / 1=float64.  None when unavailable.
    """
    L = lib()
    if L is None:
        return None
    out = np.empty((count, 3), dtype=np.float64)
    offs = (ctypes.c_long * 3)(*offsets)
    tys = (ctypes.c_int * 3)(*types)
    rc = L.t3n_extract_xyz(
        buf, count, stride, offs, tys, 1 if swap else 0,
        out.ctypes.data_as(_c_double_p),
    )
    if rc != 0:
        raise RuntimeError("t3n_extract_xyz failed")
    return out


def kd_perm(points: np.ndarray, block: int) -> np.ndarray | None:
    """KD-partition permutation (ops/nn_sparse.py semantics); None when the
    native tier is unavailable."""
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    out = np.empty(n, dtype=np.int64)
    L.t3n_kd_perm(
        pts.ctypes.data_as(_c_double_p), n, int(block),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out


def cloud_stats(points: np.ndarray):
    """(lo[3], hi[3], centroid[3]) via the threaded native pass, or None."""
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    lo = np.empty(3); hi = np.empty(3); c = np.empty(3)
    L.t3n_cloud_stats(
        pts.ctypes.data_as(_c_double_p), pts.shape[0],
        lo.ctypes.data_as(_c_double_p), hi.ctypes.data_as(_c_double_p),
        c.ctypes.data_as(_c_double_p),
    )
    return lo, hi, c
