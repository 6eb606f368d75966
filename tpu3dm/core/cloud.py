"""Point-cloud container: a padded, masked JAX pytree.

TPU-native replacement for the reference's Open3D-backed ``Ply`` wrapper
(reference: src/ply/ply.py:20-135).  Where the reference holds mutable Open3D
``PointCloud`` objects whose sizes change at runtime, XLA wants *static shapes*:
every cloud is padded to a bucket size and carries a validity mask so that a
single compiled program serves many cloud sizes without recompilation.

Design notes (TPU-first):
  - ``points`` is ``[N, 3] float32`` with rows beyond ``mask`` zeroed (padding
    rows are placed at a large sentinel coordinate by helpers that need them to
    never win a nearest-neighbour race).
  - All derived attributes (normals, features) share the same padding layout so
    one mask threads through every kernel.
  - The structure is a registered dataclass pytree: it vmaps, shards, and jits.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Coordinate used for padding rows where "infinitely far away" semantics are
# needed (e.g. nearest-neighbour queries must never select a padding row).
PAD_SENTINEL = 1.0e9


def round_up(n: int, multiple: int) -> int:
    """Round ``n`` up to the next multiple of ``multiple``."""
    return ((n + multiple - 1) // multiple) * multiple


def bucket_size(n: int, multiple: int = 256) -> int:
    """Pick a padded size for ``n`` points.

    Power-of-two-ish bucketing keeps the number of distinct compiled programs
    small when many differently-sized clouds flow through the same jitted
    pipeline (the reference never needed this because nothing was compiled).
    """
    if n <= multiple:
        return multiple
    # Next power of two, but never more than 2x overhead past `multiple` grid.
    p = 1 << (int(n - 1).bit_length())
    # Refine: allow 1.25x steps between powers of two to cap padding waste.
    for frac in (p // 2 + p // 4, p // 2 + p // 2):
        cand = round_up(frac, multiple)
        if cand >= n:
            return cand
    return round_up(p, multiple)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["points", "mask", "normals", "features"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Padded point cloud.

    Attributes:
      points:   ``[N, 3] float32`` positions; padding rows are zero.
      mask:     ``[N] bool`` — True for real points.
      normals:  ``[N, 3] float32`` unit normals or zeros if absent.
      features: ``[N, F] float32`` per-point features (FPFH: F=33) or
                zero-width ``[N, 0]`` if absent.
    """

    points: jax.Array
    mask: jax.Array
    normals: jax.Array
    features: jax.Array

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def count(self) -> jax.Array:
        """Number of real points (traced value)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    @property
    def feature_dim(self) -> int:
        return int(self.features.shape[-1])

    # ---- functional updates -------------------------------------------------

    def with_(self, **kw) -> "PointCloud":
        return dataclasses.replace(self, **kw)

    def transform(self, T: jax.Array) -> "PointCloud":
        """Apply a 4x4 rigid transform to points (and rotate normals)."""
        R = T[:3, :3]
        t = T[:3, 3]
        pts = jnp.where(self.mask[:, None], self.points @ R.T + t, 0.0)
        nrm = self.normals
        if nrm.shape[-1] == 3:
            nrm = jnp.where(self.mask[:, None], nrm @ R.T, 0.0)
        return self.with_(points=pts, normals=nrm)

    def centroid(self) -> jax.Array:
        """Mask-aware centroid ``[3]``."""
        m = self.mask.astype(self.points.dtype)[:, None]
        denom = jnp.maximum(jnp.sum(m), 1.0)
        return jnp.sum(self.points * m, axis=0) / denom

    def sentinel_points(self) -> jax.Array:
        """Points with padding rows pushed to PAD_SENTINEL (for NN queries)."""
        return jnp.where(self.mask[:, None], self.points, PAD_SENTINEL)


def from_numpy(
    points: np.ndarray,
    *,
    normals: np.ndarray | None = None,
    features: np.ndarray | None = None,
    capacity: int | None = None,
    pad_multiple: int = 256,
    host: bool = False,
) -> PointCloud:
    """Build a padded PointCloud from host arrays.

    Host-side (un-jitted) constructor: pads to a bucketed capacity so repeated
    calls with similar sizes hit the same compiled programs downstream.

    ``host=True`` keeps the leaves as NumPy arrays: jit call boundaries
    upload them on first dispatch, so host-side consumers (valid counts,
    compaction, re-bucketing) read them for free instead of paying a
    device round trip (~25 ms each through the axon tunnel).
    """
    points = np.asarray(points, dtype=np.float32)
    if points.ndim != 2 or points.shape[1] != 3:
        raise ValueError(f"points must be [N,3], got {points.shape}")
    n = points.shape[0]
    if n == 0:
        raise ValueError("Point cloud is empty")  # parity: ply.py:81-84
    cap = capacity if capacity is not None else bucket_size(n, pad_multiple)
    if cap < n:
        raise ValueError(f"capacity {cap} < point count {n}")

    def pad(a: np.ndarray | None, width: int) -> np.ndarray:
        if a is None:
            return np.zeros((cap, width), dtype=np.float32)
        a = np.asarray(a, dtype=np.float32)
        out = np.zeros((cap, a.shape[1]), dtype=np.float32)
        out[:n] = a
        return out

    mask = np.zeros((cap,), dtype=bool)
    mask[:n] = True
    if host:
        return PointCloud(
            points=pad(points, 3),
            mask=mask,
            normals=pad(normals, 3),
            features=pad(features, 0),
        )
    return PointCloud(
        points=jnp.asarray(pad(points, 3)),
        mask=jnp.asarray(mask),
        normals=jnp.asarray(pad(normals, 3)),
        features=jnp.asarray(pad(features, 0)),
    )


def to_numpy(pc: PointCloud) -> dict[str, np.ndarray]:
    """Strip padding and return host arrays."""
    mask = np.asarray(pc.mask)
    out = {"points": np.asarray(pc.points)[mask]}
    if pc.normals.shape[-1] == 3 and np.any(np.asarray(pc.normals)):
        out["normals"] = np.asarray(pc.normals)[mask]
    if pc.features.shape[-1] > 0:
        out["features"] = np.asarray(pc.features)[mask]
    return out
