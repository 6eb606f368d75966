"""Headless point-cloud cropping.

Replaces the reference's interactive ``VisualizerWithEditing`` crop
(trim_ply.py:4-41 — shift-drag a box, press C): TPU hosts have no display, so
the crop region is an explicit axis-aligned bounding box or an axis fraction.
Semantics otherwise match: write the cropped cloud, fall back to the original
when the selection is empty (trim_ply.py:26-36).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tpu3dm.io.ply import read_ply, write_ply
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)


def crop_points(
    points: np.ndarray,
    *,
    bounds: list[float] | None = None,
    fraction: float | None = None,
    axis: int = 0,
) -> np.ndarray:
    """Crop by bounding box [xmin,xmax,ymin,ymax,zmin,zmax] or axis fraction."""
    if bounds is not None:
        b = np.asarray(bounds, np.float64).reshape(3, 2)
        keep = np.all((points >= b[:, 0]) & (points <= b[:, 1]), axis=1)
    elif fraction is not None:
        lo = points[:, axis].min()
        hi = points[:, axis].max()
        keep = points[:, axis] <= lo + fraction * (hi - lo)
    else:
        raise ValueError("crop needs bounds or fraction")
    return points[keep]


def crop_file(
    source: str | Path,
    dest: str | Path,
    *,
    bounds: list[float] | None = None,
    fraction: float | None = None,
    axis: int = 0,
) -> int:
    """Crop a PLY file; returns kept-point count.

    Empty selection falls back to writing the original cloud (reference
    behaviour, trim_ply.py:26-36).
    """
    data = read_ply(source)
    cropped = crop_points(data["points"], bounds=bounds, fraction=fraction, axis=axis)
    if cropped.shape[0] == 0:
        logger.warning("crop selected 0 points; writing the original cloud")
        cropped = data["points"]
    write_ply(dest, cropped)
    return int(cropped.shape[0])
