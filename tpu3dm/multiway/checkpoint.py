"""Checkpoint/resume for multi-way registration runs.

The reference has no checkpointing (SURVEY.md §5.4 — nearest analog is its
benchmark_results.txt persistence, profiler.py:233-241).  Multi-way runs over
many pairs are long; this store makes them resumable: every completed pairwise
edge registration is persisted as one ``.npz`` (transform, fitness, rmse,
iterations) plus a JSON manifest, and the final pose-graph solution is saved
alongside.  Writes are atomic (tmp + rename) so an interrupted run never
leaves a torn edge file.

Layout of a checkpoint directory:

    manifest.json            run metadata: n_clouds, edge list, voxel size
    edge_0003_0004.npz       per-edge PairRegistration essentials
    poses.npz                final [N,4,4] poses (written once at the end)
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import numpy as np


@dataclasses.dataclass(frozen=True)
class EdgeRecord:
    """Persisted essentials of one pairwise registration."""

    transformation: np.ndarray  # [4,4]
    fitness: float
    inlier_rmse: float
    iterations: int


class CheckpointStore:
    """Per-edge npz store under one directory."""

    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    # ---- edges -------------------------------------------------------------

    def _edge_path(self, i: int, j: int) -> Path:
        return self.dir / f"edge_{i:04d}_{j:04d}.npz"

    def get_edge(self, i: int, j: int) -> EdgeRecord | None:
        p = self._edge_path(i, j)
        if not p.exists():
            return None
        try:
            with np.load(p) as z:
                return EdgeRecord(
                    transformation=z["transformation"],
                    fitness=float(z["fitness"]),
                    inlier_rmse=float(z["inlier_rmse"]),
                    iterations=int(z["iterations"]),
                )
        except (OSError, KeyError, ValueError):
            # Torn/corrupt file: treat as absent; it will be recomputed.
            return None

    def put_edge(self, i: int, j: int, rec: EdgeRecord) -> None:
        p = self._edge_path(i, j)
        # tmp name must end in .npz: np.savez appends the suffix otherwise,
        # which would break the atomic rename.
        tmp = p.with_name(p.stem + ".tmp.npz")
        np.savez(
            tmp,
            transformation=np.asarray(rec.transformation, np.float64),
            fitness=np.float64(rec.fitness),
            inlier_rmse=np.float64(rec.inlier_rmse),
            iterations=np.int64(rec.iterations),
        )
        os.replace(tmp, p)

    def completed_edges(self) -> list[tuple[int, int]]:
        out = []
        for p in sorted(self.dir.glob("edge_[0-9]*_[0-9]*.npz")):
            parts = p.stem.split("_")
            if len(parts) != 3 or "." in parts[2]:
                continue  # stray .tmp.npz from an interrupted write
            out.append((int(parts[1]), int(parts[2])))
        return out

    # ---- named pair records (register-batch resume) ------------------------

    @staticmethod
    def _pair_hash(name: str) -> str:
        import hashlib

        return hashlib.sha1(name.encode()).hexdigest()[:16]

    def _pair_path(self, name: str) -> Path:
        return self.dir / f"pair_{self._pair_hash(name)}.npz"

    def get_pair(self, name: str) -> EdgeRecord | None:
        """Record for a name-keyed pair (e.g. 'src.ply\\ttgt.ply') or None.

        Name-keyed (content-hash of the pair's identity) rather than
        index-keyed so re-running with an edited manifest skips exactly the
        pairs that were already registered, regardless of line order.
        """
        p = self._pair_path(name)
        if not p.exists():
            return None
        try:
            with np.load(p) as z:
                return EdgeRecord(
                    transformation=z["transformation"],
                    fitness=float(z["fitness"]),
                    inlier_rmse=float(z["inlier_rmse"]),
                    iterations=int(z["iterations"]),
                )
        except (OSError, KeyError, ValueError):
            return None

    def put_pair(self, name: str, rec: EdgeRecord) -> None:
        p = self._pair_path(name)
        tmp = p.with_name(p.stem + ".tmp.npz")
        np.savez(
            tmp,
            transformation=np.asarray(rec.transformation, np.float64),
            fitness=np.float64(rec.fitness),
            inlier_rmse=np.float64(rec.inlier_rmse),
            iterations=np.int64(rec.iterations),
        )
        os.replace(tmp, p)

    # ---- manifest / poses --------------------------------------------------

    def write_manifest(self, **meta) -> None:
        tmp = self.dir / "manifest.json.tmp"
        tmp.write_text(json.dumps(meta, indent=2, default=str))
        os.replace(tmp, self.dir / "manifest.json")

    def read_manifest(self) -> dict | None:
        p = self.dir / "manifest.json"
        if not p.exists():
            return None
        try:
            return json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    def write_poses(self, poses: np.ndarray) -> None:
        tmp = self.dir / "poses.tmp.npz"
        np.savez(tmp, poses=np.asarray(poses, np.float64))
        os.replace(tmp, self.dir / "poses.npz")

    def read_poses(self) -> np.ndarray | None:
        p = self.dir / "poses.npz"
        if not p.exists():
            return None
        with np.load(p) as z:
            return z["poses"]
