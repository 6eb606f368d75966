"""TCP JSON-lines front-end for the serving engine.

Protocol: one JSON object per line in each direction (newline-delimited —
trivially scriptable with netcat, no framing library needed on TPU hosts).

Requests:
  {"op": "ping"}
  {"op": "stats"}
  {"op": "register", "id": "r1",
   "source": {"path": "a.ply"} | {"points": [[x,y,z],...]} |
             {"points_b64": "<base64 float32 LE [n,3]>", "n": 123},
   "target": {...}}

Responses (always one line, always with "ok"):
  {"ok": true, "id": "r1", "transformation": [[...4x4...]],
   "fitness": 0.91, "inlier_rmse": 0.02, "bucket": 768, "latency_ms": 12.3}
  {"ok": false, "id": "r1", "error": "..."}

Concurrency model: thread per connection (stdlib ThreadingTCPServer); every
connection's requests feed ONE shared ``ServeEngine``, so concurrent clients
coalesce into shared device dispatches — that cross-request batching is the
point of the server (engine.py).  Repeated ``path`` sources hit a host-side
LRU of preprocessed clouds (dental-scan serving reuses one target model
against a stream of scans, so the cache converts the steady-state cost to
pure registration).

The preprocessing of cache-missing paths/inline clouds runs on the handler
thread: the parse is native C (GIL released) and the feature stage is one
device dispatch, so connections overlap on host while the engine batches on
device.
"""

from __future__ import annotations

import base64
import json
import socketserver
import threading
from collections import OrderedDict
from pathlib import Path

import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.preprocess.pipeline import ProcessedCloud
from tpu3dm.serve.engine import ServeConfig, ServeEngine
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)


class _CloudCache:
    """Thread-safe LRU of path -> ProcessedCloud."""

    def __init__(self, capacity: int) -> None:
        self.capacity = capacity
        self._d: OrderedDict[str, ProcessedCloud] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> ProcessedCloud | None:
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                self.hits += 1
                return self._d[key]
            self.misses += 1
            return None

    def put(self, key: str, value: ProcessedCloud) -> None:
        if self.capacity <= 0:
            return
        with self._lock:
            self._d[key] = value
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)


def _decode_points(spec: dict) -> np.ndarray:
    if "points" in spec:
        pts = np.asarray(spec["points"], np.float32)
    elif "points_b64" in spec:
        raw = base64.b64decode(spec["points_b64"])
        pts = np.frombuffer(raw, dtype="<f4").reshape(-1, 3).copy()
        if "n" in spec and int(spec["n"]) != pts.shape[0]:
            raise ValueError(
                f"points_b64 declares n={spec['n']} but decodes to {pts.shape[0]}"
            )
    else:
        raise ValueError("cloud spec needs 'path', 'points', or 'points_b64'")
    if pts.ndim != 2 or pts.shape[1] != 3 or pts.shape[0] == 0:
        raise ValueError(f"points must be a non-empty [n, 3] array, got {pts.shape}")
    if not np.isfinite(pts).all():
        raise ValueError("points contain NaN/Inf")
    return pts


class RegistrationServer:
    """Own an engine + TCP listener; ``serve_forever`` or use as a context
    manager (tests bind port 0 and read back the real port)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 8421,
        *,
        pipeline: PipelineConfig | None = None,
        serve: ServeConfig = ServeConfig(),
        cache_size: int = 64,
        mesh=None,
    ) -> None:
        self.engine = ServeEngine(pipeline, serve, mesh=mesh)
        self.cache = _CloudCache(cache_size)
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:  # noqa: D102 - protocol loop
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    line = line.strip()
                    if not line:
                        continue
                    resp = outer._handle_line(line)
                    self.wfile.write(json.dumps(resp).encode() + b"\n")
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._tcp = Server((host, port), Handler)
        self.host, self.port = self._tcp.server_address[:2]

    # -- request handling ---------------------------------------------------

    def _resolve_cloud(self, spec: dict) -> ProcessedCloud:
        if not isinstance(spec, dict):
            raise ValueError("cloud spec must be an object")
        if "path" in spec:
            key = str(Path(spec["path"]).resolve())
            hit = self.cache.get(key)
            if hit is not None:
                return hit
            from tpu3dm.io.ply import read_ply

            pts = np.asarray(read_ply(spec["path"])["points"], np.float32)
        else:
            key = None
            pts = _decode_points(spec)
        from tpu3dm.preprocess.pipeline import preprocess_points_batch

        proc = preprocess_points_batch(
            [pts], self.engine.pipeline.preprocess, full_normals=False
        )[0]
        if key is not None:
            self.cache.put(key, proc)
        return proc

    def _handle_line(self, line: bytes) -> dict:
        rid = None
        try:
            req = json.loads(line)
            rid = req.get("id")
            op = req.get("op", "register")
            if op == "ping":
                return {"ok": True, "id": rid, "op": "ping"}
            if op == "stats":
                st = self.engine.stats()
                st["cloud_cache"] = {
                    "hits": self.cache.hits,
                    "misses": self.cache.misses,
                }
                return {"ok": True, "id": rid, "stats": st}
            if op != "register":
                raise ValueError(f"unknown op: {op!r}")
            src = self._resolve_cloud(req["source"])
            tgt = self._resolve_cloud(req["target"])
            r = self.engine.register(src, tgt)
            return {
                "ok": True,
                "id": rid,
                "transformation": np.asarray(r.transformation).tolist(),
                "fitness": r.fitness,
                "inlier_rmse": r.inlier_rmse,
                "bucket": r.bucket,
                "latency_ms": r.latency_ms,
            }
        except Exception as e:  # noqa: BLE001 - reported to the client
            logger.warning("request failed: %s", e)
            return {"ok": False, "id": rid, "error": f"{type(e).__name__}: {e}"}

    # -- lifecycle ----------------------------------------------------------

    def serve_forever(self) -> None:
        logger.info("registration server listening on %s:%d", self.host, self.port)
        self._tcp.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(
            target=self._tcp.serve_forever, name="tpu3dm-serve-tcp", daemon=True
        )
        t.start()
        return t

    def close(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()
        self.engine.close()

    def __enter__(self) -> "RegistrationServer":
        self.start_background()
        return self

    def __exit__(self, *exc) -> None:
        self.close()
