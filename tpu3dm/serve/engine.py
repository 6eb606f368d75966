"""Request-batching registration serving engine — the online runtime tier.

The fused register step (registration/fused.py) earns its throughput by
amortizing one compiled dispatch over many pairs; a *serving* workload
arrives as independent single-pair requests.  This engine bridges the two
the standard accelerator-serving way (micro-batching):

  - callers ``submit()`` preprocessed pairs from any thread and get a
    ``Future`` back;
  - one dispatcher thread collects requests for at most ``max_delay_ms``
    after the first arrival (or until ``max_batch``), then registers the
    whole group through ``register_pairs_batched`` — capacity-bucketed, pair
    axis padded to a power of two, so steady-state traffic reuses a handful
    of compiled programs;
  - per-request PRNG keys are derived from a monotone sequence number, so a
    request's result does NOT depend on which micro-batch it landed in
    (verified in tests/test_serve.py against a direct batched call).

Role mapping: the reference registers exactly one pair per process run
(src/main.py:26-38) and has no serving story; this is the TPU-native
production counterpart for the "registration as a service" deployment shape
(BASELINE.json's cloud-pairs/s axis, sustained by online traffic instead of
a manifest).  The wire front-end lives in serve/server.py.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future

import numpy as np

from tpu3dm.core.config import PipelineConfig
from tpu3dm.preprocess.pipeline import ProcessedCloud
from tpu3dm.registration.batch import register_pairs_batched
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)

_STOP = object()


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Micro-batching and per-request work knobs."""

    max_batch: int = 256  # pairs per dispatch group (memory/latency bound)
    max_delay_ms: float = 5.0  # linger after the first request of a group
    bucket_multiple: int = 256  # capacity quantum (registration/batch.py)
    ransac_iterations: int = 4096
    icp_iterations: int = 8
    icp_solves_per_nn: int = 2
    approx_score: bool = True
    rescue_restarts: int = 0
    sample_mode: str = "roll"
    # Shared-target fast path: requests whose target is the SAME
    # ProcessedCloud object (e.g. the server's path-cached model) and that
    # form a group of >= target_resident_min are dispatched with the target
    # device-resident (uploaded once per target+capacity, reused across
    # dispatches) and only sources batched — registration/batch.py
    # register_sources_to_target.  0 disables.
    target_resident_min: int = 2


@dataclasses.dataclass
class PairResult:
    """Resolved value of one registration request."""

    transformation: np.ndarray  # [4, 4] target <- source
    fitness: float  # RANSAC inlier fitness
    inlier_rmse: float  # final ICP rmse
    bucket: int  # capacity bucket the pair ran at
    latency_ms: float  # submit -> resolve wall time


@dataclasses.dataclass
class _Pending:
    src: ProcessedCloud
    tgt: ProcessedCloud
    key: np.ndarray  # [2] uint32 per-request PRNG key
    future: Future
    t_submit: float


def _request_key(seq: int) -> np.ndarray:
    """Deterministic [2]-uint32 PRNG key for request number ``seq``.

    Computed host-side (no eager device op — each one is a remote compile on
    the axon backend, docs/STATUS.md) via one splitmix64 round, so keys are
    well-separated for threefry even though sequence numbers are consecutive.
    """
    mask = (1 << 64) - 1
    z = (seq + 0x9E3779B97F4A7C15) & mask
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
    z = z ^ (z >> 31)
    return np.array([z >> 32, z & 0xFFFFFFFF], np.uint32)


class ServeEngine:
    """Thread-safe micro-batching front of the batched registration path.

    Lifecycle: construct, ``submit()``/``register()`` from any number of
    threads, ``close()`` once (drains in-flight requests).  Also usable as a
    context manager.
    """

    def __init__(
        self,
        pipeline: PipelineConfig | None = None,
        serve: ServeConfig = ServeConfig(),
        *,
        mesh=None,
    ) -> None:
        self.pipeline = pipeline or PipelineConfig.with_voxel_size(0.3)
        self.serve = serve
        self.mesh = mesh
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._seq = 0
        self._closed = False
        # stats (guarded by _lock)
        self._n_requests = 0
        self._n_batches = 0
        self._n_errors = 0
        self._n_shared_target = 0  # requests served via the resident path
        self._batch_size_sum = 0
        self._batch_size_max = 0
        self._bucket_counts: dict[int, int] = {}
        self._latencies_ms: deque = deque(maxlen=1024)
        # id(target cloud) -> (cloud ref, ResidentTarget), LRU-ordered; the
        # strong cloud reference pins the id so it cannot be recycled.
        from collections import OrderedDict

        self._residents: "OrderedDict[int, tuple]" = OrderedDict()
        self._thread = threading.Thread(
            target=self._loop, name="tpu3dm-serve-dispatch", daemon=True
        )
        self._thread.start()

    # -- public API ---------------------------------------------------------

    def submit(self, src: ProcessedCloud, tgt: ProcessedCloud) -> Future:
        """Enqueue one pair; returns a ``Future[PairResult]``."""
        with self._lock:
            if self._closed:
                raise RuntimeError("ServeEngine is closed")
            seq = self._seq
            self._seq += 1
            self._n_requests += 1
            item = _Pending(src, tgt, _request_key(seq), Future(), time.monotonic())
            # Enqueue under the lock: outside it, a concurrent close() could
            # drain and exit the dispatcher between our _closed check and the
            # put, stranding this future unresolved forever.
            self._q.put(item)
        return item.future

    def register(
        self, src: ProcessedCloud, tgt: ProcessedCloud, *, timeout: float | None = None
    ) -> PairResult:
        """Blocking convenience wrapper around ``submit``."""
        return self.submit(src, tgt).result(timeout)

    def register_points(
        self,
        src_points: np.ndarray,
        tgt_points: np.ndarray,
        *,
        timeout: float | None = None,
    ) -> PairResult:
        """Preprocess two raw clouds (down-cloud fast path) and register."""
        from tpu3dm.preprocess.pipeline import preprocess_points_batch

        procs = preprocess_points_batch(
            [np.asarray(src_points), np.asarray(tgt_points)],
            self.pipeline.preprocess,
            full_normals=False,
        )
        return self.register(procs[0], procs[1], timeout=timeout)

    def stats(self) -> dict:
        """Counters + latency percentiles for observability endpoints."""
        with self._lock:
            lat = np.asarray(self._latencies_ms, np.float64)
            n_b = self._n_batches
            out = {
                "requests": self._n_requests,
                "batches": n_b,
                "errors": self._n_errors,
                "pending": self._q.qsize(),
                "mean_batch_size": (self._batch_size_sum / n_b) if n_b else 0.0,
                "max_batch_size": self._batch_size_max,
                "shared_target_requests": self._n_shared_target,
                "resident_targets": len(self._residents),
                "buckets": dict(sorted(self._bucket_counts.items())),
            }
        if lat.size:
            out["latency_ms"] = {
                "mean": float(lat.mean()),
                "p50": float(np.percentile(lat, 50)),
                "p95": float(np.percentile(lat, 95)),
                "max": float(lat.max()),
            }
        return out

    def reset_latency_window(self) -> None:
        """Drop accumulated latency samples (e.g. after a warm-up/compile
        window) so ``stats()['latency_ms']`` describes steady state only."""
        with self._lock:
            self._latencies_ms.clear()

    def close(self, *, timeout: float | None = None) -> None:
        """Stop accepting requests, drain the queue, join the dispatcher."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._q.put(_STOP)
        self._thread.join(timeout)

    def __enter__(self) -> "ServeEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- dispatcher ---------------------------------------------------------

    def _collect(self) -> tuple[list[_Pending], bool]:
        """Block for the first request, then linger up to ``max_delay_ms``."""
        first = self._q.get()
        if first is _STOP:
            return [], True
        batch = [first]
        stopping = False
        deadline = time.monotonic() + self.serve.max_delay_ms / 1000.0
        while len(batch) < self.serve.max_batch:
            remain = deadline - time.monotonic()
            if remain <= 0:
                break
            try:
                nxt = self._q.get(timeout=remain)
            except queue.Empty:
                break
            if nxt is _STOP:
                stopping = True
                break
            batch.append(nxt)
        return batch, stopping

    def _drain(self) -> list[_Pending]:
        out = []
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return out
            if item is not _STOP:
                out.append(item)

    def _loop(self) -> None:
        while True:
            batch, stopping = self._collect()
            if batch:
                self._dispatch(batch)
            if stopping:
                final = self._drain()
                if final:
                    self._dispatch(final)
                return

    def _resident(self, cloud) -> "object":
        """ResidentTarget for a target cloud, cached by object identity (the
        entry pins the cloud so its id cannot be recycled).  True LRU:
        hits move to the end, eviction drops the least-recently-used — the
        steady-state hot model must never be the one evicted."""
        from tpu3dm.registration.batch import ResidentTarget

        tid = id(cloud)
        ent = self._residents.get(tid)
        if ent is None:
            while len(self._residents) >= 32:
                self._residents.popitem(last=False)
            ent = (cloud, ResidentTarget(cloud))
        self._residents[tid] = ent
        self._residents.move_to_end(tid)
        return ent[1]

    def _dispatch(self, batch: list[_Pending]) -> None:
        s = self.serve
        results: list = [None] * len(batch)  # (T, fit, rmse, bucket)
        # Everything — including partitioning and ResidentTarget
        # construction (which compacts on host, a D2H that can fail on
        # remote backends) — stays inside the try: an escape here would
        # kill the dispatcher thread and strand every future forever.
        try:
            from tpu3dm.registration.batch import register_sources_to_target

            # Partition: requests sharing a target object form shared-target
            # groups (device-resident target, sources-only upload); the rest
            # go through the general pair-batched path in one call.
            shared: list[tuple[list[int], object]] = []
            rest = list(range(len(batch)))
            if s.target_resident_min > 0 and self.mesh is None:
                by_tgt: dict[int, list[int]] = {}
                for pos, p in enumerate(batch):
                    by_tgt.setdefault(id(p.tgt), []).append(pos)
                rest = []
                for poss in by_tgt.values():
                    if len(poss) >= s.target_resident_min:
                        shared.append((poss, self._resident(batch[poss[0]].tgt)))
                    else:
                        rest.extend(poss)
                rest.sort()

            for poss, rt in shared:
                res = register_sources_to_target(
                    [batch[i].src for i in poss], rt, self.pipeline,
                    pair_keys=np.stack([batch[i].key for i in poss]),
                    bucket_multiple=s.bucket_multiple,
                    ransac_iterations=s.ransac_iterations,
                    icp_iterations=s.icp_iterations,
                    icp_solves_per_nn=s.icp_solves_per_nn,
                    approx_score=s.approx_score,
                    rescue_restarts=s.rescue_restarts,
                    sample_mode=s.sample_mode,
                )
                for j, i in enumerate(poss):
                    results[i] = (
                        res.transforms[j], res.ransac_fitness[j],
                        res.icp_rmse[j], res.bucket_of_pair[j],
                    )
            if rest:
                res = register_pairs_batched(
                    [(batch[i].src, batch[i].tgt) for i in rest],
                    self.pipeline,
                    pair_keys=np.stack([batch[i].key for i in rest]),
                    mesh=self.mesh,
                    bucket_multiple=s.bucket_multiple,
                    ransac_iterations=s.ransac_iterations,
                    icp_iterations=s.icp_iterations,
                    icp_solves_per_nn=s.icp_solves_per_nn,
                    approx_score=s.approx_score,
                    rescue_restarts=s.rescue_restarts,
                    sample_mode=s.sample_mode,
                )
                for j, i in enumerate(rest):
                    results[i] = (
                        res.transforms[j], res.ransac_fitness[j],
                        res.icp_rmse[j], res.bucket_of_pair[j],
                    )
        except BaseException as e:  # noqa: BLE001 - forwarded to callers
            with self._lock:
                self._n_errors += len(batch)
            for p in batch:
                if not p.future.set_running_or_notify_cancel():
                    continue
                p.future.set_exception(e)
            return
        now = time.monotonic()
        lats = []
        for i, p in enumerate(batch):
            T, fit, rmse, bucket = results[i]
            lat_ms = (now - p.t_submit) * 1e3
            lats.append(lat_ms)
            if not p.future.set_running_or_notify_cancel():
                continue
            p.future.set_result(
                PairResult(
                    transformation=T,
                    fitness=float(fit),
                    inlier_rmse=float(rmse),
                    bucket=bucket,
                    latency_ms=lat_ms,
                )
            )
        with self._lock:
            self._n_batches += 1
            self._n_shared_target += sum(len(poss) for poss, _ in shared)
            self._batch_size_sum += len(batch)
            self._batch_size_max = max(self._batch_size_max, len(batch))
            for _, _, _, cap in results:
                self._bucket_counts[cap] = self._bucket_counts.get(cap, 0) + 1
            self._latencies_ms.extend(lats)
