"""Request-batching registration serving engine — the online runtime tier.

The fused register step (registration/fused.py) earns its throughput by
amortizing one compiled dispatch over many pairs; a *serving* workload
arrives as independent single-pair requests.  This engine bridges the two
the standard accelerator-serving way (micro-batching):

  - callers ``submit()`` preprocessed pairs from any thread and get a
    ``Future`` back; when more than ``max_pending`` requests are in flight
    the engine sheds load by raising ``EngineOverloaded`` instead of
    queueing unboundedly (the server maps this to an "overloaded" wire
    response);
  - one dispatcher thread collects requests for at most ``max_delay_ms``
    after the first arrival (or until ``max_batch``), packs + uploads the
    group and *launches* the compiled dispatch (registration/batch.py
    ``launch_pairs_batched`` — capacity-bucketed, pair axis padded to a
    power of two, so steady-state traffic reuses a handful of compiled
    programs) without waiting for the device;
  - a second resolver thread blocks on each launched batch's outputs and
    resolves the futures — so the host pack + H2D upload of micro-batch
    i+1 overlaps the device compute of micro-batch i (the double-buffer
    pattern io/loader.py uses for manifest ingest, applied to serving,
    where the measured bottleneck IS the upload);
  - per-request PRNG keys are derived from a monotone sequence number, so a
    request's result does NOT depend on which micro-batch it landed in
    (verified in tests/test_serve.py against a direct batched call);
  - ``prewarm()`` compiles the steady-state bucket shapes up front, so the
    first real request does not pay the ~36 s first-compile stall.

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
from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)

_STOP = object()


class EngineOverloaded(RuntimeError):
    """Raised by ``submit`` when the in-flight request count exceeds
    ``ServeConfig.max_pending`` — explicit load shedding instead of an
    unbounded queue (callers/front-ends should back off and retry)."""


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
    # Device-memory bounds for the resident-target tier: at most
    # resident_targets_max distinct targets stay uploaded (LRU), and each
    # keeps at most resident_caps_max capacity variants (ResidentTarget LRU).
    resident_targets_max: int = 32
    resident_caps_max: int = 8
    # Overload contract: submit() raises EngineOverloaded once this many
    # requests are in flight (submitted, not yet resolved).  0 = unbounded.
    max_pending: int = 1024
    # Fence H2D uploads after launch with a marker round trip so pack_ms
    # captures the true wire upload and device_ms is compute+D2H only.
    # Costs one tiny transfer per micro-batch; off by default (the split
    # is for benchmark artifacts — see apps/benchmark.py --serve).
    fence_uploads: bool = False
    # 1: the dispatcher hands launched batches to a resolver thread,
    # overlapping batch i+1's host pack + upload with batch i's device
    # compute.  0 (default): resolve inline.  Measured on v5e through the
    # axon tunnel (512-request floods, steady state after an untimed warm
    # flood, three A/B sessions): depth 1 = {272.4, 165.7, 265.3} req/s
    # (median +11%, but the concurrent D2H wait + H2D uploads contend
    # intermittently on the remote client — one session lost 30%) vs a
    # stable inline {238.2, 235.1, 251.2}.  Predictable latency wins for
    # serving, so the stable mode is the default on this backend.  On a
    # directly-attached PCIe host the client
    # handles concurrent transfers; re-A/B with `bench --serve --serve-ab`
    # before choosing.  Measurement trap for posterity: an A/B whose first
    # flood still compiles micro-batch shapes mis-attributes a 7x penalty
    # to whichever mode runs first.
    pipeline_depth: int = 0


@dataclasses.dataclass
class PairResult:
    """Resolved value of one registration request.

    The latency decomposition makes host-link projections arithmetic:
    ``latency_ms = queue_ms + pack_ms + device_ms`` (up to scheduler
    jitter).  On the axon tunnel device_ms includes the actual wire upload
    unless ``ServeConfig.fence_uploads`` moved it into pack_ms; on a PCIe
    TPU host pack_ms+upload collapses to milliseconds and device_ms is the
    projected serving latency floor.
    """

    transformation: np.ndarray  # [4, 4] target <- source
    fitness: float  # RANSAC inlier fitness
    inlier_rmse: float  # final ICP rmse
    bucket: int  # capacity bucket the pair ran at
    latency_ms: float  # submit -> resolve wall time
    queue_ms: float = 0.0  # submit -> micro-batch dispatch start
    pack_ms: float = 0.0  # host pack + upload enqueue (batch-level)
    device_ms: float = 0.0  # launch -> outputs on host (batch-level)


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


def _synthetic_processed(n_valid: int) -> ProcessedCloud:
    """Synthetic ProcessedCloud with exactly ``n_valid`` valid down points —
    prewarm fodder whose bucket resolves to round_up(n_valid, multiple).
    Host NumPy leaves: the launch path compacts on host anyway."""
    from tpu3dm.core.cloud import PointCloud

    rng = np.random.default_rng(n_valid)
    pts = rng.normal(size=(n_valid, 3)).astype(np.float32)
    nrm = rng.normal(size=(n_valid, 3)).astype(np.float32)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    feat = rng.random(size=(n_valid, 33)).astype(np.float32)
    down = PointCloud(
        points=pts, mask=np.ones(n_valid, bool), normals=nrm, features=feat
    )
    return ProcessedCloud(full=down, down=down, voxel_size=0.3)


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
        self._n_shed = 0  # submits rejected by the max_pending bound
        self._n_inflight = 0  # submitted, not yet resolved/failed
        self._n_shared_target = 0  # requests served via the resident path
        self._batch_size_sum = 0
        self._batch_size_max = 0
        self._bucket_counts: dict[int, int] = {}
        self._latencies_ms: deque = deque(maxlen=1024)
        self._queue_ms: deque = deque(maxlen=1024)
        self._pack_ms: deque = deque(maxlen=1024)  # per batch
        self._device_ms: deque = deque(maxlen=1024)  # per batch
        # id(target cloud) -> (cloud ref, ResidentTarget), LRU-ordered; the
        # strong cloud reference pins the id so it cannot be recycled.
        from collections import OrderedDict

        self._residents: "OrderedDict[int, tuple]" = OrderedDict()
        # Depth-1 handoff between the dispatcher (pack + upload + launch)
        # and the resolver (device wait + future resolution): while the
        # resolver blocks on micro-batch i's outputs, the dispatcher is
        # already packing and uploading micro-batch i+1.
        self._launched_q: queue.Queue = queue.Queue(maxsize=1)
        self._thread = threading.Thread(
            target=self._loop, name="tpu3dm-serve-dispatch", daemon=True
        )
        self._resolver = threading.Thread(
            target=self._resolve_loop, name="tpu3dm-serve-resolve", daemon=True
        )
        self._thread.start()
        self._resolver.start()

    # -- public API ---------------------------------------------------------

    def submit(self, src: ProcessedCloud, tgt: ProcessedCloud) -> Future:
        """Enqueue one pair; returns a ``Future[PairResult]``.

        Raises ``EngineOverloaded`` when ``max_pending`` requests are
        already in flight — the engine sheds load explicitly rather than
        letting the queue (and every caller's latency) grow without bound.
        """
        with self._lock:
            if self._closed:
                raise RuntimeError("ServeEngine is closed")
            limit = self.serve.max_pending
            if limit > 0 and self._n_inflight >= limit:
                self._n_shed += 1
                raise EngineOverloaded(
                    f"{self._n_inflight} requests in flight (max_pending={limit})"
                )
            seq = self._seq
            self._seq += 1
            self._n_requests += 1
            self._n_inflight += 1
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

        def pct(d: deque) -> dict | None:
            a = np.asarray(d, np.float64)
            if not a.size:
                return None
            return {
                "mean": float(a.mean()),
                "p50": float(np.percentile(a, 50)),
                "p95": float(np.percentile(a, 95)),
                "max": float(a.max()),
            }

        with self._lock:
            n_b = self._n_batches
            out = {
                "requests": self._n_requests,
                "batches": n_b,
                "errors": self._n_errors,
                "shed": self._n_shed,
                "inflight": self._n_inflight,
                "pending": self._q.qsize(),
                "mean_batch_size": (self._batch_size_sum / n_b) if n_b else 0.0,
                "max_batch_size": self._batch_size_max,
                "shared_target_requests": self._n_shared_target,
                "resident_targets": len(self._residents),
                "buckets": dict(sorted(self._bucket_counts.items())),
            }
            comps = {
                "latency_ms": pct(self._latencies_ms),
                "queue_ms": pct(self._queue_ms),
                "pack_ms_per_batch": pct(self._pack_ms),
                "device_ms_per_batch": pct(self._device_ms),
            }
        out.update({k: v for k, v in comps.items() if v is not None})
        return out

    def reset_latency_window(self) -> None:
        """Drop accumulated latency samples (e.g. after a warm-up/compile
        window) so ``stats()['latency_ms']`` describes steady state only."""
        with self._lock:
            self._latencies_ms.clear()
            self._queue_ms.clear()
            self._pack_ms.clear()
            self._device_ms.clear()

    def prewarm(
        self,
        caps: list[int] | None = None,
        batch_sizes: list[int] | None = None,
        *,
        shared_target: bool = True,
        parallel: int = 4,
    ) -> float:
        """Compile the steady-state bucket programs before traffic arrives.

        Runs synthetic pairs through the SAME launch paths (and therefore
        the same module-level jit caches and static arguments) the
        dispatcher uses, at the given capacity buckets and micro-batch
        sizes.  The first real request then reuses a cached executable
        instead of paying the first-compile stall (~36 s measured on the
        axon stack, BENCH_r03 "compile+first batch").

        Returns the wall seconds spent.  Defaults: one capacity bucket
        (``bucket_multiple``, the smallest) at the power-of-two padding of
        ``max_batch`` — callers that know their cloud sizes should pass the
        real caps (e.g. ``[768, 896]`` for 20k-point dental scans).

        ``parallel`` > 1 compiles the (cap, batch, path) shapes CONCURRENTLY
        from a thread pool: each shape is a distinct jit cache entry, so the
        compiles don't serialize on each other, only on the compile
        service's own parallelism.  Serial prewarm measured 30-70 s for the
        production shape set (round-4 artifacts, `prewarm_s`); the pool
        overlaps that tracing + compile latency.  ``parallel=1`` restores
        the serial order.
        """
        from tpu3dm.registration.batch import (
            ResidentTarget,
            launch_pairs_batched,
            launch_sources_to_target,
        )

        t0 = time.monotonic()
        s = self.serve
        caps = caps or [s.bucket_multiple]
        if batch_sizes is None:
            batch_sizes = [1 << max(0, s.max_batch - 1).bit_length()]
        kw = dict(
            bucket_multiple=s.bucket_multiple,
            ransac_iterations=s.ransac_iterations,
            icp_iterations=s.icp_iterations,
            icp_solves_per_nn=s.icp_solves_per_nn,
            approx_score=s.approx_score,
            rescue_restarts=s.rescue_restarts,
            sample_mode=s.sample_mode,
        )
        thunks = []
        for cap in caps:
            cloud = _synthetic_processed(cap)
            for b in batch_sizes:
                keys = np.stack([_request_key(i) for i in range(b)])

                def pair_thunk(cloud=cloud, b=b, keys=keys):
                    launch_pairs_batched(
                        [(cloud, cloud)] * b, self.pipeline,
                        pair_keys=keys, mesh=self.mesh, **kw,
                    ).resolve()

                thunks.append(pair_thunk)
                if shared_target and s.target_resident_min > 0 and self.mesh is None:

                    def shared_thunk(cloud=cloud, b=b, keys=keys):
                        rt = ResidentTarget(cloud, max_caps=s.resident_caps_max)
                        launch_sources_to_target(
                            [cloud] * b, rt, self.pipeline, pair_keys=keys, **kw
                        ).resolve()

                    thunks.append(shared_thunk)
        if parallel > 1 and len(thunks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(parallel, len(thunks))) as ex:
                futs = [ex.submit(t) for t in thunks]
                for f in futs:
                    f.result()
        else:
            for t in thunks:
                t()
        dt = time.monotonic() - t0
        logger.info(
            "prewarm: caps=%s batch_sizes=%s parallel=%d in %.1fs",
            caps, batch_sizes, parallel, dt,
        )
        return dt

    def close(self, *, timeout: float | None = None) -> None:
        """Stop accepting requests, drain the queue, join both threads."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._q.put(_STOP)
        self._thread.join(timeout)
        self._resolver.join(timeout)

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
        """Dispatcher: collect -> pack -> upload -> launch (never waits on
        the device; the resolver thread does)."""
        while True:
            batch, stopping = self._collect()
            if batch:
                self._launch(batch)
            if stopping:
                final = self._drain()
                if final:
                    self._launch(final)
                self._launched_q.put(_STOP)
                return

    def _resolve_loop(self) -> None:
        """Resolver: wait on each launched micro-batch's outputs and
        resolve its futures, while the dispatcher packs the next one."""
        while True:
            item = self._launched_q.get()
            if item is _STOP:
                return
            self._resolve(item)

    def _resident(self, cloud) -> "object":
        """ResidentTarget for a target cloud, cached by object identity (the
        entry pins the cloud so its id cannot be recycled).  True LRU:
        hits move to the end, eviction drops the least-recently-used — the
        steady-state hot model must never be the one evicted."""
        from tpu3dm.registration.batch import ResidentTarget

        tid = id(cloud)
        ent = self._residents.get(tid)
        if ent is None:
            while len(self._residents) >= max(1, self.serve.resident_targets_max):
                self._residents.popitem(last=False)
            ent = (cloud, ResidentTarget(cloud, max_caps=self.serve.resident_caps_max))
        self._residents[tid] = ent
        self._residents.move_to_end(tid)
        return ent[1]

    def _fail_batch(self, batch: list[_Pending], e: BaseException) -> None:
        with self._lock:
            self._n_errors += len(batch)
            self._n_inflight -= len(batch)
        for p in batch:
            if not p.future.set_running_or_notify_cancel():
                continue
            p.future.set_exception(e)

    def _launch(self, batch: list[_Pending]) -> None:
        """Pack + upload + enqueue the micro-batch's dispatches; hand the
        launched work to the resolver thread without waiting on the device."""
        s = self.serve
        t_start = time.monotonic()
        # Everything — including partitioning and ResidentTarget
        # construction (which compacts on host, a D2H that can fail on
        # remote backends) — stays inside the try: an escape here would
        # kill the dispatcher thread and strand every future forever.
        try:
            from tpu3dm.registration.batch import (
                launch_pairs_batched,
                launch_sources_to_target,
            )

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

            kw = dict(
                bucket_multiple=s.bucket_multiple,
                ransac_iterations=s.ransac_iterations,
                icp_iterations=s.icp_iterations,
                icp_solves_per_nn=s.icp_solves_per_nn,
                approx_score=s.approx_score,
                rescue_restarts=s.rescue_restarts,
                sample_mode=s.sample_mode,
            )
            pendings: list[tuple[list[int], object]] = []  # (positions, PendingBatch)
            for poss, rt in shared:
                pendings.append((poss, launch_sources_to_target(
                    [batch[i].src for i in poss], rt, self.pipeline,
                    pair_keys=np.stack([batch[i].key for i in poss]), **kw,
                )))
            if rest:
                pendings.append((rest, launch_pairs_batched(
                    [(batch[i].src, batch[i].tgt) for i in rest],
                    self.pipeline,
                    pair_keys=np.stack([batch[i].key for i in rest]),
                    mesh=self.mesh, **kw,
                )))
            if s.fence_uploads:
                # Marker H2D->D2H round trip: transfers ride one stream in
                # order, so this returning means the batch's uploads are on
                # device — pack_ms then includes the wire time (approximate
                # by construction; used for benchmark decomposition only).
                import jax

                np.asarray(jax.device_put(np.zeros(1, np.float32)))
        except BaseException as e:  # noqa: BLE001 - forwarded to callers
            self._fail_batch(batch, e)
            return
        pack_ms = (time.monotonic() - t_start) * 1e3
        n_shared = sum(len(poss) for poss, _ in shared)
        item = (batch, pendings, n_shared, t_start, pack_ms)
        if self.serve.pipeline_depth == 0:
            self._resolve(item)  # A/B baseline: no upload/compute overlap
        else:
            self._launched_q.put(item)

    def _resolve(self, item: tuple) -> None:
        batch, pendings, n_shared, t_start, pack_ms = item
        results: list = [None] * len(batch)  # (T, fit, rmse, bucket)
        t0 = time.monotonic()
        try:
            for poss, pending in pendings:
                res = pending.resolve()
                for j, i in enumerate(poss):
                    results[i] = (
                        res.transforms[j], res.ransac_fitness[j],
                        res.icp_rmse[j], res.bucket_of_pair[j],
                    )
        except BaseException as e:  # noqa: BLE001 - forwarded to callers
            self._fail_batch(batch, e)
            return
        now = time.monotonic()
        device_ms = (now - t0) * 1e3
        lats, qwaits = [], []
        for i, p in enumerate(batch):
            T, fit, rmse, bucket = results[i]
            lat_ms = (now - p.t_submit) * 1e3
            queue_ms = (t_start - p.t_submit) * 1e3
            lats.append(lat_ms)
            qwaits.append(queue_ms)
            if not p.future.set_running_or_notify_cancel():
                continue
            p.future.set_result(
                PairResult(
                    transformation=T,
                    fitness=float(fit),
                    inlier_rmse=float(rmse),
                    bucket=bucket,
                    latency_ms=lat_ms,
                    queue_ms=queue_ms,
                    pack_ms=pack_ms,
                    device_ms=device_ms,
                )
            )
        with self._lock:
            self._n_batches += 1
            self._n_inflight -= len(batch)
            self._n_shared_target += n_shared
            self._batch_size_sum += len(batch)
            self._batch_size_max = max(self._batch_size_max, len(batch))
            for _, _, _, cap in results:
                self._bucket_counts[cap] = self._bucket_counts.get(cap, 0) + 1
            self._latencies_ms.extend(lats)
            self._queue_ms.extend(qwaits)
            self._pack_ms.append(pack_ms)
            self._device_ms.append(device_ms)
