"""Kernel microbenchmarks with roofline (speed-of-light) analysis.

BASELINE.md's final target: "NN-search and RANSAC-scoring Pallas kernels at
speed-of-light per chip."  This module measures the two headline kernels
(ops/nn.py, ops/ransac_score.py) against an explicit hardware model and
reports achieved throughput as a fraction of the binding resource's peak.

Hardware model (TPU v5e, one chip; public figures from the JAX scaling book):
  - MXU: 197 TFLOP/s bf16.  fp32 matmuls run as multi-pass bf16
    (~1/4 rate) -> 49 TFLOP/s modeled fp32 peak.
  - VPU: 8x128 lanes x 8 ALU slots x ~940 MHz  ~= 7.7 Tops/s fp32;
    conservatively modeled at 4 Tops/s (not every op dual-issues).
  - HBM: 819 GB/s.

Both kernels compute an [A, B] interaction matrix tile-by-tile with running
reductions.  With contraction depth D < 128 the systolic array spends ~128
cycles per 128x128 output tile regardless of D, so MXU cost is modeled as
TILE throughput (entries/s), not FLOPs -- this is why 3-D point search uses
the VPU-direct kernel (no MXU at all) and 33-D feature search accepts 33/128
array utilization.  The model computes MXU-tile, VPU, and HBM times and
names the binding one; %SoL is reported raw and net of the measured
per-dispatch floor (the axon tunnel adds ~25 ms/call).

Timing honesty: on the axon remote stack only a D2H copy (np.asarray) is a
true completion fence -- jax.block_until_ready returns at dispatch.  Every
sample below fences through np.asarray on a small slice of the result.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)

# Hardware peaks (TPU v5e, one chip). Overridable for other parts.
PEAKS = {
    "tpu": {
        "mxu_fp32_flops": 49e12,
        # With contraction depth < 128 the systolic array still spends ~128
        # cycles per 128x128 output tile, so the binding MXU rate is TILE
        # throughput, not FLOPs: 128 rows/cycle x ~0.94 GHz = 1.2e11
        # entries/s ideal; modeled at 1.0e11 for fp32 multi-pass overhead.
        "mxu_tile_entries_per_s": 1.0e11,
        "vpu_fp32_ops": 4e12,
        "hbm_bytes_per_s": 819e9,
        "name": "TPU v5e (modeled)",
    },
    # CPU numbers are placeholders so the bench runs anywhere; the roofline
    # percentages are only meaningful on TPU.
    "cpu": {
        "mxu_fp32_flops": 2e11,
        "mxu_tile_entries_per_s": 1e11,
        "vpu_fp32_ops": 2e11,
        "hbm_bytes_per_s": 5e10,
        "name": "host CPU (placeholder model)",
    },
}


@dataclasses.dataclass
class KernelCase:
    """One measured kernel configuration with its cost model."""

    name: str
    entries: int  # A*B interaction-matrix entries
    mxu_flops: float  # matmul FLOPs (2*A*B*D)
    vpu_ops: float  # modeled element-wise/reduction ops
    hbm_bytes: float  # modeled HBM traffic under the actual tiling
    contraction: int = 0  # matmul depth D (0 = no MXU use)
    time_s: float = 0.0

    def roofline(self, peaks: dict) -> dict:
        if 0 < self.contraction < 128:
            # Tile-throughput regime: depth-D contraction wastes the unused
            # (128 - D) array rows; cost is per output entry, not per FLOP.
            t_mxu = self.entries / peaks["mxu_tile_entries_per_s"]
        else:
            t_mxu = self.mxu_flops / peaks["mxu_fp32_flops"]
        t_vpu = self.vpu_ops / peaks["vpu_fp32_ops"]
        t_hbm = self.hbm_bytes / peaks["hbm_bytes_per_s"]
        sol = max(t_mxu, t_vpu, t_hbm)
        bound = {t_mxu: "mxu", t_vpu: "vpu", t_hbm: "hbm"}[sol]
        return {
            "name": self.name,
            "entries": self.entries,
            "time_ms": round(self.time_s * 1e3, 4),
            "entries_per_sec": round(self.entries / self.time_s) if self.time_s else None,
            "achieved_gflops": round(self.mxu_flops / self.time_s / 1e9, 1)
            if self.time_s
            else None,
            "achieved_gbytes_per_sec": round(self.hbm_bytes / self.time_s / 1e9, 1)
            if self.time_s
            else None,
            "sol_time_ms": round(sol * 1e3, 4),
            "sol_bound": bound,
            "pct_of_sol": round(100.0 * sol / self.time_s, 1) if self.time_s else None,
        }


def _fence(x) -> None:
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:4]


def _time_fn(fn, *args, reps: int = 5) -> float:
    out = fn(*args)  # compile
    _fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


# --------------------------------------------------------------------------
# Cost models (match the actual tilings in ops/nn.py and ops/ransac_score.py)
# --------------------------------------------------------------------------


def _nn_case(nq: int, nt: int, d: int, tile_q: int, *, dense: bool) -> KernelCase:
    from tpu3dm.ops.nn import SMALL_D_MAX

    entries = nq * nt
    if d < SMALL_D_MAX and not dense:
        # VPU-direct kernel (ops/nn.py _nn_kernel_smalld): no MXU; per entry
        # d*(sub+mul+add) + bias add + min + argmin(where+min) ~= 3d+5 ops.
        mxu = 0.0
        contraction = 0
        vpu = (3.0 * d + 5.0) * entries
    else:
        mxu = 2.0 * entries * d
        contraction = d
        # per entry: d2 assemble (~2: scaled-add + broadcast add), tile
        # min-reduce (1), argmin via where+min (2).
        vpu = 5.0 * entries
    if dense:
        # materializes [Nq, Nt] once (write+read for the two reductions is
        # fused by XLA; model one pass) + inputs/outputs.
        hbm = 4.0 * (nq * d + nt * d + entries + 2 * nq)
    else:
        # Pallas: query tile resident; target re-streamed per query tile.
        n_qtiles = max(1, nq // tile_q)
        hbm = 4.0 * (nq * d + n_qtiles * (nt * d + nt) + 2 * nq)
    kind = "dense" if dense else "pallas"
    return KernelCase(f"nn_{kind}_{nq}x{nt}_d{d}", entries, mxu, vpu, hbm, contraction)


def _score_case(k: int, n: int, tile_k: int, *, dense: bool) -> KernelCase:
    entries = k * n
    mxu = 2.0 * entries * 16
    # per entry: bias adds (2), compare (1), mask-and (1), count reduce (1).
    vpu = 5.0 * entries
    if dense:
        hbm = 4.0 * (k * 16 + n * 16 + entries + k)
    else:
        n_ktiles = max(1, k // tile_k)
        hbm = 4.0 * (k * 16 + n_ktiles * (n * 16 + 2 * n) + k)
    kind = "dense" if dense else "pallas"
    return KernelCase(f"score_{kind}_{k}x{n}", entries, mxu, vpu, hbm, 16)


# --------------------------------------------------------------------------
# Runner
# --------------------------------------------------------------------------


def run_kernel_benchmark(*, quick: bool = False, out_path: str | None = None) -> dict:
    """Measure NN + scorer kernels and report roofline percentages."""
    from tpu3dm.ops.nn import nn_search_dense, nn_search_pallas
    from tpu3dm.ops.ransac_score import (
        score_hypotheses_dense,
        score_hypotheses_pallas,
    )

    backend = jax.default_backend()
    peaks = PEAKS.get(backend, PEAKS["cpu"])
    logger.info("kernel bench on backend=%s model=%s", backend, peaks["name"])

    # Session warm-up (axon: first round trip pays session establishment).
    np.asarray(jax.device_put(np.ones(8, np.float32)))

    # Dispatch floor: the fixed cost of ONE jitted call + D2H fence through
    # this stack (the axon tunnel adds ~25-40 ms/call; on local TPU it is
    # tens of microseconds).  pct_of_sol_net subtracts it so kernel quality
    # is visible separately from host-link overhead.
    tiny = jax.jit(lambda x: x + 1.0)
    floor_s = _time_fn(tiny, jnp.zeros((8,), jnp.float32))
    logger.info("dispatch floor: %.2f ms", floor_s * 1e3)

    rng = np.random.default_rng(0)
    cases: list[KernelCase] = []

    # --- NN kernel ---------------------------------------------------------
    nn_shapes = [(16384, 16384, 3), (16384, 16384, 33)]
    if not quick:
        # 1M x 16k d3 is the actual large-cloud ICP shape (registration/
        # large.py:250: full-res cloud vs downsampled anchor).
        nn_shapes += [(65536, 65536, 3), (1048576, 16384, 3), (65536, 65536, 33)]
    tile_q = 512
    for nq, nt, d in nn_shapes:
        q = jnp.asarray(rng.standard_normal((nq, d)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((nt, d)), jnp.float32)
        if backend == "cpu" and nq * nt > (1 << 28):
            continue
        case = _nn_case(nq, nt, d, tile_q, dense=False)
        if backend == "cpu":
            # interpret-mode Pallas is orders slower; time the XLA oracle so
            # the harness still runs everywhere.
            from tpu3dm.ops.nn import nn_search_xla

            case.time_s = _time_fn(lambda q=q, t=t: nn_search_xla(q, t))
        else:
            case.time_s = _time_fn(lambda q=q, t=t: nn_search_pallas(q, t))
        cases.append(case)

    # dense comparison point at a registration-scale shape
    nq, nt, d = 2048, 2048, 33
    q = jnp.asarray(rng.standard_normal((nq, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((nt, d)), jnp.float32)
    case = _nn_case(nq, nt, d, tile_q, dense=True)
    case.time_s = _time_fn(lambda q=q, t=t: jax.jit(nn_search_dense)(q, t))
    cases.append(case)

    # --- RANSAC scorer -----------------------------------------------------
    score_shapes = [(4096, 4096)]
    if not quick:
        score_shapes += [(16384, 65536), (65536, 65536)]
    tile_k = 512
    for k, n in score_shapes:
        R = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (k, 1, 1))
        tt = jnp.asarray(rng.standard_normal((k, 3)) * 0.1, jnp.float32)
        p = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        qq = p + jnp.asarray(rng.standard_normal((n, 3)) * 0.05, jnp.float32)
        mask = jnp.ones((n,), bool)
        dense = k * n <= (1 << 24)
        case = _score_case(k, n, tile_k, dense=dense)
        if dense:
            fn = jax.jit(score_hypotheses_dense)
            case.time_s = _time_fn(lambda R=R, tt=tt, p=p, qq=qq, m=mask: fn(R, tt, p, qq, m, 0.01))
        elif backend == "cpu":
            from tpu3dm.ops.ransac_score import score_hypotheses_xla

            case.time_s = _time_fn(
                lambda R=R, tt=tt, p=p, qq=qq, m=mask: score_hypotheses_xla(R, tt, p, qq, m, 0.01)
            )
        else:
            case.time_s = _time_fn(
                lambda R=R, tt=tt, p=p, qq=qq, m=mask: score_hypotheses_pallas(
                    R, tt, p, qq, m, 0.01
                )
            )
        cases.append(case)

    rows = [c.roofline(peaks) for c in cases]
    for c, r in zip(cases, rows):
        net = c.time_s - floor_s
        # cases at or under the dispatch floor measure the link, not the
        # kernel; report the floor-adjusted number only when meaningful.
        r["pct_of_sol_net"] = (
            round(min(100.0 * (r["sol_time_ms"] / 1e3) / net, 999.0), 1)
            if net > 1e-4
            else None
        )
    report = {
        "backend": backend,
        "hardware_model": peaks,
        "dispatch_floor_ms": round(floor_s * 1e3, 3),
        "cases": rows,
    }

    header = (
        f"{'case':34s} {'time ms':>9s} {'Gentry/s':>9s} {'GB/s':>8s} "
        f"{'SoL ms':>8s} {'bound':>5s} {'%SoL':>6s} {'net%':>6s}"
    )
    lines = [header, "-" * len(header)]
    for r in rows:
        lines.append(
            f"{r['name']:34s} {r['time_ms']:9.3f} "
            f"{(r['entries_per_sec'] or 0) / 1e9:9.2f} "
            f"{r['achieved_gbytes_per_sec'] or 0:8.1f} "
            f"{r['sol_time_ms']:8.3f} {r['sol_bound']:>5s} "
            f"{r['pct_of_sol'] or 0:6.1f} "
            + (f"{r['pct_of_sol_net']:6.1f}" if r['pct_of_sol_net'] is not None else "     -")
        )
    table = "\n".join(lines)
    print(table)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        logger.info("kernel roofline report written to %s", out_path)
    return report


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="tpu3dm kernel roofline benchmark")
    ap.add_argument("--quick", action="store_true", help="small shapes only")
    ap.add_argument("--out", default="kernel_roofline.json")
    args = ap.parse_args(argv)
    run_kernel_benchmark(quick=args.quick, out_path=args.out)


if __name__ == "__main__":
    main()
