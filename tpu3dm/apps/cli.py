"""tpu3dm command-line interface.

Subcommands cover every reference entry point (SURVEY.md §7.8):
  register   — src/main.py: load two PLYs, RANSAC + ICP, export views
  bench      — benchmark_ransac.py: comprehensive phase benchmark
  crashtest  — test_ransac_crash.py: robustness suite (real exit code)
  convert    — convert_stl-ply.py: STL -> PLY point cloud
  trim       — trim_ply.py: crop a cloud (headless: bounds/fraction instead
               of interactive selection; TPU hosts have no display)
  trace      — _visualize_matcher.py: step-by-step RANSAC with a recorded
               per-chunk trace + HTML snapshot instead of a GUI
  multiway   — N-cloud alignment + pose-graph solve (no reference analog)

Run ``python -m tpu3dm.apps.cli <subcommand> --help`` for options.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from tpu3dm.utils.logging import setup_logging

logger = setup_logging(__name__)


def _cmd_register(args) -> int:
    import jax

    from tpu3dm.core.config import PipelineConfig, PreprocessConfig
    from tpu3dm.preprocess.pipeline import load_cloud, preprocess_points
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.registration.pipeline import register_pair
    from tpu3dm.viz.export import export_registration_html, export_registration_ply

    cfg = PipelineConfig.with_voxel_size(args.voxel_size)
    noise = args.noise_sigma
    if getattr(args, "reference_noise", False):
        # Reference parity run: the always-on loader noise (ply.py:59-62).
        noise = cfg.preprocess.reference_noise_sigma
    if noise > 0:
        cfg = PipelineConfig(
            preprocess=PreprocessConfig(
                voxel_size=args.voxel_size, noise_sigma=noise
            ),
            ransac=cfg.ransac,
            icp=cfg.icp,
        )
    if args.source and args.target:
        from tpu3dm.io.ply import read_ply

        # Reference loader's path contract (ply.py:46-51).
        for p in (args.source, args.target):
            if not Path(p).exists():
                raise FileNotFoundError(f"Ply file not found: {p}")
            if Path(p).suffix.lower() != ".ply":
                raise TypeError(f"File is not a ply file: {p}")
        s = read_ply(args.source)["points"]
        t = read_ply(args.target)["points"]
    else:
        logger.info("no files given; registering the synthetic benchmark pair")
        s, t, _ = make_benchmark_pair(
            1_000_000 if args.large else 20_000, seed=0, sigma=0.01
        )

    if args.large or (args.large is None and max(len(s), len(t)) > 200_000):
        # Large-cloud path: downsampled two-mode RANSAC + verified restarts,
        # block-sparse full-resolution ICP (registration/large.py).
        from tpu3dm.registration.large import register_arrays_large

        # None = keep the large path's own default (4 verified restarts —
        # the alias rescue this path was built around); an explicit
        # --restarts N overrides it.
        fine, coarse = register_arrays_large(
            np.asarray(s), np.asarray(t), cfg,
            key=jax.random.PRNGKey(args.seed),
            restarts=args.restarts if args.restarts is not None else 4,
        )
        T = np.asarray(fine.transformation)
        print(json.dumps({
            "ransac": {"fitness": float(coarse.fitness),
                       "inlier_rmse": float(coarse.inlier_rmse),
                       "iterations": int(coarse.iterations)},
            "icp": {"fitness": float(fine.fitness),
                    "inlier_rmse": float(fine.inlier_rmse),
                    "iterations": int(fine.iterations)},
            "transformation": T.tolist(),
            "path": "large",
        }, indent=2))
        if args.out_ply or args.out_html:
            # Export views of the voxel-downsampled clouds: a 1M+ point HTML
            # scene is unusable, and the reference viewer also draws the
            # downsampled clouds (draw_registration_result.py:33-34).
            from tpu3dm.preprocess.voxel import voxel_downsample_host

            sd = voxel_downsample_host(np.asarray(s), cfg.preprocess.voxel_size)
            td = voxel_downsample_host(np.asarray(t), cfg.preprocess.voxel_size)
            if args.out_ply:
                export_registration_ply(args.out_ply, sd, td, T)
                logger.info("wrote %s", args.out_ply)
            if args.out_html:
                export_registration_html(
                    args.out_html, sd, td, T,
                    info=(
                        f"fitness={float(fine.fitness):.3f} "
                        f"rmse={float(fine.inlier_rmse):.4f} (large path)"
                    ),
                )
                logger.info("wrote %s", args.out_html)
        return 0

    src = preprocess_points(np.asarray(s), cfg.preprocess)
    tgt = preprocess_points(np.asarray(t), cfg.preprocess)

    out = register_pair(
        src, tgt, cfg, key=jax.random.PRNGKey(args.seed),
        restarts=args.restarts if args.restarts is not None else 1,
    )
    T = np.asarray(out.transformation)
    print(json.dumps({
        "ransac": {"fitness": float(out.ransac.fitness),
                   "inlier_rmse": float(out.ransac.inlier_rmse),
                   "iterations": int(out.ransac.iterations)},
        "icp": {"fitness": float(out.icp.fitness),
                "inlier_rmse": float(out.icp.inlier_rmse),
                "iterations": int(out.icp.iterations)},
        "transformation": T.tolist(),
    }, indent=2))
    if args.out_ply:
        export_registration_ply(args.out_ply, src.down, tgt.down, T)
        logger.info("wrote %s", args.out_ply)
    if args.out_html:
        export_registration_html(
            args.out_html, src.down, tgt.down, T,
            info=f"fitness={float(out.icp.fitness):.3f} rmse={float(out.icp.inlier_rmse):.4f}",
        )
        logger.info("wrote %s", args.out_html)
    return 0


def _cmd_convert(args) -> int:
    from tpu3dm.io.ply import write_ply
    from tpu3dm.io.stl import stl_to_point_cloud

    pts = stl_to_point_cloud(args.source)
    write_ply(args.dest, pts, binary=not args.ascii)
    logger.info("converted %s (%d vertices) -> %s", args.source, len(pts), args.dest)
    return 0


def _cmd_trim(args) -> int:
    from tpu3dm.io.crop import crop_file

    kept = crop_file(
        args.source,
        args.dest,
        bounds=args.bounds,
        fraction=args.fraction,
        axis=args.axis,
    )
    logger.info("wrote %s (%d points kept)", args.dest, kept)
    return 0


def _cmd_trace(args) -> int:
    import jax

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.preprocess.pipeline import load_cloud, preprocess_points
    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.viz.trace import traced_ransac
    from tpu3dm.viz.export import export_iteration_trace, export_registration_html

    cfg = PipelineConfig.with_voxel_size(args.voxel_size)
    if args.source and args.target:
        src = load_cloud(args.source, cfg.preprocess)
        tgt = load_cloud(args.target, cfg.preprocess)
    else:
        s, t, _ = make_benchmark_pair(20_000, seed=0, sigma=0.01)
        src = preprocess_points(s, cfg.preprocess)
        tgt = preprocess_points(t, cfg.preprocess)

    result, trace = traced_ransac(
        src.down,
        tgt.down,
        cfg.ransac,
        key=jax.random.PRNGKey(args.seed),
        noise_ratio=args.noise_ratio,
        chunk=args.update_interval,
    )
    export_iteration_trace(args.out, trace)
    logger.info("wrote %s (%d trace rows)", args.out, len(trace))
    if args.out_html:
        export_registration_html(
            args.out_html, src.down, tgt.down, np.asarray(result.transformation),
            info=f"traced RANSAC best fitness={float(result.fitness):.3f}",
        )
        logger.info("wrote %s", args.out_html)
    if args.out_anim:
        from tpu3dm.viz.export import export_ransac_animation_html

        export_ransac_animation_html(
            args.out_anim, src.down, tgt.down, trace,
            info=f"traced RANSAC best fitness={float(result.fitness):.3f}",
        )
        logger.info("wrote %s (%d frames)", args.out_anim, len(trace))
    return 0


def _cmd_register_batch(args) -> int:
    """Register many PLY pairs in capacity-bucketed batched dispatches.

    The manifest is a text file with one ``source.ply target.ply`` pair per
    line (or a JSON list of [source, target] pairs).  Results go to one JSON
    file indexed like the manifest.
    """
    import jax
    import numpy as np

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.loader import read_ply_many
    from tpu3dm.preprocess.pipeline import preprocess_points_batch
    from tpu3dm.registration.batch import register_pairs_batched

    cfg = PipelineConfig.with_voxel_size(args.voxel_size)
    text = Path(args.manifest).read_text()
    if text.lstrip().startswith("["):
        pair_paths = [(a, b) for a, b in json.loads(text)]
    else:
        pair_paths = [
            tuple(line.split()) for line in text.splitlines() if line.strip()
        ]
        for pp in pair_paths:
            if len(pp) != 2:
                raise ValueError(f"manifest line needs 2 paths, got: {pp}")

    store = None
    pair_names = None
    if args.checkpoint_dir:
        from tpu3dm.multiway.checkpoint import CheckpointStore

        store = CheckpointStore(args.checkpoint_dir)
        # The run configuration is part of the record key: re-running with a
        # different voxel size / seed / budget must NOT return stale results
        # computed under the old config (it recomputes into new records).
        cfg_tag = (f"v{args.voxel_size}/s{args.seed}/r{args.ransac_iterations}"
                   f"/x{args.rescue_restarts}")
        pair_names = [f"{a}\t{b}\t{cfg_tag}" for a, b in pair_paths]
        store.write_manifest(
            kind="register-batch", n_pairs=len(pair_paths),
            voxel_size=args.voxel_size, seed=args.seed,
            ransac_iterations=args.ransac_iterations,
            rescue_restarts=args.rescue_restarts,
        )
        # Skip ingest for clouds only needed by already-completed pairs.
        pending = {
            p
            for (a, b), name in zip(pair_paths, pair_names)
            if store.get_pair(name) is None
            for p in (a, b)
        }
    else:
        pending = {p for pair in pair_paths for p in pair}

    # Per-pair PRNG keys are positional in the FULL manifest, so the
    # windowed and whole-manifest modes register every pair identically.
    all_keys = np.asarray(jax.random.split(jax.random.PRNGKey(args.seed),
                                           len(pair_paths)))

    if args.window > 0:
        # Streaming mode: host memory bounded by the window; the next
        # window's file ingest (threaded native parse + voxel hash) overlaps
        # this window's device registration (io/loader.py double buffer).
        from tpu3dm.io.loader import iter_preprocessed_windows

        skip = {p for pair in pair_paths for p in pair} - pending
        out_T = np.zeros((len(pair_paths), 4, 4), np.float32)
        out_fit = np.zeros((len(pair_paths),), np.float32)
        out_rmse = np.zeros((len(pair_paths),), np.float32)
        bucket_of = [0] * len(pair_paths)
        for idxs, procs in iter_preprocessed_windows(
            pair_paths, cfg.preprocess, window=args.window,
            workers=args.io_workers, skip_paths=skip,
            # The batch path registers the DOWNSAMPLED clouds only; skipping
            # full-res normals removes the dominant ingest stage.
            full_normals=False,
        ):
            _dummy = next(iter(procs.values()), None)
            wpairs = [
                (procs.get(pair_paths[i][0], _dummy),
                 procs.get(pair_paths[i][1], _dummy))
                for i in idxs
            ]
            wres = register_pairs_batched(
                wpairs,
                cfg,
                ransac_iterations=args.ransac_iterations,
                rescue_restarts=args.rescue_restarts,
                checkpoint=store,
                pair_names=(
                    [pair_names[i] for i in idxs] if pair_names else None
                ),
                pair_keys=all_keys[idxs],
            )
            for j, i in enumerate(idxs):
                out_T[i] = wres.transforms[j]
                out_fit[i] = wres.ransac_fitness[j]
                out_rmse[i] = wres.icp_rmse[j]
                bucket_of[i] = wres.bucket_of_pair[j]
            logger.info(
                "window %d-%d registered (%d pairs)",
                idxs[0], idxs[-1], len(idxs),
            )
        from tpu3dm.registration.batch import BatchResult

        res = BatchResult(out_T, out_fit, out_rmse, bucket_of)
    else:
        # One batched ingest for every distinct cloud file still needed
        # (threaded: the native parsers release the GIL).
        uniq = sorted(pending)
        raw = [
            d["points"]
            for d in read_ply_many(uniq, workers=args.io_workers)
        ]
        procs = dict(zip(uniq, preprocess_points_batch(
            raw, cfg.preprocess, workers=args.io_workers,
            full_normals=False,  # batch path registers down clouds only
        )))
        # Completed pairs get a placeholder; register_pairs_batched never
        # touches the clouds of checkpoint-restored pairs.
        _dummy = next(iter(procs.values()), None)
        pairs = [
            (procs.get(a, _dummy), procs.get(b, _dummy))
            for a, b in pair_paths
        ]
        res = register_pairs_batched(
            pairs,
            cfg,
            ransac_iterations=args.ransac_iterations,
            rescue_restarts=args.rescue_restarts,
            checkpoint=store,
            pair_names=pair_names,
            pair_keys=all_keys,
        )
    payload = [
        {
            "source": a,
            "target": b,
            "transformation": res.transforms[i].tolist(),
            "ransac_fitness": float(res.ransac_fitness[i]),
            "icp_rmse": float(res.icp_rmse[i]),
            "bucket_capacity": res.bucket_of_pair[i],
        }
        for i, (a, b) in enumerate(pair_paths)
    ]
    Path(args.out).write_text(json.dumps(payload, indent=2))
    logger.info("wrote %s (%d pairs)", args.out, len(payload))
    return 0


def _cmd_multiway(args) -> int:
    import jax

    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.io.ply import read_ply
    from tpu3dm.multiway.posegraph import register_multiway, register_multiway_batched
    from tpu3dm.preprocess.pipeline import preprocess_points_batch

    cfg = PipelineConfig.with_voxel_size(args.voxel_size)
    # Batched ingest: all clouds' feature stages in one device dispatch.
    from tpu3dm.io.loader import read_ply_many

    raw = [d["points"] for d in read_ply_many(args.files)]
    # The batched multiway path registers down clouds only; the sequential
    # path refines with full-res ICP and needs the full-res normals.
    clouds = preprocess_points_batch(
        raw, cfg.preprocess, full_normals=not args.batched
    )
    register = register_multiway_batched if args.batched else register_multiway
    out = register(
        clouds,
        cfg,
        key=jax.random.PRNGKey(args.seed),
        checkpoint_dir=args.checkpoint_dir,
        robust_delta=args.robust_delta,
    )
    payload = {
        "poses": out.poses.tolist(),
        "edges": out.edges.tolist(),
        "edge_fitness": out.edge_fitness.tolist(),
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    logger.info("wrote %s (%d poses)", args.out, len(out.poses))
    return 0


def _cmd_info(args) -> int:
    """Environment/runtime report: backend, devices, native tier, versions."""
    import jax

    from tpu3dm import native

    lib = native.lib()
    devs = jax.devices()
    payload = {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devs],
        "device_count": len(devs),
        "native_tier": "loaded" if lib is not None else "unavailable (make -C native)",
        "default_matmul_precision": str(
            jax.config.jax_default_matmul_precision
        ),
    }
    if args.probe and lib is not None:
        import time

        import numpy as np

        pts = np.random.default_rng(0).uniform(-1, 1, (100_000, 3))
        t0 = time.perf_counter()
        out = native.voxel_downsample(pts, 0.05)
        payload["native_voxel_100k_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1
        )
        payload["native_voxel_100k_voxels"] = int(out.shape[0])
    if args.probe:
        import time

        import jax.numpy as jnp
        import numpy as np

        t0 = time.perf_counter()
        np.asarray(jnp.ones(8) * 2.0)  # first dispatch incl. session setup
        payload["first_dispatch_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(payload, indent=2))
    return 0


def _cmd_serve(args) -> int:
    """Run the request-batching registration server (serve/server.py)."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.serve import RegistrationServer, ServeConfig

    server = RegistrationServer(
        args.host,
        args.port,
        pipeline=PipelineConfig.with_voxel_size(args.voxel_size),
        serve=ServeConfig(
            max_batch=args.max_batch,
            max_delay_ms=args.max_delay_ms,
            ransac_iterations=args.ransac_iterations,
            icp_iterations=args.icp_iterations,
            rescue_restarts=args.rescue_restarts,
            max_pending=args.max_pending,
        ),
        cache_size=args.cache_size,
        path_root=args.path_root,
    )
    prewarm_s = None
    if args.prewarm:
        # Compile the steady-state shapes BEFORE announcing the port: the
        # first client request then runs warm instead of stalling ~36 s.
        # batch size 1 is included alongside max_batch: a lone first request
        # forms a micro-batch of 1 (a distinct compiled program), so warming
        # only the full batch would still stall it (run_serve_benchmark
        # prewarms [1, max_batch] for the same reason).
        prewarm_s = server.prewarm(
            caps=args.prewarm_caps or None,
            batch_sizes=(
                sorted({1, args.max_batch}) if args.max_batch else None
            ),
        )
    print(json.dumps({
        "listening": f"{server.host}:{server.port}",
        **({"prewarm_s": round(prewarm_s, 1)} if prewarm_s is not None else {}),
    }))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.close()
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="tpu3dm", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info", help="runtime report: backend, devices, native tier")
    p.add_argument("--probe", action="store_true",
                   help="also time a native voxel hash and the first device dispatch")
    p.set_defaults(fn=_cmd_info)

    p = sub.add_parser("register", help="register two point clouds (main.py parity)")
    p.add_argument("source", nargs="?", default=None)
    p.add_argument("target", nargs="?", default=None)
    p.add_argument("--voxel-size", type=float, default=0.3)
    p.add_argument("--noise-sigma", type=float, default=0.0,
                   help="loader Gaussian noise (reference always-on value: 0.05)")
    p.add_argument("--reference-noise", action="store_true",
                   help="parity run: inject the reference's always-on loader "
                        "noise (PreprocessConfig.reference_noise_sigma=0.05, "
                        "ply.py:59-62)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-ply", default=None)
    p.add_argument("--out-html", default=None)
    p.add_argument("--large", action="store_true", default=None,
                   help="force the large-cloud path (block-sparse NN ICP); "
                        "auto-selected above 200k points")
    p.add_argument("--restarts", type=int, default=None,
                   help="ICP-verified RANSAC restarts (>1 rescues "
                        "near-symmetric clouds whose inlier counts tie); "
                        "default: 1 standard path, 4 large path")
    p.set_defaults(fn=_cmd_register)

    p = sub.add_parser("bench", help="comprehensive benchmark (benchmark_ransac.py parity)")
    from tpu3dm.apps.benchmark import add_args as bench_args, main as bench_main

    bench_args(p)
    p.set_defaults(fn=lambda a: bench_main(_reargs(a)))

    p = sub.add_parser("crashtest", help="robustness suite (test_ransac_crash.py parity)")
    from tpu3dm.apps.crashtest import main as crash_main

    p.set_defaults(fn=lambda a: crash_main([]))

    p = sub.add_parser("kernels", help="kernel roofline microbenchmarks (speed-of-light %)")
    p.add_argument("--quick", action="store_true", help="small shapes only")
    p.add_argument("--out", default="kernel_roofline.json")
    from tpu3dm.apps.kernelbench import run_kernel_benchmark

    p.set_defaults(fn=lambda a: run_kernel_benchmark(quick=a.quick, out_path=a.out))

    p = sub.add_parser("convert", help="STL -> PLY (convert_stl-ply.py parity)")
    p.add_argument("source")
    p.add_argument("dest")
    p.add_argument("--ascii", action="store_true", help="write ASCII PLY (reference default)")
    p.set_defaults(fn=_cmd_convert)

    p = sub.add_parser("trim", help="crop a cloud (trim_ply.py headless parity)")
    p.add_argument("source")
    p.add_argument("dest")
    p.add_argument("--bounds", type=float, nargs=6, default=None,
                   metavar=("XMIN", "XMAX", "YMIN", "YMAX", "ZMIN", "ZMAX"))
    p.add_argument("--fraction", type=float, default=None,
                   help="keep the lower fraction along --axis")
    p.add_argument("--axis", type=int, default=0)
    p.set_defaults(fn=_cmd_trim)

    p = sub.add_parser("trace", help="step-by-step RANSAC trace (visualize_matcher parity)")
    p.add_argument("source", nargs="?", default=None)
    p.add_argument("target", nargs="?", default=None)
    p.add_argument("--voxel-size", type=float, default=0.3)
    p.add_argument("--noise-ratio", type=float, default=2.0,
                   help="bogus-correspondence ratio (reference default 2.0)")
    p.add_argument("--update-interval", type=int, default=256,
                   help="hypotheses per trace row")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="ransac_trace.jsonl")
    p.add_argument("--out-html", default=None)
    p.add_argument("--out-anim", default=None,
                   help="animated HTML replay of the search (the headless "
                        "analog of the GUI's live iteration animation)")
    p.set_defaults(fn=_cmd_trace)

    p = sub.add_parser(
        "register-batch",
        help="register many PLY pairs (capacity-bucketed batched dispatches)",
    )
    p.add_argument("manifest", help="text file: one 'src.ply tgt.ply' per line, or JSON [[src,tgt],...]")
    p.add_argument("--voxel-size", type=float, default=0.3)
    p.add_argument("--ransac-iterations", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="batch_results.json")
    p.add_argument("--checkpoint-dir", default=None,
                   help="resumable run: per-pair results are persisted here "
                        "(keyed by the pair's paths) and skipped on re-run")
    p.add_argument("--window", type=int, default=0,
                   help=">0: stream the manifest in windows of this many "
                        "pairs — host memory stays bounded and the next "
                        "window's file ingest overlaps this window's device "
                        "registration; 0 ingests the whole manifest at once")
    p.add_argument("--io-workers", type=int, default=None,
                   help="threads for file parse + voxel hash (native code "
                        "releases the GIL); default min(8, cpus)")
    p.add_argument("--rescue-restarts", type=int, default=0,
                   help=">0 enables the batched alias rescue inside each "
                        "fused step (two-mode RANSAC x restarts + on-device "
                        "ICP verification)")
    p.set_defaults(fn=_cmd_register_batch)

    p = sub.add_parser(
        "serve",
        help="registration server: JSON-lines TCP front of the micro-batching engine",
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8421)
    p.add_argument("--voxel-size", type=float, default=0.3)
    p.add_argument("--max-batch", type=int, default=256,
                   help="max pairs coalesced into one device dispatch")
    p.add_argument("--max-delay-ms", type=float, default=5.0,
                   help="linger after the first request of a batch")
    p.add_argument("--ransac-iterations", type=int, default=4096)
    p.add_argument("--icp-iterations", type=int, default=8)
    p.add_argument("--rescue-restarts", type=int, default=0,
                   help=">0 enables the batched alias rescue per request")
    p.add_argument("--cache-size", type=int, default=64,
                   help="LRU capacity of the preprocessed-cloud path cache")
    p.add_argument("--max-pending", type=int, default=1024,
                   help="in-flight request bound; excess submits are shed "
                        "with an 'overloaded' response (0 = unbounded)")
    p.add_argument("--path-root", default=None,
                   help="restrict {'path': ...} cloud specs to files under "
                        "this directory (recommended for non-loopback binds)")
    p.add_argument("--prewarm", action="store_true",
                   help="compile steady-state bucket shapes before "
                        "accepting connections (kills the first-request "
                        "compile stall)")
    p.add_argument("--prewarm-caps", type=int, nargs="*", default=None,
                   help="capacity buckets to prewarm (e.g. 768 896); "
                        "default: the bucket quantum")
    p.set_defaults(fn=_cmd_serve)

    p = sub.add_parser("multiway", help="N-cloud alignment + pose graph")
    p.add_argument("--robust-delta", type=float, default=None,
                   help="Geman-McClure robust pose-graph loss scale "
                        "(SE(3)-tangent residual norm, ~0.1); default pure "
                        "least squares")
    p.add_argument("files", nargs="+")
    p.add_argument("--voxel-size", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="multiway_poses.json")
    p.add_argument("--checkpoint-dir", default=None,
                   help="resumable run: completed edges are persisted here and "
                        "skipped on re-run")
    p.add_argument("--batched", action="store_true",
                   help="register ALL edges in one vmapped device dispatch "
                        "(register_multiway_batched) instead of one pair at "
                        "a time")
    p.set_defaults(fn=_cmd_multiway)

    return ap


def _reargs(a) -> list[str]:
    """Re-serialize bench args for the benchmark module's own parser."""
    out = []
    for k in ("source", "target"):
        v = getattr(a, k)
        if v:
            out += [f"--{k}", v]
    for k in ("voxel_size", "noise_ratio", "test_iterations", "ransac_iterations"):
        out += [f"--{k.replace('_', '-')}", str(getattr(a, k))]
    out += ["--out-txt", a.out_txt, "--out-json", a.out_json]
    if getattr(a, "sweep", False):
        out.append("--sweep")
        out += ["--sweep-counts", ",".join(str(c) for c in a.sweep_counts)]
    if getattr(a, "large", None):
        out += ["--large", str(a.large)]
    if getattr(a, "scaling", False):
        out.append("--scaling")
        out += ["--mesh-sizes", ",".join(str(n) for n in a.mesh_sizes)]
        out += ["--scaling-pairs", str(a.scaling_pairs)]
        out += ["--scaling-points", str(a.scaling_points)]
    if getattr(a, "multiway", 0):
        out += ["--multiway", str(a.multiway)]
    if getattr(a, "scaling_model", False):
        out.append("--scaling-model")
    if getattr(a, "fpfh_ab", False):
        out.append("--fpfh-ab")
    if getattr(a, "track_memory", False):
        out.append("--track-memory")
    if getattr(a, "overlap_sweep", False):
        out.append("--overlap-sweep")
    if getattr(a, "serve", 0):
        out += ["--serve", str(a.serve)]
        out += ["--serve-clients", str(a.serve_clients)]
        out += ["--serve-max-batch", str(a.serve_max_batch)]
        out += ["--serve-distinct", str(a.serve_distinct)]
        if getattr(a, "serve_ab", False):
            out.append("--serve-ab")
    if getattr(a, "stream", 0):
        out += ["--stream", str(a.stream)]
        out += ["--stream-window", str(a.stream_window)]
        out += ["--stream-points", str(a.stream_points)]
        if getattr(a, "stream_ab", False):
            out.append("--stream-ab")
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
