"""Command-line interface.

Parity target: the reference binary's contract (``/root/reference/
d2q9-bgk.c:876-880``): ``d2q9-bgk <paramfile> <obstaclefile>`` reads the two
input files, runs, prints the canonical 4-line epilogue (``==done==``,
Reynolds number, elapsed + CPU times, ``d2q9-bgk.c:271-275``) and writes
``final_state.dat`` / ``av_vels.dat`` into the working directory.  Device
selection honours ``LBM_DEVICE`` (the ``OCL_DEVICE`` analog).

Extensions over the reference CLI (subcommands):

* ``run``    — the parity contract above, plus ``--output-dir``,
  ``--kernel``, MLUPS/bandwidth reporting and an optional profiler trace.
* ``bench``  — timed run without file output, JSON metric line.
* ``check``  — compare produced outputs against reference data
  (drives :mod:`tools.check`-equivalent logic in-process).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import resource
import sys

from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import load_obstacle_file
from lbm_tpu.io import write_av_vels, write_final_state
from lbm_tpu.runtime import RunResult, Simulator, select_device


def _load_case(params_path: str, obstacles_path: str):
    params = LBMParams.from_file(params_path)
    obstacles, _ = load_obstacle_file(obstacles_path, params.nx, params.ny)
    return params, obstacles


def _epilogue(res: RunResult) -> None:
    """The reference's stdout contract plus TPU perf counters."""
    usage = resource.getrusage(resource.RUSAGE_SELF)
    print("==done==")
    print(f"Reynolds number:\t\t{res.reynolds:.12E}")
    print(f"Elapsed time:\t\t\t{res.elapsed:.6f} (s)")
    print(f"Elapsed user CPU time:\t\t{usage.ru_utime:.6f} (s)")
    print(f"Elapsed system CPU time:\t{usage.ru_stime:.6f} (s)")
    # Perf readout (beyond the reference: MLUPS + effective HBM traffic).
    # The result carries the executed-step count (resumes don't re-run the
    # checkpointed prefix) and the kernel's steps-per-pass.
    from lbm_tpu.utils.profiling import PerfReport

    steps = (
        res.steps_timed if res.steps_timed is not None
        else res.params.max_iters
    )
    report = PerfReport(
        nx=res.params.nx,
        ny=res.params.ny,
        steps=steps,
        elapsed=res.elapsed,
        steps_per_pass=res.steps_per_pass,
    )
    print(f"MLUPS:\t\t\t\t{report.mlups:.1f}")
    print(f"Effective bandwidth:\t\t{report.effective_bandwidth_gbs:.1f} GB/s")


def _run_and_write(args, sim) -> int:
    """Shared driver tail for the single-chip and sharded run paths:
    execute (checkpointed or plain, optionally traced), print the
    epilogue, write the output files."""

    def go():
        if args.checkpoint_dir:
            # Checkpointing needs the full f state on host each segment.
            return sim.run_checkpointed(
                args.checkpoint_dir, every=args.checkpoint_every
            )
        # The run's outputs (final_state.dat + epilogue) only need the 4
        # derived planes; fetch those instead of the 9 f-planes.
        return sim.run(readback="fields")

    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            res = go()
    else:
        res = go()
    _epilogue(res)
    outdir = pathlib.Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    write_final_state(
        outdir / "final_state.dat",
        res.params,
        res.f,
        res.obstacles,
        fields=res.fields,
    )
    write_av_vels(outdir / "av_vels.dat", res.av_vels)
    return 0


def _parse_pair(value: str, flag: str) -> tuple[int, int]:
    """Parse an ``AxB`` flag value into two positive ints."""
    try:
        a, b = (int(v) for v in value.lower().split("x"))
    except ValueError:
        raise SystemExit(f"{flag} must be AxB (e.g. 2x4), got {value!r}")
    if a < 1 or b < 1:
        raise SystemExit(f"{flag} values must be positive, got {value!r}")
    return a, b


def cmd_run(args: argparse.Namespace) -> int:
    params, obstacles = _load_case(args.paramfile, args.obstaclefile)
    if args.max_iters is not None:
        import dataclasses

        params = dataclasses.replace(params, max_iters=args.max_iters)
    if args.mesh is not None and args.shards != 1:
        raise SystemExit("give either --shards N (1-D mesh) or --mesh "
                         "PYxPX (2-D mesh), not both")
    if args.shards is not None and args.shards < 1:
        raise SystemExit(f"--shards must be positive, got {args.shards}")
    sharded = args.mesh is not None or (args.shards and args.shards > 1)
    if sharded:
        # Flags the sharded path doesn't implement must fail loudly rather
        # than be silently ignored.
        if args.device is not None:
            raise SystemExit("--device cannot be combined with "
                             "--shards/--mesh (the mesh spans devices)")
        if args.kernel == "mega":
            raise SystemExit("--kernel mega is single-chip only; use "
                             "fused/temporal with --shards/--mesh")
        return _run_sharded(args, params, obstacles)
    if args.temporal_split is not None:
        raise SystemExit(
            "--temporal-split applies to the sharded paths "
            "(--shards/--mesh); single-chip (BY, K) selection is the "
            "measured tuning cache — run `lbm autotune` to pin it"
        )
    device = select_device(args.device)
    # Device inventory + selection line, like the reference's startup
    # stdout (``d2q9-bgk.c:911-918``, 941).
    import jax

    devices = jax.devices()
    print("Available devices:")
    for i, d in enumerate(devices):
        print(f"  {i}: {d.device_kind} ({d.platform})")
    print(f"Selected device {devices.index(device)}: {device.device_kind}")
    sim = Simulator(
        params,
        obstacles,
        kernel=args.kernel,
        device=device,
    )
    # AOT-compile the variant that will actually run, outside the timed
    # region (like clBuildProgram).  Checkpointed runs precompile their
    # own segment-length programs inside run_checkpointed.
    if not args.checkpoint_dir:
        sim.compiled(readback="fields")
    return _run_and_write(args, sim)


def _run_sharded(args, params, obstacles) -> int:
    """Multi-device run over a 1-D (``--shards N``) or 2-D
    (``--mesh PYxPX``) device mesh, with optional explicit temporal
    ``--temporal-split BYxK`` (or ``BYxKxPX`` for the x-tiled local
    schedule) — the production surface for every
    decomposition ``ShardedSimulator`` supports (the BASELINE.json
    weak-scaling configuration is drivable from this one command, like
    the reference's one-binary contract, ``d2q9-bgk.c:876-880`` +
    ``job_submit_d2q9-bgk:48-52``)."""
    from lbm_tpu.parallel.sharded import (
        ShardedSimulator,
        default_mesh,
        default_mesh_2d,
    )

    if args.mesh is not None:
        py, px = _parse_pair(args.mesh, "--mesh")
        mesh = default_mesh_2d(py, px)
        print(f"Mesh: {py}x{px} (rows x cols) over {py * px} device(s)")
    else:
        mesh = default_mesh(args.shards)
        print(f"Mesh: {args.shards} device(s), row-sharded")
    split = None
    if args.temporal_split is not None:
        parts = args.temporal_split.lower().split("x")
        if len(parts) == 3:
            # BYxKxPX: the x-tiled local schedule (PX column strips per
            # shard) — giant-width slabs (docs/PERF.md round-3/4).
            try:
                split = tuple(int(v) for v in parts)
            except ValueError:
                split = (0,)
            if len(split) != 3 or any(v < 1 for v in split):
                raise SystemExit(
                    "--temporal-split must be BYxK or BYxKxPX (e.g. "
                    f"128x4x4), got {args.temporal_split!r}"
                )
        elif len(parts) == 2:
            split = _parse_pair(args.temporal_split, "--temporal-split")
        else:
            # 1 or 4+ components: name BOTH accepted forms (delegating to
            # _parse_pair would claim the flag "must be AxB", hiding the
            # three-component x-tiled syntax the user may be one typo off).
            raise SystemExit(
                "--temporal-split must be BYxK or BYxKxPX (e.g. 128x4 or "
                f"128x4x4), got {args.temporal_split!r}"
            )
        kernel = args.kernel
        if kernel in ("auto", "reference"):
            # An explicit split names the temporal kernel; 'auto' on CPU
            # would resolve to 'reference' and ShardedSimulator rejects
            # the combination — resolve it here, loudly.
            if kernel == "reference":
                raise SystemExit(
                    "--temporal-split requires a Pallas kernel "
                    "(--kernel temporal/fused), not 'reference'"
                )
            args.kernel = "temporal"
    # Pallas TPU kernels only execute on a CPU backend in interpret mode
    # (the virtual-device test mesh); say so — interpret is orders of
    # magnitude slower and must never be mistaken for a perf path.
    import jax

    interpret = (
        jax.default_backend() == "cpu"
        and args.kernel in ("fused", "temporal")
    )
    if interpret:
        print("NOTE: CPU backend — Pallas kernels run in interpret mode "
              "(correctness only, not performance)")
    sim = ShardedSimulator(
        params,
        obstacles,
        mesh=mesh,
        kernel=args.kernel,
        temporal_split=split,
        interpret=interpret,
    )
    if not args.checkpoint_dir:
        sim.compiled()
        print(f"Kernel variant: {sim.variant()} "
              f"(steps/pass {sim.chunk()})")
    return _run_and_write(args, sim)


def cmd_bench(args: argparse.Namespace) -> int:
    if args.repeats < 1:
        raise SystemExit(f"--repeats must be >= 1, got {args.repeats}")
    params, obstacles = _load_case(args.paramfile, args.obstaclefile)
    import dataclasses

    if args.max_iters is not None:
        params = dataclasses.replace(params, max_iters=args.max_iters)
    sim = Simulator(params, obstacles, kernel=args.kernel)
    sim.compiled(readback="fields")
    best = None
    for _ in range(args.repeats):
        res = sim.run(readback="fields")
        best = res if best is None or res.elapsed < best.elapsed else best
    print(
        json.dumps(
            {
                "metric": f"MLUPS {params.nx}x{params.ny}",
                "value": round(best.mlups, 1),
                "unit": "MLUPS",
                "elapsed_s": round(best.elapsed, 4),
                "reynolds": best.reynolds,
            }
        )
    )
    return 0


def cmd_autotune(args: argparse.Namespace) -> int:
    """Measure temporal (BY, K) candidates on the actual device and record
    the winners in the tuning cache (the automatic analog of the
    reference's per-grid workgroup tuning, ``d2q9-bgk.c:634-637``)."""
    import dataclasses

    from lbm_tpu.config import CANONICAL_PARAMS, LBMParams
    from lbm_tpu.geometry import canonical_obstacles, channel_box
    from lbm_tpu.tuning import autotune_sweep, refresh_incumbents

    if bool(args.case) == bool(args.grid):
        raise SystemExit("give exactly one of --case / --grid")
    if args.steps < 1:
        raise SystemExit(f"--steps must be >= 1, got {args.steps}")
    if args.repeats < 1:
        raise SystemExit(f"--repeats must be >= 1, got {args.repeats}")
    if args.case:
        params = CANONICAL_PARAMS[args.case]
        obstacles = canonical_obstacles(args.case)
    else:
        ny, nx = _parse_pair(args.grid, "--grid")
        params = LBMParams(nx, ny, args.steps, 10, 0.1, 0.005, 1.85)
        obstacles = channel_box(nx, ny)
    params = dataclasses.replace(params, max_iters=args.steps)

    if args.refresh:
        # Stale-cache guard (tuning.py docstring): re-time ONLY the
        # recorded incumbents and warn on ranking/timing drift; fall back
        # to the full sweep when the cache has nothing for this shape.
        results = refresh_incumbents(
            params,
            obstacles,
            steps=args.steps,
            repeats=args.repeats,
            record_results=not args.dry_run,
        )
        if not results:
            print("falling back to a full sweep", flush=True)
    else:
        results = []
    if not results:
        results = autotune_sweep(
            params,
            obstacles,
            steps=args.steps,
            repeats=args.repeats,
            record_results=not args.dry_run,
        )
    if not results:
        print("no candidate compiled and ran")
        return 1
    by, k, us, px = (*results[0], 1)[:4]
    glups = params.ny * params.nx / us / 1e3
    tag = f", Px={px}" if px > 1 else ""
    print(f"best: (BY={by}, K={k}{tag}) at {us:.2f} us/step = {glups:.1f} GLUPS")
    print(
        json.dumps(
            {
                "ny": params.ny,
                "nx": params.nx,
                "by": by,
                "k": k,
                "px": px,
                "us_per_step": round(us, 2),
            }
        )
    )
    return 0


def cmd_autotune_main(argv: list[str] | None = None) -> int:
    """Entry point reused by ``tools/autotune.py``: parse only the
    autotune flags and run the sweep."""
    parser = argparse.ArgumentParser(description=cmd_autotune.__doc__)
    _add_autotune_args(parser)
    args = parser.parse_args(argv)
    return cmd_autotune(args)


def _add_autotune_args(parser: argparse.ArgumentParser) -> None:
    from lbm_tpu.config import CANONICAL_PARAMS

    parser.add_argument("--case", choices=sorted(CANONICAL_PARAMS))
    parser.add_argument("--grid", help="NYxNX for a non-canonical grid")
    parser.add_argument(
        "--steps",
        type=int,
        default=960,
        help="timed scan length (divisible by 16 keeps every K candidate "
        "eligible)",
    )
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="measure and print but do not write the cache",
    )
    parser.add_argument(
        "--refresh",
        action="store_true",
        help="re-time only the recorded incumbents (minutes cheaper than "
        "a full sweep) and warn if the ranking or winner timing drifted — "
        "the stale-cache check after a kernel change; falls back to a "
        "full sweep when the cache has no entry for this shape",
    )


def cmd_check(args: argparse.Namespace) -> int:
    from lbm_tpu.checker import compare_files

    ok = compare_files(
        ref_av_vels=args.ref_av_vels_file,
        ref_final_state=args.ref_final_state_file,
        av_vels=args.av_vels_file,
        final_state=args.final_state_file,
        tolerance=args.tolerance,
    )
    return 0 if ok else 1


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="lbm", description="TPU-native D2Q9-BGK lattice-Boltzmann solver"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="simulate and write output files")
    run.add_argument("paramfile")
    run.add_argument("obstaclefile")
    run.add_argument("--output-dir", default=".")
    run.add_argument("--kernel", default="auto",
                     choices=["auto", "fused", "temporal", "mega", "reference"])
    run.add_argument("--device", default=None, help="device index (LBM_DEVICE analog)")
    run.add_argument("--max-iters", type=int, default=None)
    run.add_argument("--profile", default=None, metavar="TRACE_DIR",
                     help="write a jax.profiler trace")
    run.add_argument("--checkpoint-dir", default=None,
                     help="snapshot resumable state here (and resume from it)")
    run.add_argument("--checkpoint-every", type=int, default=10000,
                     metavar="STEPS")
    run.add_argument("--shards", type=int, default=1,
                     help="row-shard over N devices (1-D mesh)")
    run.add_argument("--mesh", default=None, metavar="PYxPX",
                     help="2-D spatial decomposition over a PYxPX device "
                     "mesh (rows x cols); exclusive with --shards")
    run.add_argument("--temporal-split", default=None, metavar="BYxK[xPX]",
                     help="explicit temporal kernel split for the sharded "
                     "paths: BY-row blocks advancing K steps per pass; "
                     "a third component PX selects the x-tiled local "
                     "schedule with PX column strips per shard "
                     "(default: measured tuning cache / heuristic)")
    run.set_defaults(func=cmd_run)

    bench = sub.add_parser("bench", help="timed run, JSON metric output")
    bench.add_argument("paramfile")
    bench.add_argument("obstaclefile")
    bench.add_argument("--kernel", default="auto",
                       choices=["auto", "fused", "temporal", "mega",
                                "reference"])
    bench.add_argument("--max-iters", type=int, default=None)
    # Best-of-4 by default: a fresh process's first dispatch pays transport
    # warmup on the tunneled TPU (see bench.py), so repeats=1 under-reports.
    bench.add_argument("--repeats", type=int, default=4)
    bench.set_defaults(func=cmd_bench)

    check = sub.add_parser("check", help="compare outputs against references")
    check.add_argument("--tolerance", type=float, default=1.0)
    check.add_argument("--ref-av-vels-file", required=True)
    # final_state comparison is optional: the reference stripped the big
    # final_state goldens (check/.MISSING_LARGE_BLOBS), av_vels-only there.
    check.add_argument("--ref-final-state-file", default=None)
    check.add_argument("--av-vels-file", required=True)
    check.add_argument("--final-state-file", default=None)
    check.set_defaults(func=cmd_check)

    tune = sub.add_parser(
        "autotune",
        help="measure temporal (BY, K) candidates, record the tuning cache",
    )
    _add_autotune_args(tune)
    tune.set_defaults(func=cmd_autotune)
    return parser


_COMMANDS = ("run", "bench", "check", "autotune")


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    # Reference invocation contract: ``d2q9-bgk <paramfile> <obstaclefile>``
    # (``d2q9-bgk.c:876-880``) — a bare invocation defaults to ``run``.
    if argv and argv[0] not in _COMMANDS and not argv[0].startswith("-"):
        argv = ["run", *argv]
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
