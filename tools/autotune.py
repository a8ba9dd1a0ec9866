#!/usr/bin/env python3
"""Measure temporal-kernel (BY, K) candidates on the real device and
record the winners in the tuning cache (``lbm_tpu/tuning_cache.json``,
see :mod:`lbm_tpu.tuning`).

The reference tuned its workgroup geometry per grid by hand (the report's
"workgroup tuning" ladder stage, ``d2q9-bgk.c:634-637``); this makes the
TPU analog automatic: after ``python tools/autotune.py --grid 1536x1536``,
every ``Simulator`` on that grid (on the same device kind) picks the
measured-best configuration instead of the shipped heuristics.

    python tools/autotune.py --case 1024x1024
    python tools/autotune.py --grid 1536x1536 [--steps 960] [--repeats 3]
    python tools/autotune.py --case 1024x1024 --dry-run   # print, don't record

Candidates: BY over power-of-two divisors of ny (>= 2 blocks), K in
{2, 4, 8, 16} with K <= BY-2; VMEM-overflowing configurations are skipped
(compile failure is caught, mirroring Simulator.compiled's fallback
chain).  Timings use long donated-carry scans synced with device_get
(docs/PERF.md methodology).
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu import tuning
from lbm_tpu.config import CANONICAL_PARAMS, LBMParams
from lbm_tpu.geometry import canonical_obstacles, channel_box, free_cells_of
from lbm_tpu.ops.fused import build_temporal_program
from lbm_tpu.ops.reference import init_cells

# Window sizes beyond this many cells have never compiled on v5e at the
# 100 MiB scoped-VMEM limit (docs/PERF.md sweeps: (64+32)x4096 = 393k and
# (512+16)x1024 = 540k both overflow) — skip without burning a ~40 s
# remote compile on them.
_WINDOW_CELL_CAP = 360 * 1024


def candidates(ny: int, nx: int, steps: int) -> list[tuple[int, int]]:
    # BY >= 8 (Pallas row-dim tiling), power of two, >= 2 blocks.
    out = []
    by = 8
    while by * 2 <= ny:
        if ny % by == 0:
            for k in (2, 4, 8, 16):
                if (
                    k <= by - 2
                    and steps % k == 0
                    and (by + 2 * k) * nx <= _WINDOW_CELL_CAP
                ):
                    out.append((by, k))
        by *= 2
    return out


def time_candidate(
    params: LBMParams,
    obstacles: np.ndarray,
    by: int,
    k: int,
    steps: int,
    repeats: int,
) -> float | None:
    """Best-of-``repeats`` µs/step for one (BY, K), or None on failure."""
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    try:
        prog = build_temporal_program(params, obstacles, fcinv, by, k)
    except ValueError:
        return None

    @functools.partial(jax.jit, donate_argnums=0)
    def run(c):
        return jax.lax.scan(
            lambda c, _: (prog.step(c)[0], None), c, None, length=steps // k
        )[0]

    try:
        carry = prog.init(init_cells(params))
        carry = run(carry)  # compile + warmup
        jax.device_get(jax.tree.leaves(carry)[0][0, 0, 0])
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            carry = run(carry)
            jax.device_get(jax.tree.leaves(carry)[0][0, 0, 0])
            best = min(best, time.perf_counter() - t)
        return best / steps * 1e6
    except Exception as e:  # noqa: BLE001 — a sweep logs and moves on
        # VMEM overflow, compile-service failure, unlowerable block shape:
        # any per-candidate failure must not kill the whole sweep.
        print(f"      [{type(e).__name__}: {str(e).splitlines()[0][:100]}]")
        return None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", choices=sorted(CANONICAL_PARAMS))
    parser.add_argument("--grid", help="NYxNX for a non-canonical grid")
    parser.add_argument("--steps", type=int, default=960,
                        help="timed scan length (divisible by 16 keeps "
                        "every K candidate eligible)")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dry-run", action="store_true",
                        help="measure and print but do not write the cache")
    args = parser.parse_args(argv)

    if bool(args.case) == bool(args.grid):
        parser.error("give exactly one of --case / --grid")
    if args.case:
        params = CANONICAL_PARAMS[args.case]
        obstacles = canonical_obstacles(args.case)
    else:
        ny, nx = (int(v) for v in args.grid.lower().split("x"))
        params = LBMParams(nx, ny, args.steps, 10, 0.1, 0.005, 1.85)
        obstacles = channel_box(nx, ny)

    ny, nx = params.ny, params.nx
    kind = tuning.default_device_kind()
    cands = candidates(ny, nx, args.steps)
    if not cands:
        print(f"no temporal candidates for {ny}x{nx}")
        return 1
    print(f"device kind: {kind}; grid {ny}x{nx}; {len(cands)} candidates")

    results = []
    for by, k in cands:
        us = time_candidate(params, obstacles, by, k, args.steps, args.repeats)
        status = f"{us:8.2f} us/step" if us is not None else "   failed/skipped"
        print(f"  (BY={by:4d}, K={k:2d}): {status}", flush=True)
        if us is not None:
            results.append((by, k, us))
    if not results:
        print("no candidate compiled and ran")
        return 1

    results.sort(key=lambda r: r[2])
    by, k, us = results[0]
    glups = ny * nx / us / 1e3
    print(f"best: (BY={by}, K={k}) at {us:.2f} us/step = {glups:.1f} GLUPS")
    if not args.dry_run:
        path = tuning.record(kind, ny, nx, results)
        print(f"recorded {len(results)} entries -> {path}")
    print(json.dumps({"ny": ny, "nx": nx, "by": by, "k": k,
                      "us_per_step": round(us, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
