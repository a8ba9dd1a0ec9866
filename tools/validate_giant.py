#!/usr/bin/env python3
"""Giant-grid hardware validation: one command per docs/PERF.md capacity claim.

Runs, on the real chip, the measurements behind the capacity-ceiling and
carry-checkpoint sections of docs/PERF.md (reference analog: every kernel
in `/root/reference/d2q9-bgk.out:11-22` has a hardware run):

  kernel  — time the x-tiled temporal schedule (µs/step and GLUPS)
  fields  — production Simulator end-to-end with the fp16 fields readback
  ckpt    — carry-resident checkpoint: fresh segment + snapshot, then a
            resumed segment; prints the av endpoint for cross-checking
            against an uninterrupted run of the same length

Usage:
    python tools/validate_giant.py kernel --n 12288
    python tools/validate_giant.py fields --n 16384 --steps 192
    python tools/validate_giant.py ckpt --n 12288 --steps 192   # fresh
    python tools/validate_giant.py ckpt --n 12288 --steps 192 --resume

Expected (16 GiB v5e via the axon tunnel; docs/PERF.md): ~20 GLUPS at
8192/12288/16384; wall time is dominated by the host link at these sizes.
"""

from __future__ import annotations

import argparse
import sys
import time


def _setup(n: int):
    from lbm_tpu.config import LBMParams
    from lbm_tpu.geometry import channel_box

    params = LBMParams(n, n, 384, 10, 0.1, 0.01, 1.85)
    return params, channel_box(n, n)


def cmd_kernel(n: int, steps: int) -> int:
    from lbm_tpu.geometry import channel_box
    from lbm_tpu.config import LBMParams
    from lbm_tpu.tuning import time_temporal_candidate

    params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
    px = max(2, n // 2048)
    us = time_temporal_candidate(
        params, channel_box(n, n), by=128, k=4, steps=steps, repeats=2, px=px
    )
    if us is None:
        print(f"FAIL kernel {n}^2: no timing (see log above)")
        return 1
    glups = n * n / us / 1e3
    print(f"PASS kernel {n}^2 (128,4,Px={px}): {us:.1f} us/step = {glups:.1f} GLUPS")
    return 0 if glups > 15 else 1


def cmd_fields(n: int, steps: int) -> int:
    import numpy as np

    from lbm_tpu.runtime import Simulator

    params, obstacles = _setup(n)
    import dataclasses

    params = dataclasses.replace(params, max_iters=steps)
    sim = Simulator(params, obstacles, kernel="auto")
    t0 = time.time()
    sim.compiled(readback="fields")
    res = sim.run(readback="fields")
    av = np.asarray(res.av_vels)
    ok = bool(np.isfinite(av).all()) and res.fields is not None
    print(
        f"{'PASS' if ok else 'FAIL'} fields {n}^2 x{steps}: "
        f"elapsed={res.elapsed:.1f}s wall={time.time() - t0:.0f}s "
        f"steps_per_pass={res.steps_per_pass} av[-1]={av[-1]:.6e}"
    )
    return 0 if ok else 1


def cmd_ckpt(n: int, steps: int, resume: bool, ckpt_dir: str) -> int:
    import numpy as np

    from lbm_tpu.runtime import Simulator

    params, obstacles = _setup(n)
    sim = Simulator(params, obstacles, kernel="auto")
    total = 2 * steps if resume else steps
    t0 = time.time()
    res = sim.run_checkpointed(ckpt_dir, every=steps, max_iters=total)
    av = np.asarray(res.av_vels)
    ok = bool(np.isfinite(av).all()) and len(av) == total
    phase = "resume" if resume else "fresh"
    print(
        f"{'PASS' if ok else 'FAIL'} ckpt-{phase} {n}^2: "
        f"steps_timed={res.steps_timed} wall={time.time() - t0:.0f}s "
        f"av[{total - 1}]={av[-1]:.6e}  "
        f"(cross-check: must equal an uninterrupted {total}-step run's value)"
    )
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("what", choices=["kernel", "fields", "ckpt"])
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ckpt-dir", default="/tmp/lbm_validate_giant")
    args = ap.parse_args()
    if args.what == "kernel":
        return cmd_kernel(args.n, args.steps)
    if args.what == "fields":
        return cmd_fields(args.n, args.steps)
    return cmd_ckpt(args.n, args.steps, args.resume, args.ckpt_dir)


if __name__ == "__main__":
    sys.exit(main())
