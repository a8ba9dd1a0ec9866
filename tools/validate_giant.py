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
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _setup(n: int, steps: int):
    """The canonical giant-grid case (1024²-style physics at size n).

    Single source of the params so the kernel/fields/ckpt phases cannot
    drift apart and silently validate different physics.
    """
    from lbm_tpu.config import LBMParams
    from lbm_tpu.geometry import channel_box

    params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
    return params, channel_box(n, n)


def cmd_kernel(n: int, steps: int) -> int:
    from lbm_tpu.ops.fused import choose_temporal_xtiled
    from lbm_tpu.tuning import time_temporal_candidate

    # Use the production chooser so this validates the same (BY, K, Px)
    # a real run would pick — a hardcoded px = n // 2048 silently fails
    # for non-2048-multiple widths (12800 -> px=6, which doesn't divide).
    choice = choose_temporal_xtiled(n, n, steps)
    by, k, px = choice if choice is not None else (128, 4, max(2, n // 2048))
    if steps % k:
        # time_temporal_candidate executes steps//k * k steps but divides
        # elapsed by `steps`; a non-multiple would inflate GLUPS right at
        # the pass/fail boundary.  Round down and time what actually runs.
        print(f"note: --steps {steps} rounded down to {steps - steps % k} "
              f"(multiple of K={k})")
        steps -= steps % k
    if steps == 0:
        print(f"FAIL kernel {n}^2: --steps must be >= {k}")
        return 1
    params, obstacles = _setup(n, steps)
    us = time_temporal_candidate(
        params, obstacles, by=by, k=k, steps=steps, repeats=2, px=px
    )
    if us is None:
        print(f"FAIL kernel {n}^2: no timing (see log above)")
        return 1
    glups = n * n / us / 1e3
    ok = glups > 15
    print(
        f"{'PASS' if ok else 'FAIL'} kernel {n}^2 ({by},{k},Px={px}): "
        f"{us:.1f} us/step = {glups:.1f} GLUPS"
        + ("" if ok else " (< 15 GLUPS threshold)")
    )
    return 0 if ok else 1


def cmd_fields(n: int, steps: int) -> int:
    import numpy as np

    from lbm_tpu.runtime import Simulator

    params, obstacles = _setup(n, steps)
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


def _has_checkpoint(ckpt_dir: str) -> bool:
    return any(pathlib.Path(ckpt_dir).glob("lbm_checkpoint*"))


def cmd_ckpt(n: int, steps: int, resume: bool, ckpt_dir: str) -> int:
    import numpy as np

    from lbm_tpu.runtime import Simulator

    # run_checkpointed auto-resumes from whatever the directory holds, so
    # each phase must check the directory state or it validates nothing:
    # a fresh run on a left-over snapshot does ZERO device steps (or dies
    # on the beyond-max_iters guard) yet would print PASS, and --resume
    # on an empty directory runs 2*steps from scratch without ever
    # exercising the host f<->carry resume path.
    if not resume and _has_checkpoint(ckpt_dir):
        print(
            f"FAIL ckpt-fresh {n}^2: {ckpt_dir} already holds a "
            f"checkpoint — delete it (rm -r {ckpt_dir}) or pass --resume"
        )
        return 1
    if resume and not _has_checkpoint(ckpt_dir):
        print(
            f"FAIL ckpt-resume {n}^2: no checkpoint in {ckpt_dir} — run "
            f"the fresh phase first"
        )
        return 1
    total = 2 * steps if resume else steps
    params, obstacles = _setup(n, total)
    sim = Simulator(params, obstacles, kernel="auto")
    t0 = time.time()
    res = sim.run_checkpointed(ckpt_dir, every=steps, max_iters=total)
    av = np.asarray(res.av_vels)
    ok = bool(np.isfinite(av).all()) and len(av) == total
    # The resume phase must have actually resumed: a 2*steps run that
    # loaded the step-`steps` snapshot times only the second segment.
    if resume and res.steps_timed != steps:
        ok = False
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
