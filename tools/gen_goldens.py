#!/usr/bin/env python3
"""Generate vendored golden data for the test suite (SURVEY §7.1, C12).

Runs the independent float64 NumPy engine (``lbm_tpu/validation.py``) for a
prefix of each canonical case and writes ``tests/goldens/<case>.fp64gen_av_vels.dat``
in the reference ``av_vels.dat`` format.  When the reference checkout is
mounted, every generated series is cross-checked against the reference's own
golden (``/root/reference/check/<case>.av_vels.dat``) before being written,
so the vendored data is provably equivalent to the upstream goldens — but is
produced by this repo's own fp64 engine, making the test suite
self-contained without copying reference data files.

Usage: python tools/gen_goldens.py [--outdir tests/goldens] [--case NAME ...]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from lbm_tpu.config import CANONICAL_PARAMS
from lbm_tpu.geometry import canonical_obstacles
from lbm_tpu.validation import run64

# Series lengths: ALL FOUR cases vendor their FULL reference length — a
# suite without the reference mount then still exercises long-horizon fp32
# drift, the exact risk SURVEY §7 flags (256x256's 80k steps are the
# hardest drift case; 1024² is the only accel=0.01 config).  Regeneration
# cost: 1024² runs at ~0.25 s/step in float64 NumPy, so its 20000 steps
# are a one-time ~80-minute run (the other three total a few minutes).
PREFIX_STEPS = {
    "128x128": 40000,  # full length (matches check/128x128.av_vels.dat)
    "128x256": 40000,  # full length
    "256x256": 80000,  # full length (matches check/256x256.av_vels.dat)
    "1024x1024": 20000,  # full length (matches check/1024x1024.av_vels.dat)
}
# Cases that also vendor a final_state golden.  Only meaningful at full
# length (final_state is the END state), and — mirroring the upstream
# repo's own choice (check/.MISSING_LARGE_BLOBS strips the 256²/1024²
# final_state blobs) — only the two small grids, whose files are ~1-2 MB.
FINAL_STATE_CASES = ("128x128", "128x256")
REFERENCE_CHECK = pathlib.Path("/root/reference/check")
# fp64 engine vs the reference's fp32-GPU-produced goldens: the reference
# itself reports ~1e-7% fp32-vs-fp64 deviation at step 40000
# (profiles/7SimpleParallelism/128x128/check.txt); 0.1% over a short prefix
# is a conservative cross-check bound.
CROSSCHECK_TOL_PCT = 0.1


def generate(case: str, outdir: pathlib.Path) -> None:
    steps = PREFIX_STEPS[case]
    params = CANONICAL_PARAMS[case]
    obstacles = canonical_obstacles(case)
    tic = time.perf_counter()
    f, av = run64(params, obstacles, max_iters=steps)
    print(f"{case}: {steps} fp64 steps in {time.perf_counter() - tic:.1f}s")

    ref_path = REFERENCE_CHECK / f"{case}.av_vels.dat"
    if ref_path.exists():
        golden = np.loadtxt(ref_path, usecols=[1])[:steps]
        pct = np.abs((golden - av) / golden) * 100
        print(f"  cross-check vs reference golden: max {pct.max():.2e}%")
        if not pct.max() < CROSSCHECK_TOL_PCT:
            # Not an assert: the gate must survive python -O.
            raise SystemExit(
                f"{case}: fp64 engine deviates {pct.max():.4f}% from the "
                "reference golden — refusing to vendor"
            )
    else:
        print("  (reference golden not mounted; skipping cross-check)")

    outdir.mkdir(parents=True, exist_ok=True)
    out = outdir / f"{case}.fp64gen_av_vels.dat"
    with open(out, "w") as fp:
        fp.writelines(f"{i}:\t{v:.12E}\n" for i, v in enumerate(av))
    print(f"  wrote {out}")

    if case in FINAL_STATE_CASES and steps == params.max_iters:
        from lbm_tpu.io import write_final_state

        # Write to a temp path and rename only after the cross-check
        # passes, so a failing cross-check can never leave a bad golden on
        # disk (potentially clobbering a previously good one).
        out_fs = outdir / f"{case}.fp64gen_final_state.dat"
        tmp_fs = outdir / f"{case}.fp64gen_final_state.dat.tmp"
        write_final_state(tmp_fs, params, f, obstacles)
        ref_fs = REFERENCE_CHECK / f"{case}.final_state.dat"
        if ref_fs.exists():
            # The checker protocol reads columns [0, 1, 5] = x, y,
            # pressure (check/check.py:66); u_x/u_y are unchecked (and the
            # reference's own columns 2-3 carry its stale-shadowing bug,
            # d2q9-bgk.c:811,819 — deliberately not reproduced here).
            golden_fs = np.loadtxt(ref_fs, usecols=[0, 1, 5])
            ours = np.loadtxt(tmp_fs, usecols=[0, 1, 5])
            if (golden_fs[:, :2] != ours[:, :2]).any():
                tmp_fs.unlink()
                raise SystemExit(f"{case}: final_state coordinate order "
                                 "differs from the reference golden")
            fs_pct = (
                np.abs((golden_fs[:, 2] - ours[:, 2]) / golden_fs[:, 2]) * 100
            )
            print(f"  final_state cross-check: max {fs_pct.max():.2e}%")
            if not fs_pct.max() < CROSSCHECK_TOL_PCT:
                tmp_fs.unlink()
                raise SystemExit(
                    f"{case}: fp64 final_state deviates {fs_pct.max():.4f}% "
                    "from the reference golden — refusing to vendor"
                )
        else:
            print("  (reference final_state not mounted; no cross-check)")
        tmp_fs.replace(out_fs)
        print(f"  wrote {out_fs}")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--outdir",
        default=pathlib.Path(__file__).resolve().parent.parent
        / "tests"
        / "goldens",
        type=pathlib.Path,
    )
    parser.add_argument(
        "--case", action="append", choices=sorted(PREFIX_STEPS), default=None
    )
    args = parser.parse_args(argv)
    for case in args.case or PREFIX_STEPS:
        generate(case, args.outdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
