#!/usr/bin/env python3
"""Run every canonical case full-length and print a results table.

The programmatic analog of the reference report's benchmark tables
(`report.odt`): per-case wall time, MLUPS, speedup vs the reference's
published Tesla K20m numbers, checker deviation vs goldens (the
reference's when mounted, else the vendored full-length fp64 goldens),
and the Reynolds invariant.

Usage: python tools/bench_all.py [--repeats N] [--markdown]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from lbm_tpu.config import CANONICAL_PARAMS
from lbm_tpu.geometry import canonical_obstacles
from lbm_tpu.runtime import Simulator

# Reference OpenCL-GPU results (Tesla K20m, report.odt / BASELINE.md).
REFERENCE_SECONDS = {
    "128x128": 0.684,
    "128x256": 1.203,
    "256x256": 4.012,
    "1024x1024": 11.69,
}
GOLDEN_DIR = pathlib.Path("/root/reference/check")
# Self-contained fallback: vendored fp64-engine goldens
# (tools/gen_goldens.py) keep the drift gate working with the reference
# mount absent.  All four vendored series are FULL length since round 4,
# so the fallback gate is as strong as the mounted one; the prefix
# handling below stays as a loudly-labeled degradation (no-silent-caps
# rule) in case a golden is ever regenerated short.
VENDORED_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"


def golden_series(case: str, max_iters: int) -> np.ndarray | None:
    """Golden av_vels for ``case``: the reference's full-length series
    when mounted, else the vendored fp64-engine series (which may be a
    prefix — the caller compares the overlapping steps and labels a
    prefix-only gate)."""
    golden_path = GOLDEN_DIR / f"{case}.av_vels.dat"
    if not golden_path.exists():
        golden_path = VENDORED_DIR / f"{case}.fp64gen_av_vels.dat"
    if not golden_path.exists():
        return None
    golden = np.loadtxt(golden_path, usecols=[1])
    if golden.size > max_iters:
        return None  # longer than the run: wrong case/params — don't gate
    return golden


def bench_case(case: str, repeats: int) -> dict:
    params = CANONICAL_PARAMS[case]
    sim = Simulator(params, canonical_obstacles(case))
    sim.compiled(readback="fields")
    best = None
    for _ in range(repeats):
        res = sim.run(readback="fields")
        if best is None or res.elapsed < best.elapsed:
            best = res
    row = {
        "case": case,
        "iters": params.max_iters,
        "seconds": best.elapsed,
        "mlups": best.mlups,
        "speedup": REFERENCE_SECONDS[case] / best.elapsed,
        "reynolds": best.reynolds,
        "av_finite": bool(np.isfinite(best.av_vels).all()),
        "max_diff_pct": float("nan"),
        "golden_steps": 0,
    }
    golden = golden_series(case, params.max_iters)
    if golden is not None:
        row["golden_steps"] = int(golden.size)
        row["max_diff_pct"] = float(
            (np.abs((golden - best.av_vels[: golden.size]) / golden) * 100).max()
        )
    return row


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--markdown", action="store_true")
    parser.add_argument(
        "--tolerance",
        type=float,
        default=1.0,
        metavar="PCT",
        help="fail (exit 1) if any case deviates more than this vs golden",
    )
    args = parser.parse_args(argv)

    rows = [bench_case(case, args.repeats) for case in REFERENCE_SECONDS]
    if args.markdown:
        print("| Case | iters | seconds | MLUPS | vs K20m | max diff | Re |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['case']} | {r['iters']} | {r['seconds']:.3f} "
                f"| {r['mlups']:.0f} | {r['speedup']:.1f}x "
                f"| {r['max_diff_pct']:.4f}% | {r['reynolds']:.4f} |"
            )
    else:
        for r in rows:
            print(
                f"{r['case']:>10}: {r['seconds']:7.3f}s {r['mlups']:7.0f} MLUPS "
                f"{r['speedup']:5.1f}x vs ref; diff {r['max_diff_pct']:.4f}%; "
                f"Re {r['reynolds']:.4f}"
            )
    # No-silent-caps: say when a case's drift gate is weaker than a
    # full-length comparison (vendored prefix golden / no golden at all).
    for r in rows:
        if r["golden_steps"] == 0:
            print(f"NOTE {r['case']}: no golden found — drift NOT gated "
                  "(finiteness only)")
        elif r["golden_steps"] < r["iters"]:
            print(f"NOTE {r['case']}: golden covers only the first "
                  f"{r['golden_steps']} of {r['iters']} steps — "
                  "prefix gate (mount /root/reference for full-length)")

    # Correctness gate: a golden-checked case that drifted out of tolerance
    # (or produced non-finite values) makes this a FAILED run, not a perf
    # report with a footnote.  Cases without a mounted golden have NaN
    # max_diff_pct and are exempt from the diff gate but must still
    # produce finite av_vels and Reynolds.  Golden presence is derived
    # from the comparison that actually RAN in bench_case (NaN marker),
    # not re-checked on the filesystem — a mount appearing/disappearing
    # mid-run must not reclassify the case.
    failed = []
    for r in rows:
        compared = not np.isnan(r["max_diff_pct"])
        if compared and not (r["max_diff_pct"] <= args.tolerance):
            failed.append(f"{r['case']} ({r['max_diff_pct']:.4f}%)")
        elif not r["av_finite"]:
            failed.append(f"{r['case']} (non-finite av_vels)")
        elif not np.isfinite(r["reynolds"]):
            failed.append(f"{r['case']} (non-finite Reynolds)")
    if failed:
        print(f"FAILED tolerance {args.tolerance}%: {', '.join(failed)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
