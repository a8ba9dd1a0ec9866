#!/usr/bin/env python3
"""Generate the canonical input files (.params + obstacle .dat).

The four shipped reference cases are a parameterized geometry family
(see :mod:`lbm_tpu.geometry`); this tool regenerates byte-equivalent-in-
meaning input files for any of them, or arbitrary channel boxes.

Usage:
    python tools/gen_inputs.py 128x128 outdir/
    python tools/gen_inputs.py --nx 512 --ny 512 --max-iters 1000 outdir/
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lbm_tpu.config import CANONICAL_PARAMS, LBMParams
from lbm_tpu.geometry import canonical_obstacles, channel_box, write_obstacle_file


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("case", nargs="?", help="canonical case name, e.g. 128x128")
    parser.add_argument("outdir", type=pathlib.Path)
    parser.add_argument("--nx", type=int)
    parser.add_argument("--ny", type=int)
    parser.add_argument(
        "--max-iters",
        type=int,
        default=None,
        help="override max_iters (canonical cases keep their shipped "
        "value; custom grids default to 1000) — used e.g. to drive a "
        "prefix-length run against a vendored prefix golden",
    )
    parser.add_argument("--density", type=float, default=0.1)
    parser.add_argument("--accel", type=float, default=0.005)
    parser.add_argument("--omega", type=float, default=1.85)
    parser.add_argument("--reynolds-dim", type=int, default=10)
    args = parser.parse_args(argv)

    args.outdir.mkdir(parents=True, exist_ok=True)
    if args.case:
        params = CANONICAL_PARAMS[args.case]
        if args.max_iters is not None:
            import dataclasses

            params = dataclasses.replace(params, max_iters=args.max_iters)
        mask = canonical_obstacles(args.case)
        name = args.case
    else:
        if not (args.nx and args.ny):
            parser.error("need a canonical case name or --nx/--ny")
        params = LBMParams(
            args.nx,
            args.ny,
            args.max_iters if args.max_iters is not None else 1000,
            args.reynolds_dim,
            args.density,
            args.accel,
            args.omega,
        )
        mask = channel_box(args.nx, args.ny)
        name = f"{args.nx}x{args.ny}"

    params.to_file(args.outdir / f"input_{name}.params")
    write_obstacle_file(args.outdir / f"obstacles_{name}.dat", mask)
    print(f"wrote input_{name}.params and obstacles_{name}.dat to {args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
