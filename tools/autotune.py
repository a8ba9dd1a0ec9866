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

Thin wrapper over :func:`lbm_tpu.tuning.autotune_sweep` (also exposed as
``python -m lbm_tpu.cli autotune``).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lbm_tpu.cli import cmd_autotune_main  # noqa: E402
from lbm_tpu.tuning import temporal_candidates as candidates  # noqa: E402,F401


def main(argv=None) -> int:
    return cmd_autotune_main(argv)


if __name__ == "__main__":
    sys.exit(main())
