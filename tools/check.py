#!/usr/bin/env python3
"""Output checker CLI — flag-compatible with the reference ``check/check.py``
protocol (``make check`` harnesses can point here unchanged); the comparison
logic lives in :mod:`lbm_tpu.checker`."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lbm_tpu.checker import main

if __name__ == "__main__":
    sys.exit(main())
