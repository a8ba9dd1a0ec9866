"""Native (C) helpers; built via ``make native`` or ``pip install -e .``.

Import of :mod:`lbm_tpu._native.lbmio` is optional everywhere — pure-Python
fallbacks exist in :mod:`lbm_tpu.io` and :mod:`lbm_tpu.geometry`.
"""
