"""Measured kernel-tuning cache (per device kind / grid shape).

The reference tuned its OpenCL workgroup geometry by hand per grid
(``/root/reference/d2q9-bgk.c:634-637`` and the report's "workgroup
tuning" ladder stage).  The TPU analog is the temporal kernel's (BY, K)
choice: :func:`lbm_tpu.ops.fused.choose_temporal` ships width-dependent
heuristics measured on v5e (docs/PERF.md sweeps), and this module adds the
production path — ``tools/autotune.py`` *measures* the candidates on the
actual device and records the winners here, so any grid shape (not just
the four canonical cases) runs at its measured-best configuration.

Cache format (JSON)::

    {"<device_kind>|<ny>x<nx>": [[by, k, us_per_step], ...]}  # best first

Lookup order in ``choose_temporal``: first cache entry whose K divides
``max_iters`` (and satisfies the kernel's structural constraints), then
the heuristics.  The cache file is resolved from ``LBM_TUNING_CACHE`` or
defaults to ``lbm_tpu/tuning_cache.json`` (shipped with measured v5e
entries); a missing/corrupt file silently disables the cache — tuning is
an accelerator, never a correctness dependency.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib

_DEFAULT_PATH = pathlib.Path(__file__).parent / "tuning_cache.json"


def cache_path() -> pathlib.Path:
    return pathlib.Path(os.environ.get("LBM_TUNING_CACHE", _DEFAULT_PATH))


def _key(device_kind: str, ny: int, nx: int) -> str:
    return f"{device_kind}|{ny}x{nx}"


@functools.lru_cache(maxsize=8)
def _load(path_str: str, mtime: float) -> dict:
    del mtime  # cache-buster: reload when the file changes
    try:
        with open(path_str) as fp:
            data = json.load(fp)
        return data if isinstance(data, dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def load_cache() -> dict:
    """The parsed cache ({} when absent/corrupt); reloaded on file change."""
    path = cache_path()
    try:
        mtime = path.stat().st_mtime
    except OSError:
        return {}
    return _load(str(path), mtime)


def lookup(device_kind: str, ny: int, nx: int) -> list[tuple[int, int]]:
    """Ranked measured (BY, K) candidates for this device/grid (best
    first); [] when the cache has no entry."""
    entries = load_cache().get(_key(device_kind, ny, nx), [])
    if not isinstance(entries, list):
        return []
    out = []
    for e in entries:
        # Tolerate malformed entries (hand-edited cache files): the cache
        # is an accelerator, never a correctness dependency.
        try:
            if isinstance(e, (list, tuple)) and len(e) >= 2:
                out.append((int(e[0]), int(e[1])))
        except (TypeError, ValueError):
            continue
    return out


def record(
    device_kind: str,
    ny: int,
    nx: int,
    results: list[tuple[int, int, float]],
) -> pathlib.Path:
    """Store measured ``(by, k, us_per_step)`` results (sorted fastest
    first) for this device/grid, merging with existing entries for other
    keys.  Atomic write."""
    path = cache_path()
    cache = dict(load_cache())
    cache[_key(device_kind, ny, nx)] = [
        [int(by), int(k), round(float(us), 3)]
        for by, k, us in sorted(results, key=lambda r: r[2])
    ]
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(cache, indent=1, sort_keys=True) + "\n")
    tmp.replace(path)
    return path


def default_device_kind() -> str:
    """Device kind of the default backend's first device ('' if JAX is
    unavailable — the cache is then simply skipped)."""
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return ""
