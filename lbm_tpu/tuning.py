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
import tempfile

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
    # Unique temp name: two concurrent sweeps (different grids, one host)
    # must not collide on a shared .tmp sibling; last-rename-wins is then
    # the only race left, and it loses at most the other sweep's single
    # merge (acceptable for a rare, re-runnable measurement write).
    fd, tmp_name = tempfile.mkstemp(
        dir=path.parent, prefix=path.name + ".", suffix=".tmp"
    )
    with os.fdopen(fd, "w") as fp:
        fp.write(json.dumps(cache, indent=1, sort_keys=True) + "\n")
    pathlib.Path(tmp_name).replace(path)
    return path


def default_device_kind() -> str:
    """Device kind of the default backend's first device ('' if JAX is
    unavailable — the cache is then simply skipped)."""
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return ""


# -- measurement (the autotuner core; CLI surfaces: `lbm autotune` and
# -- tools/autotune.py) ------------------------------------------------------

# Window sizes beyond this many cells have never compiled on v5e at the
# 100 MiB scoped-VMEM limit (docs/PERF.md sweeps: (64+32)x4096 = 393k and
# (512+16)x1024 = 540k both overflow) — skip without burning a ~40 s
# remote compile on them.
_WINDOW_CELL_CAP = 360 * 1024


def temporal_candidates(
    ny: int, nx: int, steps: int, skipped: list | None = None
) -> list[tuple[int, int]]:
    """(BY, K) sweep candidates: BY >= 8 (Pallas row-dim tiling), power of
    two, >= 2 blocks; K in {2, 4, 8, 16} with K <= BY-2 and K | steps;
    windows beyond the measured VMEM ceiling skipped.  The cap is a
    v5e-measured ceiling applied for every device kind; structurally-valid
    candidates it prunes are appended to ``skipped`` (when given) so a
    sweep can report them instead of silently narrowing (they might
    compile on a larger-VMEM device)."""
    out = []
    by = 8
    while by * 2 <= ny:
        if ny % by == 0:
            for k in (2, 4, 8, 16):
                if k <= by - 2 and steps % k == 0:
                    if (by + 2 * k) * nx <= _WINDOW_CELL_CAP:
                        out.append((by, k))
                    elif skipped is not None:
                        skipped.append((by, k))
        by *= 2
    return out


# Progress lines must land immediately even when stdout is piped (each
# candidate can cost a ~40 s remote compile on real hardware).
_print_flush = functools.partial(print, flush=True)


def time_temporal_candidate(
    params,
    obstacles,
    by: int,
    k: int,
    steps: int,
    repeats: int,
    log=_print_flush,
) -> float | None:
    """Best-of-``repeats`` µs/step for one (BY, K) on the actual device, or
    None on failure (VMEM overflow, compile-service error, invalid split —
    a sweep logs and moves on).  Timing: long donated-carry scans synced
    with ``device_get`` (docs/PERF.md methodology — ``block_until_ready``
    under-reports through the tunnel)."""
    import functools
    import time

    import jax

    from lbm_tpu.geometry import free_cells_of
    from lbm_tpu.ops.fused import build_temporal_program
    from lbm_tpu.ops.reference import init_cells

    import numpy as np

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
        log(f"      [{type(e).__name__}: {str(e).splitlines()[0][:100]}]")
        return None


def autotune_sweep(
    params,
    obstacles,
    steps: int = 960,
    repeats: int = 3,
    record_results: bool = True,
    log=_print_flush,
) -> list[tuple[int, int, float]]:
    """Measure every temporal (BY, K) candidate for this grid on the
    actual device and (optionally) record the ranked results in the cache.
    Returns measured ``(by, k, us_per_step)`` sorted fastest first ([]
    when nothing compiled/ran)."""
    ny, nx = params.ny, params.nx
    kind = default_device_kind()
    pruned: list[tuple[int, int]] = []
    cands = temporal_candidates(ny, nx, steps, skipped=pruned)
    if pruned:
        # No-silent-caps rule: the VMEM window cap is v5e-measured and may
        # be conservative on larger-VMEM devices.
        log(
            f"skipping {len(pruned)} candidate(s) beyond the measured "
            f"v5e VMEM window cap ({_WINDOW_CELL_CAP} cells): "
            + ", ".join(f"(BY={b}, K={k})" for b, k in pruned)
        )
    if not cands:
        log(f"no temporal candidates for {ny}x{nx}")
        return []
    log(f"device kind: {kind}; grid {ny}x{nx}; {len(cands)} candidates")
    results = []
    for by, k in cands:
        us = time_temporal_candidate(
            params, obstacles, by, k, steps, repeats, log=log
        )
        status = f"{us:8.2f} us/step" if us is not None else "   failed/skipped"
        log(f"  (BY={by:4d}, K={k:2d}): {status}")
        if us is not None:
            results.append((by, k, us))
    results.sort(key=lambda r: r[2])
    if results and record_results:
        path = record(kind, ny, nx, results)
        log(f"recorded {len(results)} entries -> {path}")
    return results
