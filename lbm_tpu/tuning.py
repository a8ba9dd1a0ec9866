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

A 4th element ``px`` marks an x-tiled-schedule entry
(``build_temporal_xtiled_program`` with ``px`` column strips); absent
means plain row blocking (px = 1) — the legacy 3-element form stays valid.

Lookup order in ``choose_schedule``: first cache entry whose (BY, K, Px)
satisfies its kernel's structural constraints (K divides ``max_iters``
etc.), then the heuristics.  The cache file is resolved from ``LBM_TUNING_CACHE`` or
defaults to ``lbm_tpu/tuning_cache.json`` (shipped with measured v5e
entries); a missing/corrupt file silently disables the cache — tuning is
an accelerator, never a correctness dependency.

Absolute vs comparable timings: a sweep times each candidate with the
SAME scan length, so the tunnel's fixed ~15-25 ms dispatch cost adds the
same per-step constant to every entry (~24 µs/step at the default 960
steps) — rankings are exact, but the stored µs overstate the pure step
time (docs/PERF.md round-5: 47.0 µs at short loops = 42.5 µs true +
dispatch).  Use 20000-step loops when an ABSOLUTE number matters.

Staleness: cached entries outrank the heuristics by design, so a kernel
change can silently inherit timings measured on the OLD kernel (the
reference never had this problem — it re-derived its tuning every build
by baking ``-D`` constants per grid, ``d2q9-bgk.c:639-663``).  Two
guards: (1) every :func:`record` stamps per-key provenance (UTC date,
repo commit when available, sweep steps/repeats) under the top-level
``"__meta__"`` key, so a reviewer can see exactly when and at what
commit an entry was measured; (2) ``lbm autotune --refresh``
(:func:`refresh_incumbents`) re-times ONLY the recorded candidates —
minutes cheaper than a full sweep — re-records them with fresh timings
and provenance, and warns when the ranking changed or the winner
drifted, the signal to re-run the full sweep.
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


def lookup(
    device_kind: str, ny: int, nx: int
) -> list[tuple[int, int, int]]:
    """Ranked measured (BY, K, Px) candidates for this device/grid (best
    first; Px = 1 for plain row-blocked entries — the 3-element legacy
    entry form); [] when the cache has no entry."""
    entries = load_cache().get(_key(device_kind, ny, nx), [])
    if not isinstance(entries, list):
        return []
    out = []
    for e in entries:
        # Tolerate malformed entries (hand-edited cache files): the cache
        # is an accelerator, never a correctness dependency.
        try:
            if isinstance(e, (list, tuple)) and len(e) >= 2:
                px = int(e[3]) if len(e) >= 4 else 1
                out.append((int(e[0]), int(e[1]), px))
        except (TypeError, ValueError):
            continue
    return out


def _provenance(steps: int | None, repeats: int | None) -> dict:
    """Per-key measurement provenance: when, at what repo commit (None
    when the package is not inside a git checkout), and how the timing
    was taken.  Stamped by :func:`record` so a stale entry is at least
    VISIBLY stale (module docstring: the staleness story)."""
    import datetime
    import subprocess

    commit = None
    try:
        out = subprocess.run(
            ["git", "-C", str(pathlib.Path(__file__).parent),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        if out.returncode == 0:
            commit = out.stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        pass
    meta = {
        "recorded": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "commit": commit,
    }
    if steps is not None:
        meta["steps"] = int(steps)
    if repeats is not None:
        meta["repeats"] = int(repeats)
    return meta


META_KEY = "__meta__"


def provenance_of(device_kind: str, ny: int, nx: int) -> dict:
    """The provenance stamp recorded with this device/grid's entries
    ({} for pre-provenance legacy entries or no entry)."""
    meta = load_cache().get(META_KEY, {})
    if not isinstance(meta, dict):
        return {}
    entry = meta.get(_key(device_kind, ny, nx), {})
    return entry if isinstance(entry, dict) else {}


def record(
    device_kind: str,
    ny: int,
    nx: int,
    results: list[tuple],
    steps: int | None = None,
    repeats: int | None = None,
) -> pathlib.Path:
    """Store measured ``(by, k, us_per_step[, px])`` results (sorted
    fastest first; ``px`` defaults to 1 = plain row blocking and is
    stored only when > 1, keeping the legacy 3-element entry form) for
    this device/grid, merging with existing entries for other keys, and
    stamp the key's provenance under ``"__meta__"`` (date / commit /
    sweep ``steps`` / ``repeats``).  Atomic write."""
    path = cache_path()
    cache = dict(load_cache())
    key = _key(device_kind, ny, nx)
    cache[key] = [
        (
            [int(r[0]), int(r[1]), round(float(r[2]), 3)]
            if len(r) < 4 or int(r[3]) <= 1
            else [int(r[0]), int(r[1]), round(float(r[2]), 3), int(r[3])]
        )
        for r in sorted(results, key=lambda r: r[2])
    ]
    # Copy before mutating: load_cache() returns the lru-cached dict.
    meta = cache.get(META_KEY, {})
    meta = dict(meta) if isinstance(meta, dict) else {}
    meta[key] = _provenance(steps, repeats)
    cache[META_KEY] = meta
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


# (device_kind, ny, nx) shapes maybe_autotune_slab already swept this
# process — sweeps are minutes of remote compiles, never repeat one.
_ATTEMPTED_SWEEPS: set[tuple[str, int, int]] = set()


def autotune_on_miss_enabled() -> bool:
    """Opt-in switch (``LBM_AUTOTUNE_ON_MISS=1``) for measuring a slab
    shape's (BY, K) on first compile instead of trusting the heuristics.
    Off by default: a sweep costs minutes of remote compiles."""
    return os.environ.get("LBM_AUTOTUNE_ON_MISS", "").lower() in (
        "1",
        "true",
        "yes",
    )


def maybe_autotune_slab(
    ny: int,
    nx: int,
    device_kind: str,
    steps: int = 240,
    repeats: int = 2,
    log=None,
    schedules: tuple[str, ...] = ("row",),
) -> bool:
    """When ``LBM_AUTOTUNE_ON_MISS=1`` and the cache has no entry for this
    device/shape, run a short measured sweep on a proxy grid of that shape
    and record the winners (so the ``choose_temporal``/``choose_schedule``
    lookup that follows hits the fresh entry).  Returns True when a sweep
    ran and recorded at least one result.

    The sharded temporal factories call this with the LOCAL slab shape
    (``ny_loc x nx`` / ``nyl x w``) — the per-shard kernel is the
    single-chip temporal kernel on the slab, so a single-chip sweep of the
    slab shape measures exactly the per-shard schedule (the reference's
    per-grid hand-tuning, ``d2q9-bgk.c:634-637``, automated).  Proxy
    geometry: an empty channel box — obstacle placement doesn't change
    kernel timing (same masked algebra either way).

    Recording uses :func:`default_device_kind` (the device the sweep ran
    on); callers pass the mesh's kind only to CHECK the cache, and a
    mismatch (sweeping for a remote mesh from a host with a different
    default device) simply records under the measuring device — correct,
    since measurements only apply to the device kind that produced them.
    To keep that mismatch (or a sweep whose every candidate failed) from
    re-paying the minutes-long sweep on EVERY compile, the cache is also
    checked under the measuring device's kind and each (kind, shape) is
    attempted at most once per process.
    """
    if not autotune_on_miss_enabled():
        return False
    if device_kind and lookup(device_kind, ny, nx):
        return False  # already measured
    measuring = default_device_kind()
    if measuring != device_kind and lookup(measuring, ny, nx):
        return False  # measured on the device the sweep would run on
    attempt = (measuring, ny, nx)
    if attempt in _ATTEMPTED_SWEEPS:
        return False  # this process already swept (or failed) this shape
    _ATTEMPTED_SWEEPS.add(attempt)
    from lbm_tpu.config import LBMParams
    from lbm_tpu.geometry import channel_box

    if log is None:
        log = _print_flush
    log(
        f"LBM_AUTOTUNE_ON_MISS: no measured (BY, K) for "
        f"{device_kind or 'device'}|{ny}x{nx} — sweeping (steps={steps})"
    )
    params = LBMParams(nx, ny, steps, 10, 0.1, 0.005, 1.85)
    # ``schedules`` comes from the caller's consumption ability: the 1-D
    # sharded temporal factory (and the degenerate-x 2-D route) consume
    # x-tiled (Px > 1) entries too and pass ("row", "xtiled"); the padded
    # 2-D tile consumes px = 1 entries only — sweeping x-tiled candidates
    # there would burn ~40 s remote compiles each and then be filtered
    # out by choose_temporal.
    results = autotune_sweep(
        params,
        channel_box(nx, ny),
        steps=steps,
        repeats=repeats,
        log=log,
        schedules=schedules,
    )
    return bool(results)


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
_WINDOW_CELL_CAP_100MB = 360 * 1024


def _window_cell_cap() -> int:
    """The sweep's VMEM window cap, scaled linearly with
    ``LBM_VMEM_LIMIT_MB`` exactly like the chooser budgets in
    ``ops/fused.py`` — otherwise a larger-VMEM chip's sweep would refuse
    to measure the very configurations the scaled heuristics pick, and a
    recorded smaller-window entry would permanently outrank them via the
    cache-first precedence in ``choose_schedule``."""
    from lbm_tpu.ops.fused import _vmem_scale

    return int(_WINDOW_CELL_CAP_100MB * _vmem_scale())


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
                    if (by + 2 * k) * nx <= _window_cell_cap():
                        out.append((by, k))
                    elif skipped is not None:
                        skipped.append((by, k))
        by *= 2
    return out


def xtiled_candidates(
    ny: int, nx: int, steps: int, skipped: list | None = None
) -> list[tuple[int, int, int]]:
    """(BY, K, Px) sweep candidates for the x-tiled temporal schedule
    (``build_temporal_xtiled_program``): Px >= 2 column strips of
    lane-aligned width BX = nx/Px >= 1024 (narrower strips drown in the
    fixed 128-lane pad), windows sized against W = BX + 128.  Px walks
    nx's full divisor lattice (not just powers of two) so
    non-2048-multiple widths like 10240/12800 get swept too.  Same
    structural and VMEM rules as :func:`temporal_candidates` otherwise;
    VMEM-pruned candidates go to ``skipped`` as (BY, K, Px)."""
    from lbm_tpu.ops.fused import _XT_PAD, _xtiled_structurally_valid

    out = []
    for px in range(2, nx // 1024 + 1):
        bx = nx // px
        if nx % px != 0 or bx % 128 != 0:
            continue
        w = bx + _XT_PAD
        by = 8
        while by * 2 <= ny:
            if ny % by == 0:
                for k in (2, 4, 8, 16):
                    if _xtiled_structurally_valid(ny, nx, by, k, px, steps):
                        if (by + 2 * k) * w <= _window_cell_cap():
                            out.append((by, k, px))
                        elif skipped is not None:
                            skipped.append((by, k, px))
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
    px: int = 1,
    storage=None,
) -> float | None:
    """Best-of-``repeats`` µs/step for one (BY, K) — or, with ``px`` > 1,
    one x-tiled (BY, K, Px) — on the actual device, or None on failure
    (VMEM overflow, compile-service error, invalid split — a sweep logs
    and moves on).  Timing: long donated-carry scans synced with
    ``device_get`` (docs/PERF.md methodology — ``block_until_ready``
    under-reports through the tunnel).  ``storage`` overrides the HBM
    dtype of the carried state (fp16-residency experiment; row-blocked
    ``px == 1`` only — the x-tiled kernel is fp32-storage)."""
    import functools
    import time

    import jax

    from lbm_tpu.geometry import free_cells_of
    from lbm_tpu.ops.fused import (
        build_temporal_program,
        build_temporal_xtiled_program,
    )
    from lbm_tpu.ops.reference import init_cells

    import numpy as np

    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    if px > 1 and storage is not None:
        # A caller error, not a sweep miss — raise instead of the silent
        # None the sweep-candidate failures return.
        raise ValueError(
            "storage override requires the row-blocked schedule "
            "(px == 1); the x-tiled kernel is fp32-storage"
        )
    try:
        if px > 1:
            prog = build_temporal_xtiled_program(
                params, obstacles, fcinv, by, k, px
            )
        else:
            kwargs = {} if storage is None else {"storage": storage}
            prog = build_temporal_program(
                params, obstacles, fcinv, by, k, **kwargs
            )
    except ValueError:
        return None

    @functools.partial(jax.jit, donate_argnums=0)
    def run(c):
        return jax.lax.scan(
            lambda c, _: (prog.step(c)[0], None), c, None, length=steps // k
        )[0]

    try:
        # init0 (when the program has one) builds the carry by broadcast —
        # at giant grids init(init_cells(...)) would hold f0 AND the
        # strip-major carry at once (~20 GB at 16384² — over HBM).
        carry = (
            prog.init0() if prog.init0 is not None
            else prog.init(init_cells(params))
        )
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
    schedules: tuple[str, ...] = ("row", "xtiled"),
) -> list[tuple[int, int, float, int]]:
    """Measure every temporal candidate — row-blocked (BY, K) and x-tiled
    (BY, K, Px) — for this grid on the actual device and (optionally)
    record the ranked results in the cache.  Returns measured
    ``(by, k, us_per_step, px)`` sorted fastest first ([] when nothing
    compiled/ran).  ``schedules`` restricts the candidate pool — the
    sharded slab sweep passes ``("row",)`` because its per-shard kernel
    can only consume px = 1 entries."""
    ny, nx = params.ny, params.nx
    kind = default_device_kind()
    pruned: list[tuple] = []
    cands = []
    if "row" in schedules:
        cands += [
            (by, k, 1)
            for by, k in temporal_candidates(ny, nx, steps, skipped=pruned)
        ]
    if "xtiled" in schedules:
        pruned_xt: list[tuple[int, int, int]] = []
        cands += xtiled_candidates(ny, nx, steps, skipped=pruned_xt)
        pruned += pruned_xt
    if pruned:
        # No-silent-caps rule: the VMEM window cap is v5e-measured and may
        # be conservative on larger-VMEM devices.
        log(
            f"skipping {len(pruned)} candidate(s) beyond the measured "
            f"v5e VMEM window cap ({_window_cell_cap()} cells): "
            + ", ".join(
                f"(BY={c[0]}, K={c[1]}" + (f", Px={c[2]})" if len(c) > 2 else ")")
                for c in pruned
            )
        )
    if not cands:
        log(f"no temporal candidates for {ny}x{nx}")
        return []
    log(f"device kind: {kind}; grid {ny}x{nx}; {len(cands)} candidates")
    results = []
    for by, k, px in cands:
        us = time_temporal_candidate(
            params, obstacles, by, k, steps, repeats, log=log, px=px
        )
        status = f"{us:8.2f} us/step" if us is not None else "   failed/skipped"
        tag = f", Px={px}" if px > 1 else ""
        log(f"  (BY={by:4d}, K={k:2d}{tag}): {status}")
        if us is not None:
            results.append((by, k, us, px))
    results.sort(key=lambda r: r[2])
    if results and record_results:
        path = record(kind, ny, nx, results, steps=steps, repeats=repeats)
        log(f"recorded {len(results)} entries -> {path}")
    return results


def refresh_incumbents(
    params,
    obstacles,
    steps: int = 960,
    repeats: int = 3,
    record_results: bool = True,
    log=_print_flush,
    drift_warn_pct: float = 25.0,
) -> list[tuple[int, int, float, int]]:
    """Re-time ONLY the candidates already recorded for this device/grid
    (the ``lbm autotune --refresh`` path — minutes cheaper than a full
    sweep since the incumbents are few and their compiles disk-cached),
    re-record them with fresh timings and provenance, and WARN when the
    incumbent ranking changed or the winner's timing drifted more than
    ``drift_warn_pct`` — the stale-cache signal that a kernel change
    invalidated the old measurements and a full sweep is due (module
    docstring: the staleness story).  Returns the re-measured results
    fastest-first, or [] when the cache has no entry for this shape
    (callers fall back to the full sweep)."""
    ny, nx = params.ny, params.nx
    kind = default_device_kind()
    incumbents = lookup(kind, ny, nx)
    if not incumbents:
        log(f"no recorded entries for {kind}|{ny}x{nx} — nothing to refresh")
        return []
    stamp = provenance_of(kind, ny, nx)
    log(
        f"refreshing {len(incumbents)} recorded candidate(s) for "
        f"{kind}|{ny}x{nx}"
        + (
            f" (recorded {stamp.get('recorded')}"
            + (f" at {stamp['commit']}" if stamp.get("commit") else "")
            + ")"
            if stamp
            else " (no provenance — pre-stamp entry)"
        )
    )
    old_best = {
        (e[0], e[1], e[2] if len(e) > 2 else 1): None for e in incumbents
    }
    # Recover the recorded µs for drift reporting (lookup drops them).
    for e in load_cache().get(_key(kind, ny, nx), []):
        try:
            px = int(e[3]) if len(e) >= 4 else 1
            old_best[(int(e[0]), int(e[1]), px)] = float(e[2])
        except (TypeError, ValueError, IndexError):
            continue
    results = []
    for by, k, px in incumbents:
        us = time_temporal_candidate(
            params, obstacles, by, k, steps, repeats, log=log, px=px
        )
        tag = f", Px={px}" if px > 1 else ""
        was = old_best.get((by, k, px))
        drift = (
            f" (was {was:.2f}, {(us - was) / was * 100.0:+.1f}%)"
            if us is not None and was
            else ""
        )
        status = f"{us:8.2f} us/step{drift}" if us is not None else "   failed"
        log(f"  (BY={by:4d}, K={k:2d}{tag}): {status}")
        if us is not None:
            results.append((by, k, us, px))
    results.sort(key=lambda r: r[2])
    if not results:
        log(
            "every incumbent failed to compile/run — the cache is stale "
            "for the current kernels; run a full sweep (lbm autotune "
            "without --refresh)"
        )
        return []
    nb, nk, nus, npx = results[0]
    old_winner = (incumbents[0][0], incumbents[0][1], incumbents[0][2])
    if (nb, nk, npx) != old_winner:
        log(
            f"WARNING: winner changed (BY={old_winner[0]}, K={old_winner[1]}"
            f", Px={old_winner[2]}) -> (BY={nb}, K={nk}, Px={npx}) — the "
            "recorded ranking was stale; consider a full sweep to re-check "
            "candidates outside the incumbent set"
        )
    else:
        was = old_best.get(old_winner)
        if was and abs(nus - was) / was * 100.0 > drift_warn_pct:
            log(
                f"WARNING: winner timing drifted "
                f"{(nus - was) / was * 100.0:+.1f}% vs the recorded "
                f"{was:.2f} us/step — kernels or "
                "platform changed since the sweep; consider a full sweep"
            )
    if record_results:
        path = record(kind, ny, nx, results, steps=steps, repeats=repeats)
        log(f"re-recorded {len(results)} entries -> {path}")
    return results
