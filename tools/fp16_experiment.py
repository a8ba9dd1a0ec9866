#!/usr/bin/env python3
"""fp16-resident-f experiment (VERDICT r3 item 3): measure, then decide.

The temporal kernel's two untapped levers are the ~19 µs/pass DMA floor
(docs/PERF.md ablation) and the 9 GiB f at 16384² (capacity ceiling).
Storing f (and the ghost slabs) as float16 in HBM halves both; in-kernel
arithmetic stays fp32 (widen on load, round ONCE per K-step pass on
store — ``ops/fused.py`` ``build_temporal_program(storage=...)``).  The
risk is per-pass rounding compounding over the reference horizons
(80000 steps at 256² is the hardest case) against the checker's 1%
relative tolerance (``check/check.py`` — the behavior bound; the
reference itself stores fp32 everywhere, ``kernels.cl``).

Two subcommands, both on the real chip:

* ``drift --case 256x256|1024x1024`` — run the fp16-storage temporal
  program FULL-LENGTH and compare every av_vels entry against the fp64
  golden (vendored ``tests/goldens/``, falling back to the mounted
  reference series).  Prints max/percentile drift and PASS/FAIL vs the
  checker's 1% bound.
* ``time --grid NYxNX [--by B --k K] [--steps N]`` — best-of-repeats
  µs/step for fp32 vs bfloat16 vs float16 storage at the SAME (BY, K)
  (the production-tuned pick by default), isolating the storage-dtype
  lever from schedule tuning.  (float16 does not lower on v5e Mosaic;
  bfloat16 — the TPU-native 16-bit format — is the real candidate.)

Results and the keep/reject decision land in docs/PERF.md (round 4).
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN_DIR = REPO / "tests" / "goldens"
REFERENCE_CHECK = pathlib.Path("/root/reference/check")
TOL_PCT = 1.0  # the reference checker's pass bound (check/check.py)


def _golden_av(case: str, max_iters: int) -> np.ndarray:
    """Full-length fp64 golden av series: vendored if full-length, else
    the mounted reference's own golden."""
    vendored = GOLDEN_DIR / f"{case}.fp64gen_av_vels.dat"
    if vendored.exists():
        g = np.loadtxt(vendored, usecols=[1])
        if g.size == max_iters:
            return g
        print(f"note: vendored golden is a {g.size}-step prefix; "
              "trying the reference mount")
    ref = REFERENCE_CHECK / f"{case}.av_vels.dat"
    if ref.exists():
        g = np.loadtxt(ref, usecols=[1])
        if g.size >= max_iters:
            return g[:max_iters]
    raise SystemExit(f"no full-length golden available for {case}")


def cmd_drift(case: str, storage_name: str) -> int:
    import jax
    import jax.numpy as jnp

    from lbm_tpu.config import CANONICAL_PARAMS
    from lbm_tpu.geometry import canonical_obstacles, free_cells_of
    from lbm_tpu.ops.fused import build_temporal_program, choose_temporal
    from lbm_tpu.ops.reference import init_cells

    params = CANONICAL_PARAMS[case]
    obs = canonical_obstacles(case)
    fcinv = np.float32(1.0 / free_cells_of(obs))
    golden = _golden_av(case, params.max_iters)

    picked = choose_temporal(params.ny, params.nx, params.max_iters)
    if picked is None:
        # The small cases are below the whole-grid multi-step budget so
        # the production chooser never picks temporal — force a canonical
        # (BY=128, K=8) split (still the temporal kernel under test; the
        # storage dtype, not the schedule, is the experiment variable).
        picked = (128, 8)
    by, k = picked
    if by >= params.ny:
        # Temporal blocking needs >= 2 row blocks.
        by = params.ny // 2
        k = min(k, by - 2)
    storage = jnp.dtype(storage_name)
    print(f"{case}: temporal (BY={by}, K={k}) storage={storage.name}, "
          f"{params.max_iters} steps")

    prog = build_temporal_program(
        params, obs, fcinv, by, k, storage=storage
    )

    @jax.jit
    def run(carry):
        def body(c, _):
            c2, avs = prog.step(c)
            return c2, avs

        _, avs = jax.lax.scan(
            body, carry, None, length=params.max_iters // prog.chunk
        )
        return avs.reshape(-1)

    # Mask rides as a runtime operand (HLO-literal invariant — the
    # embedded int8 mask would bloat the remote compile request).
    f0 = jnp.asarray(np.asarray(init_cells(params)))
    carry = prog.init(f0, jnp.asarray(prog.consts[0]))
    tic = time.perf_counter()
    av = np.asarray(jax.device_get(run(carry)), dtype=np.float64)
    elapsed = time.perf_counter() - tic
    print(f"  ran in {elapsed:.1f}s (incl. compile)")

    pct = np.abs((golden - av) / golden) * 100.0
    # Re = av · reynolds_dim / nu (diagnostics.calc_reynolds recomputes
    # av from f; here the final av entry IS the av).
    re_target = float(av[-1]) * params.reynolds_dim / params.viscosity
    re_golden = float(golden[-1]) * params.reynolds_dim / params.viscosity
    ok = bool(np.isfinite(av).all()) and float(pct.max()) < TOL_PCT
    print(json.dumps({
        "case": case,
        "storage": storage.name,
        "by": by, "k": k,
        "steps": params.max_iters,
        "max_pct": round(float(pct.max()), 4),
        "argmax_step": int(pct.argmax()),
        "p99_pct": round(float(np.percentile(pct, 99)), 4),
        "final_pct": round(float(pct[-1]), 4),
        "reynolds": round(re_target, 6),
        "reynolds_golden": round(re_golden, 6),
        "tol_pct": TOL_PCT,
        "pass": ok,
    }))
    return 0 if ok else 1


def cmd_time(grid: str, by: int | None, k: int | None, steps: int,
             repeats: int) -> int:
    import jax.numpy as jnp

    from lbm_tpu.config import LBMParams
    from lbm_tpu.geometry import channel_box
    from lbm_tpu.ops.fused import choose_temporal
    from lbm_tpu.tuning import time_temporal_candidate

    ny, nx = (int(v) for v in grid.split("x"))
    params = LBMParams(nx, ny, steps, 10, 0.1, 0.01, 1.85)
    obs = channel_box(nx, ny)
    if by is None or k is None:
        picked = choose_temporal(ny, nx, steps)
        if picked is None:
            raise SystemExit(
                f"{grid}: no row-blocked temporal split; pass --by/--k"
            )
        by, k = picked
    steps -= steps % k
    print(f"{grid}: (BY={by}, K={k}), {steps} steps x {repeats} repeats")

    # float16 does NOT lower on v5e Mosaic (the remote compiler's
    # tpu_compile_helper exits 1 — measured round 4); bfloat16 is the
    # hardware's 16-bit storage format and is the production candidate.
    # fp16 stays in the sweep so the failure is re-checked per device kind.
    out = {}
    for name, storage in (
        ("float32", None),
        ("bfloat16", jnp.bfloat16),
        ("float16", jnp.float16),
    ):
        us = time_temporal_candidate(
            params, obs, by=by, k=k, steps=steps, repeats=repeats,
            storage=storage,
        )
        out[name] = us
        glups = ny * nx / us / 1e3 if us else None
        print(json.dumps({
            "grid": grid, "storage": name, "by": by, "k": k,
            "us_per_step": round(us, 2) if us else None,
            "glups": round(glups, 2) if glups else None,
        }), flush=True)
    for n16 in ("bfloat16", "float16"):
        if out.get("float32") and out.get(n16):
            print(json.dumps({
                "grid": grid,
                f"speedup_{n16}_vs_fp32": round(out["float32"] / out[n16], 3),
            }))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_drift = sub.add_parser("drift")
    p_drift.add_argument("--case", required=True,
                         choices=["128x128", "128x256", "256x256",
                                  "1024x1024"])
    p_drift.add_argument("--storage", default="float16",
                         choices=["float16", "bfloat16", "float32"])
    p_time = sub.add_parser("time")
    p_time.add_argument("--grid", required=True, help="NYxNX")
    p_time.add_argument("--by", type=int, default=None)
    p_time.add_argument("--k", type=int, default=None)
    p_time.add_argument("--steps", type=int, default=4800)
    p_time.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args(argv)
    if args.cmd == "drift":
        return cmd_drift(args.case, args.storage)
    return cmd_time(args.grid, args.by, args.k, args.steps, args.repeats)


if __name__ == "__main__":
    sys.exit(main())
