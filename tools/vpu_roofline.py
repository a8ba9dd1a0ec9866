#!/usr/bin/env python3
"""Measure the chip's practical VPU throughput ceiling (docs/PERF.md
roofline section).

The LBM step is VPU-bound (docs/PERF.md ablation), so "how fast can it
possibly go" needs a denominator: the sustained element-wise op rate a
Pallas kernel can actually reach on THIS chip — not a datasheet number
(public spec sheets give MXU FLOP/s; the VPU rate must be derived from
lane count x ALUs x clock, and the achievable fraction of even that is
an empirical question).

Method: one VMEM-resident [ROWS, 128] f32 block, a fori_loop of UNROLL
independent whole-block ops per iteration (the block itself provides
ILP: ROWS*128/(8*128) = ROWS/8 independent (8,128) vregs per op, far
more than any ALU latency), timed over a lax.scan of pallas_call's with
a device_get sync (CLAUDE.md: block_until_ready under-reports through
the tunnel).  Three instruction mixes:

* ``fma``  — x = x*a + b      (2 FLOP/element if Mosaic fuses; the
              fused-vs-not question is exactly what the measurement
              answers)
* ``add``  — x = x + a        (1 op/element; the pure issue rate)
* ``mix``  — the production kernel's blend, 104 issue-ops/element traced
              from ``_collide`` incl. the mask compare
              (tests/test_perf_model.py pins the count): 91 add/sub/mul
              + 10 selects + 1 cmp + 1 div + 1 sqrt; the synthetic body
              below issues 106 — within the 3% the test allows.  (The
              block reduce amortizes to ~0; the 6 lane-rolls and mask
              widen are schedule ops outside the blend.)

Prints one JSON line per mix with achieved Gop/s (counting every traced
op as ONE issue — FMA fusion shows up as >1 op/issue, i.e. an ``fma``
rate above the ``add`` rate).

Usage: python tools/vpu_roofline.py [--rows 512] [--unroll 64]
                                    [--inner 400] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _build(mix: str, rows: int, unroll: int, inner: int, steps: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f32 = jnp.float32

    def body(x_ref, o_ref):
        a = f32(1.0000001)
        b = f32(1e-30)

        # The mix body is already 106 ops/iteration; unrolling it too
        # would blow compile time and run minutes — unroll only the
        # 1-2-op mixes.
        reps = unroll if mix in ("fma", "add") else 1

        def one(_, x):
            for _ in range(reps):
                if mix == "fma":
                    x = x * a + b
                elif mix == "add":
                    x = x + b
                else:  # mix: 105-op _collide blend per "cell" (element)
                    # 91 add/sub/mul in the kernel's ~1:0.7:1 ratio,
                    # 10 selects, 1 div, 1 sqrt (reduce-add + rolls are
                    # excluded here; they are schedule-level ops).
                    m = x > f32(0.5)
                    for _ in range(10):  # 10 x (add+sub+mul) = 30
                        x = (x + b) * a - b
                    for _ in range(20):  # 20 adds
                        x = x + b
                    for _ in range(20):  # 20 muls
                        x = x * a
                    for _ in range(11):  # 11 subs
                        x = x - b
                    for _ in range(10):  # 10 selects
                        x = jnp.where(m, x, x + b)
                    x = f32(1.0) / (x + f32(1.0))  # div (+1 add)
                    x = jnp.sqrt(x + f32(1.0))  # sqrt (+1 add)
            return x

        o_ref[...] = jax.lax.fori_loop(0, inner, one, x_ref[...])

    call = pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32)
    )

    @jax.jit
    def run(x):
        def step(c, _):
            return call(c), ()

        y, _ = jax.lax.scan(step, x, None, length=steps)
        return y

    if mix == "fma":
        issues = unroll * 2  # mul + add traced separately
    elif mix == "add":
        issues = unroll * 1
    else:
        # 1 cmp + 30 (10x add,mul,sub) + 20 add + 20 mul + 11 sub
        # + 20 (10x add,select) + 2 (add,div) + 2 (add,sqrt) = 106
        # traced ops — the kernel's 105-op _collide blend plus the
        # amortized mask compare.
        issues = 106
    return run, issues


def measure(mix: str, rows: int, unroll: int, inner: int, steps: int):
    import jax
    import jax.numpy as jnp

    run, issues = _build(mix, rows, unroll, inner, steps)
    x = jnp.full((rows, 128), 1.0, jnp.float32)
    y = run(x)  # compile + warm
    float(jax.device_get(y[0, 0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x)
        float(jax.device_get(y[0, 0]))
        best = min(best, time.perf_counter() - t0)
    total_issues = rows * 128 * inner * steps * issues
    rate = total_issues / best
    print(
        json.dumps(
            {
                "mix": mix,
                "traced_ops_per_elem_iter": issues,
                "seconds": round(best, 4),
                "Gissue_per_s": round(rate / 1e9, 1),
            }
        ),
        flush=True,
    )
    return rate


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=512)
    p.add_argument("--unroll", type=int, default=64)
    p.add_argument("--inner", type=int, default=200)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument(
        "--mixes", default="add,fma,mix", help="comma list: add,fma,mix"
    )
    args = p.parse_args(argv)
    import jax

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    for mix in args.mixes.split(","):
        measure(mix, args.rows, args.unroll, args.inner, args.steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
