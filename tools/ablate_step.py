#!/usr/bin/env python3
"""Step-kernel ablation at 1024x1024: where do the microseconds go?

Times four kernels sharing the temporal-blocked schedule (BY, K windows,
ghost-slab carry) but with the physics progressively removed:

* ``noop``    — DMA the window in, write the center back (HBM + pipeline
  floor of the schedule: what the step would cost with zero compute);
* ``stream``  — gather the 9 pulled planes (lane/sublane rolls) and write
  them (adds the data-movement VPU work);
* ``collide`` — full physics without the av reduction;
* ``full``    — the production kernel (``ops/fused.py``).

The deltas attribute the per-step time to DMA/overhead, streaming rolls,
BGK collision math, and the masked |u| reduction.  Run on the real chip:

    python tools/ablate_step.py [--by 128] [--k 8] [--steps 4800]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.config import CANONICAL_PARAMS
from lbm_tpu.geometry import canonical_obstacles, free_cells_of
from lbm_tpu.ops.fused import (
    _vmem_limit_bytes,
    _window_advance,
    build_temporal_program,
)
from lbm_tpu.ops.lattice import CX, CY, NSPEEDS
from lbm_tpu.ops.reference import accel_weights, init_cells


def _ablated_kernel(mode, by, ksteps, nx, omega, aw1, aw2):
    """Temporal-schedule kernel with the body cut down to ``mode``:
    'noop' = DMA only; 'stream' = + pull rolls; 'collide' = the FULL
    physics (kick + stream + collision) minus the av reduction, via
    ``_window_advance(want_av=False)`` — so full - collide isolates the
    reduction exactly."""
    byext = by + 2 * ksteps

    def kernel(c_ref, gs_ref, gn_ref, maskext_ref, out_ref, gs_out, gn_out,
               avs_ref):
        f32 = jnp.float32
        i = pl.program_id(0)
        last = pl.num_programs(0) - 1
        # int8 mask, widened to f32 before comparing (Mosaic cannot
        # relayout sub-byte compare results) — the SAME operand the
        # production kernel streams, so mask traffic matches exactly.
        fluid = maskext_ref[0, :, :].astype(f32) > f32(0.5)
        planes = [
            jnp.concatenate(
                [gs_ref[0, :, k, :], c_ref[k, :, :], gn_ref[0, :, k, :]],
                axis=0,
            )
            for k in range(NSPEEDS)
        ]

        if mode == "collide":
            final, _ = _window_advance(
                planes, fluid, i == last, i == 0,
                by=by, ksteps=ksteps, nx=nx, omega=omega, aw1=aw1, aw2=aw2,
                want_av=False,
            )
        else:
            final = planes
            for _s in range(ksteps):
                if mode == "noop":
                    break
                tmp = []
                for k in range(NSPEEDS):
                    cy, cx = int(CY[k]), int(CX[k])
                    p = final[k]
                    if cy:
                        p = pltpu.roll(p, cy % byext, 0)
                    if cx:
                        p = pltpu.roll(p, cx % nx, 1)
                    tmp.append(p)
                final = tmp
        for k in range(NSPEEDS):
            out_ref[k, :, :] = final[k][ksteps : ksteps + by, :]
            gn_out[0, :, k, :] = final[k][ksteps : 2 * ksteps, :]
            gs_out[0, :, k, :] = final[k][by : by + ksteps, :]
        avs_ref[0, 0] = f32(0.0)

    return kernel


def build_ablated(mode, ny, nx, by, ksteps, omega, aw1, aw2):
    grid = ny // by
    center = pl.BlockSpec((NSPEEDS, by, nx), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    ghost_in = pl.BlockSpec((1, ksteps, NSPEEDS, nx), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    gn_out = pl.BlockSpec((1, ksteps, NSPEEDS, nx),
                          lambda i: ((i - 1) % grid, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    gs_out = pl.BlockSpec((1, ksteps, NSPEEDS, nx),
                          lambda i: ((i + 1) % grid, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    maskext = pl.BlockSpec((1, by + 2 * ksteps, nx), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    ghost_shape = jax.ShapeDtypeStruct((grid, ksteps, NSPEEDS, nx), jnp.float32)
    return pl.pallas_call(
        _ablated_kernel(mode, by, ksteps, nx, omega, aw1, aw2),
        grid=(grid,),
        in_specs=[center, ghost_in, ghost_in, maskext],
        out_specs=[center, gs_out, gn_out,
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            ghost_shape,
            ghost_shape,
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        input_output_aliases={0: 0},
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--by", type=int, default=128)
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument("--steps", type=int, default=4800)
    args = parser.parse_args(argv)

    if args.steps < args.k:
        parser.error(f"--steps ({args.steps}) must be >= --k ({args.k}): "
                     "the timer runs whole K-passes")

    params = CANONICAL_PARAMS["1024x1024"]
    obs = canonical_obstacles("1024x1024")
    fcinv = np.float32(1.0 / free_cells_of(obs))
    ny, nx = params.ny, params.nx
    by, k = args.by, args.k

    def timed(fn, carry, steps):
        executed = (steps // k) * k  # whole K-passes only

        @functools.partial(jax.jit, donate_argnums=0)
        def run(c):
            return jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                                length=executed // k)[0]

        carry = run(carry)  # compile + warmup
        jax.device_get(jax.tree.leaves(carry)[0][0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            carry = run(carry)
            jax.device_get(jax.tree.leaves(carry)[0][0, 0, 0])
            best = min(best, time.perf_counter() - t)
        return best / executed * 1e6

    f0 = init_cells(params)
    prog = build_temporal_program(params, obs, fcinv, by, k)

    def fresh_carry():
        # New arrays per mode: timed() donates the carry, so reuse across
        # modes would hand deleted buffers to the next compile.
        return prog.init(jnp.asarray(np.array(f0)))

    aw1, aw2 = accel_weights(params)
    results = {}
    for mode in ("noop", "stream", "collide"):
        call = build_ablated(mode, ny, nx, by, k,
                             float(np.float32(params.omega)),
                             float(aw1), float(aw2))

        def step(c, call=call):
            # The production carry: (f, gs, gn, int8 maskext) — the mask
            # threads through unchanged, exactly as prog.step does.
            f, gs, gn, maskext = c
            f2, gs2, gn2, _ = call(f, gs, gn, maskext)
            return (f2, gs2, gn2, maskext)

        results[mode] = timed(step, fresh_carry(), args.steps)
        print(json.dumps({"mode": mode, "us_per_step": round(results[mode], 2)}),
              flush=True)

    def step_full(c):
        return prog.step(c)[0]

    results["full"] = timed(step_full, fresh_carry(), args.steps)
    print(json.dumps({"mode": "full", "us_per_step": round(results["full"], 2)}),
          flush=True)
    print(
        json.dumps(
            {
                "attribution_us": {
                    "dma_overhead": round(results["noop"], 2),
                    "streaming_rolls": round(results["stream"] - results["noop"], 2),
                    "kick_and_collision": round(results["collide"] - results["stream"], 2),
                    "av_reduction": round(results["full"] - results["collide"], 2),
                }
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
