"""Fused single-pass Pallas TPU kernel for one D2Q9-BGK timestep.

This is the TPU rebuild of the reference's hand-fused ``timestep`` OpenCL
kernel (``/root/reference/kernels.cl:56-231``) with ``accelerate_flow``
(``kernels.cl:9-53``) folded in as well, so one kernel pass per step reads
the 9 distribution planes + obstacle mask once and writes the 9 new planes +
one partial-sum scalar: the bandwidth-optimal schedule for an LBM step.

Design (TPU-first, not a translation):

* ``f[9, ny, nx]`` float32 — 9-plane SoA, (sublane, lane) = (y, x).  ``nx``
  on lanes keeps every op a full-width VPU op; periodic wrap in x is a lane
  rotate (``pltpu.roll``), free of memory traffic.
* Grids whose 9 planes fit in VMEM (<= 64k cells) run as ONE program whose
  block is the whole array; periodic wrap in y is an in-register row concat.
* Larger grids walk row-blocks of ``BY`` rows.  The two wrap/halo rows each
  program needs are pre-gathered *outside* the kernel into a tiny
  ``ghost[2P, 9, nx]`` array (a ~2/BY-of-f extra read per step), because
  Pallas TPU block shapes must keep the last two dims full or (8,128)-
  aligned — a 1-row halo BlockSpec is not lowerable, and 8-row halo blocks
  would cost 8x the halo traffic.
* The body force (reference row ``ny-2``) only ever appears inside the last
  program's window (requires ``BY >= 3``; proof: ghost rows are ≡ -1 and 0
  mod BY while ny-2 ≡ BY-2), so it is applied branchlessly there before the
  gather — exactly equivalent to the reference's accelerate-then-stream
  ordering because the accelerated buffer is only read by that one step.
* The per-step mean-speed reduction accumulates across the (sequential) TPU
  grid into one SMEM scalar — subsuming the reference's two-stage
  workgroup-tree + batched ``reduce`` kernel (``kernels.cl:234-290``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.config import LBMParams
from lbm_tpu.ops.lattice import CX, CY, NSPEEDS, OPPOSITE, WEIGHTS
from lbm_tpu.ops.reference import accel_weights

# Budget for cells per (9-plane) row block: 64k cells -> 2.25 MiB per f
# block; with double-buffered in+out blocks and temporaries this stays
# within the ~16 MiB VMEM of a TPU core.
_BLOCK_CELL_BUDGET = 64 * 1024


def choose_block_rows(ny: int, nx: int) -> int | None:
    """Largest power-of-two divisor of ny fitting the VMEM budget (>= 3)."""
    by = 1
    while (
        by * 2 <= ny
        and ny % (by * 2) == 0
        and (by * 2) * nx <= _BLOCK_CELL_BUDGET
    ):
        by *= 2
    if by * nx > _BLOCK_CELL_BUDGET:
        return None  # a single row already blows the budget
    if by < 3:  # body-force fusion requires BY >= 3 (see module docstring)
        return None
    return by


def _roll_x(plane: jax.Array, shift: int) -> jax.Array:
    """Periodic shift along lanes; shift=+1 means out[x] = in[x-1]."""
    if shift == 0:
        return plane
    return pltpu.roll(plane, shift % plane.shape[-1], 1)


def _compute(
    exts: list[jax.Array],  # 9 x [BY+2, nx] extended row windows
    mask_ref,
    out_ref,
    tot_ref,
    *,
    by: int,
    omega: float,
    aw1: float,
    aw2: float,
    accelerate: jax.Array,  # bool scalar: window holds global row ny-2
):
    """Shared kernel body: body force, pull-stream, BGK+bounce-back, reduce."""
    f32 = jnp.float32

    # --- fused accelerate_flow ---------------------------------------------
    # Window row by-1 is global row ny-2 when `accelerate` is set; its
    # obstacle mask is center row by-2.
    fluid_row = mask_ref[by - 2, :] > f32(0.5)
    ok = (
        fluid_row
        & (exts[3][by - 1, :] - f32(aw1) > f32(0.0))
        & (exts[6][by - 1, :] - f32(aw2) > f32(0.0))
        & (exts[7][by - 1, :] - f32(aw2) > f32(0.0))
        & accelerate
    )
    okf = jnp.where(ok, f32(1.0), f32(0.0))
    for k, s in ((1, aw1), (5, aw2), (8, aw2), (3, -aw1), (6, -aw2), (7, -aw2)):
        # Static-slice row update (scatter is not lowerable on TPU Pallas).
        kicked = exts[k][by - 1 : by, :] + (okf * f32(s))[None, :]
        exts[k] = jnp.concatenate(
            [exts[k][: by - 1, :], kicked, exts[k][by:, :]], axis=0
        )

    # --- propagate: pull-gather with periodic wrap --------------------------
    # tmp[k][y, x] = f[k][y - cy_k, x - cx_k]; the row window picks y - cy_k.
    tmp = []
    for k in range(NSPEEDS):
        cy, cx = int(CY[k]), int(CX[k])
        tmp.append(_roll_x(exts[k][1 - cy : 1 - cy + by, :], cx))

    # --- macroscopic moments (momentum form, one reciprocal per cell) ------
    rho = functools.reduce(jnp.add, tmp)
    rho_inv = f32(1.0) / rho
    mx = tmp[1] + tmp[5] + tmp[8] - tmp[3] - tmp[6] - tmp[7]
    my = tmp[2] + tmp[5] + tmp[6] - tmp[4] - tmp[7] - tmp[8]
    msq = mx * mx + my * my

    fluid = mask_ref[...] > f32(0.5)

    # --- BGK collision + bounce-back scatter --------------------------------
    half_icsq_rinv = f32(1.5) * rho_inv
    for k in range(NSPEEDS):
        if k == 0:
            feq = f32(WEIGHTS[0]) * (rho - half_icsq_rinv * msq)
        else:
            eu = f32(CX[k]) * mx + f32(CY[k]) * my
            feq = f32(WEIGHTS[k]) * (
                rho + f32(3.0) * eu + half_icsq_rinv * (f32(3.0) * eu * eu - msq)
            )
        relaxed = tmp[k] + f32(omega) * (feq - tmp[k])
        out_ref[k, :, :] = jnp.where(fluid, relaxed, tmp[int(OPPOSITE[k])])

    # --- av_velocity partial reduction ---------------------------------------
    part = jnp.sum(jnp.where(fluid, jnp.sqrt(msq) * rho_inv, f32(0.0)))
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        tot_ref[0, 0] = part

    @pl.when(i > 0)
    def _():
        tot_ref[0, 0] += part


def _step_kernel_single(c_ref, mask_ref, out_ref, tot_ref, **kw):
    """Whole-grid-in-VMEM variant: wrap rows come from the block itself."""
    by = kw["by"]
    exts = [
        jnp.concatenate(
            [c_ref[k, by - 1 : by, :], c_ref[k, :, :], c_ref[k, 0:1, :]], axis=0
        )
        for k in range(NSPEEDS)
    ]
    _compute(exts, mask_ref, out_ref, tot_ref, accelerate=jnp.bool_(True), **kw)


def _step_kernel_blocked(c_ref, g_ref, mask_ref, out_ref, tot_ref, **kw):
    """Row-blocked variant: wrap/halo rows come from the ghost array."""
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    exts = [
        jnp.concatenate(
            [g_ref[0, k : k + 1, :], c_ref[k, :, :], g_ref[1, k : k + 1, :]],
            axis=0,
        )
        for k in range(NSPEEDS)
    ]
    _compute(exts, mask_ref, out_ref, tot_ref, accelerate=(i == last), **kw)


def build_fused_step(
    params: LBMParams, by: int, *, interpret: bool = False
) -> Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]:
    """Compile-time specialization of the kernel for one grid/physics config
    (the analog of the reference's ``-D``-baked OpenCL rebuild)."""
    ny, nx = params.ny, params.nx
    grid = ny // by
    aw1, aw2 = accel_weights(params)
    kw = dict(
        by=by,
        omega=float(np.float32(params.omega)),
        aw1=float(aw1),
        aw2=float(aw2),
    )

    common = dict(
        out_specs=[
            pl.BlockSpec(
                (NSPEEDS, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(ny * nx * 140),
            bytes_accessed=int((2 * NSPEEDS + 1) * ny * nx * 4),
            transcendentals=int(ny * nx),
        ),
        interpret=interpret,
    )
    center_spec = pl.BlockSpec(
        (NSPEEDS, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if grid == 1:
        step = pl.pallas_call(
            functools.partial(_step_kernel_single, **kw),
            grid=(1,),
            in_specs=[center_spec, mask_spec],
            **common,
        )

        def fused(f: jax.Array, fluid_mask: jax.Array):
            f_new, tot = step(f, fluid_mask)
            return f_new, tot[0, 0]

        return fused

    # Ghost rows per program: [south = (i*BY-1) % ny, north = ((i+1)*BY) % ny].
    rows = np.array(
        [r for i in range(grid) for r in ((i * by - 1) % ny, ((i + 1) * by) % ny)],
        dtype=np.int32,
    )
    ghost_spec = pl.BlockSpec(
        (2, NSPEEDS, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    step = pl.pallas_call(
        functools.partial(_step_kernel_blocked, **kw),
        grid=(grid,),
        in_specs=[center_spec, ghost_spec, mask_spec],
        **common,
    )

    def fused(f: jax.Array, fluid_mask: jax.Array):
        ghost = jnp.transpose(f[:, rows, :], (1, 0, 2))  # [2P, 9, nx]
        f_new, tot = step(f, ghost, fluid_mask)
        return f_new, tot[0, 0]

    return fused


def make_fused_step_fn(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    *,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """``step(f) -> (f_next, av_vel)`` using the fused kernel.

    Falls back to the jnp reference path when the grid doesn't admit a
    valid row-block decomposition (non power-of-two ny, tiny grids).
    """
    by = choose_block_rows(params.ny, params.nx)
    if by is None:
        from lbm_tpu.ops.reference import make_step_fn

        return make_step_fn(params, obstacles, free_cells_inv)
    fused = build_fused_step(params, by, interpret=interpret)
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.float32)
    fcinv = np.float32(free_cells_inv)

    def step(f: jax.Array) -> tuple[jax.Array, jax.Array]:
        f_new, tot = fused(f, jnp.asarray(fluid_host))
        return f_new, tot * fcinv

    return step
