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
* Grids whose 9 planes fit in VMEM (<= 256k cells) run whole-grid: either
  ONE program per step (wrap in y is an in-register row concat) or, given
  ``max_iters``, the multi-step kernel advancing N timesteps per launch.
* Larger grids walk row-blocks of ``BY`` rows.  The two wrap/halo rows each
  program needs are **carried through the time loop as a ghost-row state**
  ``(ghost_s, ghost_n)[P, 9, nx]`` that the kernel itself emits as extra
  outputs: program ``i`` writes its first/last post-collision rows into the
  ghost slots of programs ``i-1`` / ``i+1`` (index maps ``(i∓1) % P``).
  Measured on v5e this is ~3x faster than re-gathering halo rows from ``f``
  between steps (the gather+transpose costs ~125 us/step at 1024^2; the
  fused ghost writes are free), and Pallas cannot express 1-row halo
  BlockSpecs directly (last-two-dims tiling constraint).
* The body force (reference row ``ny-2``) only ever appears inside the last
  program's window (requires ``BY >= 3``; proof: ghost rows are ≡ -1 and 0
  mod BY while ny-2 ≡ BY-2), so it is applied branchlessly there before the
  gather — exactly equivalent to the reference's accelerate-then-stream
  ordering because the accelerated buffer is only read by that one step.
* The per-step mean-speed reduction accumulates across the (sequential) TPU
  grid into one SMEM scalar — subsuming the reference's two-stage
  workgroup-tree + batched ``reduce`` kernel (``kernels.cl:234-290``).
* BGK equilibrium computed per opposite-speed pair (shared e·m² terms:
  ``feq_{k,opp} = shared ± beta``), halving the collision flops.
* Every kernel updates ``f`` **in place** (``input_output_aliases={0: 0}``):
  with halo rows supplied by the carried ghost state, each f row is read
  only by the program that rewrites it, so no double buffer is needed.
  This removes the per-step whole-array defensive copy XLA otherwise
  inserts around the custom call inside ``lax.scan`` (measured: the copy
  cost as much as the kernel at 1024², and ~5x at 4096²).  The reference
  needs its cells/tmp_cells ping-pong (``d2q9-bgk.c:214-237``) precisely
  because its kernel re-reads neighbor rows from the same global array.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.config import LBMParams
from lbm_tpu.ops.lattice import (
    CX,
    CY,
    KICK_SIGNS,
    NSPEEDS,
    OPPOSITE,
    WEIGHTS,
    kick_scale,
)
from lbm_tpu.ops.reference import accel_weights, uniform_weights

# Mosaic's default scoped-VMEM limit is 16 MiB, far below the v5e's
# physical VMEM; all kernels raise it (measured: BY=128 row blocks and
# 48-row temporal windows compile and run faster once unlocked).
#
# These limits — and the cell budgets below, which were measured AGAINST
# this limit on v5e — govern every device kind.  On a chip with more
# VMEM, either set ``LBM_VMEM_LIMIT_MB`` (the cell budgets scale
# linearly with it: window VMEM use is proportional to cells) or let
# ``LBM_AUTOTUNE_ON_MISS=1`` sweep the real hardware once — the tuning
# cache is keyed per device kind, so a measured pick always beats these
# heuristics (lbm_tpu/tuning.py).
#
# All of these are LAZY accessors, read at kernel-build/chooser time,
# never at import time: setting ``LBM_VMEM_LIMIT_MB`` after importing
# lbm_tpu works (round-4 VERDICT weak 3 — the import-time module
# constants silently ignored late env changes).
def _vmem_limit_mb_from_env() -> int:
    raw = os.environ.get("LBM_VMEM_LIMIT_MB", "100")
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"LBM_VMEM_LIMIT_MB must be an integer MiB count, got {raw!r}"
        ) from None


def _vmem_limit_bytes() -> int:
    return _vmem_limit_mb_from_env() * 1024 * 1024


def _vmem_scale() -> float:
    """Cell-budget multiplier vs the 100 MiB v5e-measured baseline."""
    return _vmem_limit_bytes() / (100 * 1024 * 1024)


def _block_cell_budget() -> int:
    """Cells per (9-plane) row block (with the raised VMEM limit)."""
    return int(128 * 1024 * _vmem_scale())


def _multistep_cell_budget() -> int:
    """Grids up to this many cells run the whole-grid multi-step kernel
    (f plus ~2x temporaries resident in VMEM for N timesteps/launch)."""
    return int(256 * 1024 * _vmem_scale())


@dataclasses.dataclass(frozen=True)
class StepProgram:
    """A compiled-step protocol: scan carries an opaque state pytree.

    ``init(f0) -> carry``; ``step(carry) -> (carry, av)``;
    ``final(carry) -> f``.  ``chunk`` is the number of timesteps one
    ``step`` call advances (``av`` is a scalar when 1, else a [chunk]
    vector); drivers must make the total step count a multiple of it.
    """

    init: Callable[[jax.Array], Any]
    step: Callable[[Any], tuple[Any, jax.Array]]
    final: Callable[[Any], jax.Array]
    chunk: int = 1
    # Host arrays the driver should pass to ``init`` as runtime arguments
    # (``init(f0, *consts)``) instead of letting ``init`` embed them as
    # HLO literals.  Only large static operands use this (the temporal
    # program's extended mask is ~1.1x the grid in f32: at 8192^2 the
    # embedded literal exceeded the remote compile service's request
    # limit — HTTP 413 — while the same array as a parameter is free).
    # ``init`` must also work WITHOUT them (embedding) so tests and
    # ad-hoc callers stay simple.
    consts: tuple = ()
    # Optional ``init0(*consts) -> carry``: build the carry for the
    # CANONICAL uniform initial state (``init_cells``) directly on-device,
    # without materializing ``f0[9, ny, nx]`` as an argument.  Two wins:
    # the driver fuses initialization into the compiled run program (one
    # fewer executable dispatch — ~15-20 ms through the tunnel), and
    # carry layouts that differ from ``f``'s (the x-tiled strip-major
    # relayout) skip the f0+carry transient that would exceed HBM at
    # giant grids (both live at 16384²: ~20 GB on a 16 GB chip).  When
    # None, drivers compose ``init(init_cells(params), *consts)``.
    init0: Callable[..., Any] | None = None
    # Optional ``final_fields(carry) -> [3, ny, nx] float16``: the compact
    # fields-readback payload (``runtime.raw_fields_fn`` contract:
    # ``[u_x, u_y, rho - density]``, u masked to 0 on obstacles) derived
    # DIRECTLY from the carry.  Only programs whose carry layout differs
    # from ``f`` set this: composing ``raw_fields_fn(final(carry))`` on
    # the x-tiled program materializes the un-tiled fp32 f (9 GiB at
    # 16384²) next to the strip-major carry (~10 GiB) and OOMs the chip,
    # while the per-strip derivation peaks at the carry plus two fp16
    # 3-plane arrays.  When None, drivers compose
    # ``raw_fields_fn(params, obstacles)(final(carry))``.
    final_fields: Callable[[Any], jax.Array] | None = None
    # Optional giant-grid checkpoint hooks (see :class:`CheckpointIO`).
    # Factories whose carry layout differs from ``f`` AND whose
    # ``final()`` cannot run on device at HBM capacity (the x-tiled
    # schedule) set this so checkpointed runs can keep the CARRY resident
    # between segments and convert to/from the portable ``f`` snapshot
    # format on the HOST.  When None, checkpoint drivers pass ``f``
    # between segments (fine wherever ``state_readback_fits``).
    checkpoint_io: "CheckpointIO | None" = None

    def single(self) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
        """Collapse to a plain ``f -> (f', av)`` one-step function (consts
        embedded — fine at the sizes this convenience path is used at)."""

        def fn(f: jax.Array) -> tuple[jax.Array, jax.Array]:
            carry, av = self.step(self.init(f))
            return self.final(carry), av

        return fn


@dataclasses.dataclass
class CheckpointIO:
    """Carry <-> host-``f`` conversion that never materializes the
    un-tiled fp32 f on DEVICE.

    ``to_f_host(carry) -> np.ndarray [9, ny, nx]``: fetch the carry's
    state leaf and un-tile on the host (a device-side ``final()`` would
    hold both layouts at once — the giant-grid OOM).  ``from_f_host(f)
    -> carry``: host-side relayout, then EAGER per-leaf device ops for
    the ghost state — eager so every carry slot owns a distinct buffer
    (the jit-CSE'd variant would re-merge the duplicate ghost buffers
    and resurrect the double-donation dispatch rejection;
    ``test_temporal_xtiled_init0_leaves_are_distinct_buffers``).
    Snapshots stay in the portable v1 ``.npz`` f-format, so a run
    checkpointed by the carry-resident driver resumes fine on any other
    kernel/mesh (and vice versa)."""

    to_f_host: Callable[[Any], np.ndarray]
    from_f_host: Callable[[np.ndarray], Any]


def choose_block_rows(ny: int, nx: int) -> int | None:
    """Largest power-of-two divisor of ny fitting the VMEM budget (>= 3
    for body-force fusion, and divisible by 8 unless it is the whole grid
    — the Pallas row-dim tiling rule).  Delegates to
    ``_largest_block_rows`` so the single-step and temporal schedulers
    share ONE definition of these constraints."""
    return _largest_block_rows(ny, nx, _block_cell_budget())


def _roll_x(plane: jax.Array, shift: int) -> jax.Array:
    """Periodic shift along lanes; shift=+1 means out[x] = in[x-1]."""
    if shift == 0:
        return plane
    return pltpu.roll(plane, shift % plane.shape[-1], 1)


def _body_force_okf(
    exts: list[jax.Array],
    fluid_row: jax.Array,
    row: int,
    aw1: float,
    aw2: float,
    gate: jax.Array,
) -> jax.Array:
    """Reference accelerate_flow condition as a 0/1 row vector: fluid AND
    all three west-side populations stay strictly positive after the kick
    (``kernels.cl:29-33``)."""
    f32 = jnp.float32
    ok = (
        fluid_row
        & (exts[3][row, :] - f32(aw1) > f32(0.0))
        & (exts[6][row, :] - f32(aw2) > f32(0.0))
        & (exts[7][row, :] - f32(aw2) > f32(0.0))
        & gate
    )
    return jnp.where(ok, f32(1.0), f32(0.0))


def _collide(
    tmp: list[jax.Array], fluid: jax.Array, omega: float, want_part: bool = True
) -> tuple[list[jax.Array], jax.Array | None]:
    """BGK collision + bounce-back on streamed planes; returns
    ``(out_planes, sum_of_|u|_over_fluid)`` (part None if not wanted).

    Opposite-speed pairs share e.m^2 terms: feq_{k,opp} = shared ± beta.
    """
    f32 = jnp.float32
    rho = functools.reduce(jnp.add, tmp)
    rho_inv = f32(1.0) / rho
    mx = tmp[1] + tmp[5] + tmp[8] - tmp[3] - tmp[6] - tmp[7]
    my = tmp[2] + tmp[5] + tmp[6] - tmp[4] - tmp[7] - tmp[8]
    msq = mx * mx + my * my
    half_icsq_rinv = f32(1.5) * rho_inv
    om = f32(omega)

    outs: list[jax.Array] = [None] * NSPEEDS

    def emit(k: int, feq: jax.Array) -> None:
        relaxed = tmp[k] + om * (feq - tmp[k])
        outs[k] = jnp.where(fluid, relaxed, tmp[int(OPPOSITE[k])])

    emit(0, f32(WEIGHTS[0]) * (rho - half_icsq_rinv * msq))
    for a, b, eu in ((1, 3, mx), (2, 4, my), (5, 7, mx + my), (6, 8, my - mx)):
        w = f32(WEIGHTS[a])
        equ = f32(3.0) * eu
        shared = w * (rho + half_icsq_rinv * (equ * eu - msq))
        beta = w * equ
        emit(a, shared + beta)
        emit(b, shared - beta)

    if not want_part:
        return outs, None
    part = jnp.sum(jnp.where(fluid, jnp.sqrt(msq) * rho_inv, f32(0.0)))
    return outs, part


def _compute(
    exts: list[jax.Array],  # 9 x [BY+2, nx] extended row windows
    mask_ref,
    out_ref,
    tot_ref,
    ghost_out,  # None | (gs_out_ref, gn_out_ref) each [1, 9, nx]
    *,
    by: int,
    omega: float,
    aw1: float,
    aw2: float,
    accelerate: jax.Array,  # bool scalar: window holds global row ny-2
):
    """Shared kernel body: body force, pull-stream, BGK+bounce-back, reduce.

    The mask may arrive as float32 (whole-grid variants) or int8 (the
    blocked variant streams the static mask from HBM every step — int8
    cuts that traffic 4x).  int8 is widened to f32 once per block before
    any comparison: Mosaic cannot relayout the (32,128)-tiled i1 vectors
    that direct sub-byte compares produce (observed "Invalid relayout ...
    vector<1024xi1>" on v5e), while the block-level i8->f32 convert is a
    standard supported relayout."""
    f32 = jnp.float32
    maskf = mask_ref[...].astype(f32)

    # --- fused accelerate_flow ---------------------------------------------
    # Window row by-1 is global row ny-2 when `accelerate` is set; its
    # obstacle mask is center row by-2.
    fluid_row = maskf[by - 2, :] > f32(0.5)
    okf = _body_force_okf(exts, fluid_row, by - 1, aw1, aw2, accelerate)
    for k in KICK_SIGNS:
        s = kick_scale(k, aw1, aw2)
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

    fluid = maskf > f32(0.5)
    outs, part = _collide(tmp, fluid, omega)

    for k in range(NSPEEDS):
        out_ref[k, :, :] = outs[k]
        if ghost_out is not None:
            gs_out, gn_out = ghost_out
            # This block's first post-collision row is the NORTH ghost of
            # the block below; its last row is the SOUTH ghost of the block
            # above (index maps route them to the right slots).
            gn_out[0, k, :] = outs[k][0, :]
            gs_out[0, k, :] = outs[k][by - 1, :]

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
    _compute(
        exts, mask_ref, out_ref, tot_ref, None, accelerate=jnp.bool_(True), **kw
    )


def _step_kernel_blocked(
    c_ref, gs_ref, gn_ref, mask_ref, out_ref, gs_out, gn_out, tot_ref, **kw
):
    """Row-blocked variant: halo rows from the carried ghost state."""
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    exts = [
        jnp.concatenate(
            [gs_ref[0, k : k + 1, :], c_ref[k, :, :], gn_ref[0, k : k + 1, :]],
            axis=0,
        )
        for k in range(NSPEEDS)
    ]
    _compute(
        exts,
        mask_ref,
        out_ref,
        tot_ref,
        (gs_out, gn_out),
        accelerate=(i == last),
        **kw,
    )


def _step_kernel_blocked_gated(
    c_ref, gs_ref, gn_ref, mask_ref, gate_ref, out_ref, gs_out, gn_out,
    tot_ref, **kw
):
    """Blocked variant with a runtime body-force gate (SPMD sharded use:
    only the device owning global row ny-2 kicks, but all devices run the
    same program)."""
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    exts = [
        jnp.concatenate(
            [gs_ref[0, k : k + 1, :], c_ref[k, :, :], gn_ref[0, k : k + 1, :]],
            axis=0,
        )
        for k in range(NSPEEDS)
    ]
    _compute(
        exts,
        mask_ref,
        out_ref,
        tot_ref,
        (gs_out, gn_out),
        accelerate=(i == last) & (gate_ref[0, 0] > 0),
        **kw,
    )


def build_blocked_kernel(
    ny: int,
    nx: int,
    by: int,
    omega: float,
    aw1: float,
    aw2: float,
    *,
    dynamic_accel_gate: bool = False,
    interpret: bool = False,
):
    """The raw blocked pallas_call:
    ``call(f, gs, gn, mask[, gate]) -> (f', gs', gn', tot)`` with ghost
    arrays shaped [P, 9, nx] (see module docstring for slot routing)."""
    grid = ny // by
    kw = dict(by=by, omega=omega, aw1=aw1, aw2=aw2)
    center_spec = pl.BlockSpec(
        (NSPEEDS, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tot_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ghost_in_spec = pl.BlockSpec(
        (1, NSPEEDS, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    gn_out_spec = pl.BlockSpec(
        (1, NSPEEDS, nx),
        lambda i: ((i - 1) % grid, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gs_out_spec = pl.BlockSpec(
        (1, NSPEEDS, nx),
        lambda i: ((i + 1) % grid, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [center_spec, ghost_in_spec, ghost_in_spec, mask_spec]
    kernel = _step_kernel_blocked
    if dynamic_accel_gate:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        kernel = _step_kernel_blocked_gated
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[center_spec, gs_out_spec, gn_out_spec, tot_spec],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((grid, NSPEEDS, nx), jnp.float32),
            jax.ShapeDtypeStruct((grid, NSPEEDS, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(ny * nx * 110),
            bytes_accessed=int((2 * NSPEEDS + 1) * ny * nx * 4),
            transcendentals=int(ny * nx),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )


def build_fused_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    by: int,
    *,
    interpret: bool = False,
) -> StepProgram:
    """Compile-time specialization of the kernel for one grid/physics config
    (the analog of the reference's ``-D``-baked OpenCL rebuild)."""
    ny, nx = params.ny, params.nx
    grid = ny // by
    aw1, aw2 = accel_weights(params)
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.float32)
    fcinv = np.float32(free_cells_inv)
    kw = dict(
        by=by,
        omega=float(np.float32(params.omega)),
        aw1=float(aw1),
        aw2=float(aw2),
    )

    center_spec = pl.BlockSpec(
        (NSPEEDS, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tot_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    f_shape = jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32)
    tot_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    cost = pl.CostEstimate(
        flops=int(ny * nx * 110),
        bytes_accessed=int((2 * NSPEEDS + 1) * ny * nx * 4),
        transcendentals=int(ny * nx),
    )

    if grid == 1:
        call = pl.pallas_call(
            functools.partial(_step_kernel_single, **kw),
            grid=(1,),
            in_specs=[center_spec, mask_spec],
            out_specs=[center_spec, tot_spec],
            out_shape=[f_shape, tot_shape],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit_bytes()
            ),
            input_output_aliases={0: 0},
            interpret=interpret,
        )

        def step1(f):
            f_new, tot = call(f, jnp.asarray(fluid_host))
            return f_new, tot[0, 0] * fcinv

        return StepProgram(init=lambda f: f, step=step1, final=lambda f: f)

    # Ghost state: gs[i] = global row (i*BY-1) % ny, gn[i] = ((i+1)*BY) % ny,
    # each stored speeds-minor as [P, 9, nx] (valid block (1, 9, nx)).
    south_rows = np.array([(i * by - 1) % ny for i in range(grid)], np.int32)
    north_rows = np.array([((i + 1) * by) % ny for i in range(grid)], np.int32)
    call = build_blocked_kernel(
        ny, nx, by, kw["omega"], kw["aw1"], kw["aw2"], interpret=interpret
    )
    # The blocked kernel re-streams the static mask from HBM every step;
    # int8 cuts that 1/19 of the traffic to 1/4 of a plane.  Like the
    # temporal program's maskext, it rides the carry as a runtime
    # argument when the driver supplies it via consts — an embedded
    # giant-grid literal blows the remote compile service's request
    # limit (StepProgram.consts; HTTP 413 at 8192^2).
    fluid_i8 = fluid_host.astype(np.int8)

    def init(f, fluid=None):
        if fluid is None:
            fluid = jnp.asarray(fluid_i8)
        gs = jnp.transpose(f[:, south_rows, :], (1, 0, 2))
        gn = jnp.transpose(f[:, north_rows, :], (1, 0, 2))
        return (f, gs, gn, fluid)

    def step(carry):
        f, gs, gn, fluid = carry
        f_new, gs_new, gn_new, tot = call(f, gs, gn, fluid)
        return (f_new, gs_new, gn_new, fluid), tot[0, 0] * fcinv

    return StepProgram(
        init=init, step=step, final=lambda c: c[0], consts=(fluid_i8,)
    )


def _step_kernel_multi(
    c_ref, mask_ref, out_ref, avs_ref, *, ny, nx, steps, omega, aw1, aw2
):
    """Whole-grid-in-VMEM, ``steps`` timesteps per kernel launch.

    For grids whose 9 planes fit in VMEM the per-step cost is dominated by
    pipeline/launch overhead (the physics is ~2 us at 128^2); running the
    time loop *inside* the kernel with the state held in registers/VMEM
    amortizes it.  This is the TPU analog of the reference's REDUCE_FREQ
    batching idea (``d2q9-bgk.c:230-233``) taken to its limit: per-step
    mean speeds are spilled to an SMEM vector, f touches HBM once per
    ``steps`` timesteps.
    """
    f32 = jnp.float32
    fluid = mask_ref[...] > f32(0.5)
    fluid_row = mask_ref[ny - 2, :] > f32(0.5)

    def body(t, planes):
        okf = _body_force_okf(
            planes, fluid_row, ny - 2, aw1, aw2, jnp.bool_(True)
        )
        for k in KICK_SIGNS:
            s = kick_scale(k, aw1, aw2)
            kicked = planes[k][ny - 2 : ny - 1, :] + (okf * f32(s))[None, :]
            planes[k] = jnp.concatenate(
                [planes[k][: ny - 2, :], kicked, planes[k][ny - 1 :, :]], axis=0
            )
        tmp = []
        for k in range(NSPEEDS):
            cy, cx = int(CY[k]), int(CX[k])
            p = planes[k]
            if cy:
                p = pltpu.roll(p, cy % ny, 0)
            if cx:
                p = pltpu.roll(p, cx % nx, 1)
            tmp.append(p)
        outs, part = _collide(tmp, fluid, omega)
        avs_ref[t, 0] = part
        return outs

    # Partially unrolled time loop: Mosaic pipelines across unrolled steps
    # (full unroll of hundreds of steps would blow up compile time).  The
    # fori carry must be one array, but within the unrolled body the 9
    # planes travel as a list — re-stacking between steps materialized
    # extra whole-grid copies.
    unroll = 8
    while steps % unroll:
        unroll //= 2

    def outer(t8, f):
        planes = [f[k] for k in range(NSPEEDS)]
        for j in range(unroll):
            planes = body(t8 * unroll + j, planes)
        return jnp.stack(planes)

    out_ref[...] = jax.lax.fori_loop(0, steps // unroll, outer, c_ref[...])


def build_multi_step_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    steps: int,
    *,
    interpret: bool = False,
) -> StepProgram:
    """Whole-grid multi-step program (``chunk == steps``)."""
    ny, nx = params.ny, params.nx
    if ny < 3:
        # The in-kernel body-force concat slices rows [0, ny-2) — at
        # ny < 3 that is a zero-row vector, which Mosaic rejects with a
        # cryptic lowering error (the factory guard never forwards
        # such grids; this covers direct builder calls).
        raise ValueError(f"multi-step kernel needs ny >= 3, got ny={ny}")
    aw1, aw2 = accel_weights(params)
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.float32)
    fcinv = np.float32(free_cells_inv)
    call = pl.pallas_call(
        functools.partial(
            _step_kernel_multi,
            ny=ny,
            nx=nx,
            steps=steps,
            omega=float(np.float32(params.omega)),
            aw1=float(aw1),
            aw2=float(aw2),
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (NSPEEDS, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((ny, nx), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (NSPEEDS, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((steps, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((steps, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(ny * nx * 110 * steps),
            bytes_accessed=int(2 * NSPEEDS * ny * nx * 4),
            transcendentals=int(ny * nx * steps),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    # The mask rides the carry as a runtime argument when the driver
    # supplies it (StepProgram.consts) — same rule as every sibling
    # schedule: an embedded giant-grid mask literal blows the remote
    # compile service's request limit.  The multi-step cell budget keeps
    # grids small today, but the invariant is categorical (CLAUDE.md).
    def init(f, fluid=None):
        if fluid is None:
            fluid = jnp.asarray(fluid_host)
        return (f, fluid)

    def step(carry):
        f, fluid = carry
        f_new, avs = call(f, fluid)
        return (f_new, fluid), avs[:, 0] * fcinv

    return StepProgram(
        init=init,
        step=step,
        final=lambda c: c[0],
        chunk=steps,
        consts=(fluid_host,),
    )


def _window_advance(
    planes: list[jax.Array],  # 9 x [BY+2K, nx] window at time t
    fluid: jax.Array,  # [BY+2K, nx] bool window fluid mask
    gate_interior: jax.Array,  # bool: apply interior kick (row BY+K-2)
    gate_wrap: jax.Array,  # bool: apply south-wrap kick (row K-2)
    *,
    by: int,
    ksteps: int,
    nx: int,
    omega: float,
    aw1: float,
    aw2: float,
    want_av: bool = True,
    av_lanes: int | None = None,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Advance one trapezoidal window ``ksteps`` timesteps.

    Shared body of the temporal pallas kernel and the megakernel.  Returns
    ``(final_planes, parts)`` where ``parts[s]`` is the center-rows
    |u|-sum after internal step ``s`` (empty when ``want_av=False`` — used
    by the ablation tool to isolate the reduction cost).  ``av_lanes``
    restricts the reduction to the first ``av_lanes`` lanes: on an
    x-padded 2-D-sharded tile the ghost lanes carry the *neighbor's*
    fluid mask (they must collide like fluid during internal steps), so
    without the bound their |u| would be double-counted across shards.
    The loop is fully unrolled (K is
    small and static): Mosaic pipelines across the unrolled steps —
    measured 73.9 -> 56.7 us/step at 1024^2 versus a fori_loop.  The 9
    planes travel as a LIST (stacking between steps materialized two
    extra full-window copies per step).
    """
    f32 = jnp.float32
    byext = by + 2 * ksteps

    def kick_row(planes, row: int, gate):
        okf = _body_force_okf(planes, fluid[row, :], row, aw1, aw2, gate)
        out = []
        for k in range(NSPEEDS):
            sv = kick_scale(k, aw1, aw2)
            if sv is None:
                out.append(planes[k])
                continue
            kicked = planes[k][row : row + 1, :] + (okf * f32(sv))[None, :]
            # Build the concat without empty slices: Mosaic rejects
            # zero-row vectors ("vector types must have positive constant
            # sizes"), and row == 0 happens for real — the wrap-kick site
            # K-2 is the window's first row when K = 2.
            parts = []
            if row > 0:
                parts.append(planes[k][:row, :])
            parts.append(kicked)
            if row + 1 < byext:
                parts.append(planes[k][row + 1 :, :])
            out.append(jnp.concatenate(parts, axis=0))
        return out

    parts = []
    for _s in range(ksteps):
        planes = kick_row(planes, by + ksteps - 2, gate_interior)
        planes = kick_row(planes, ksteps - 2, gate_wrap)
        tmp = []
        for k in range(NSPEEDS):
            cy, cx = int(CY[k]), int(CX[k])
            p = planes[k]
            if cy:
                # Edge rows wrap garbage into garbage: they leave the
                # valid region this step anyway.
                p = pltpu.roll(p, cy % byext, 0)
            if cx:
                p = pltpu.roll(p, cx % nx, 1)
            tmp.append(p)
        outs, _ = _collide(tmp, fluid, omega, want_part=False)

        if want_av:
            # av over OWNED rows (the center) and OWNED lanes only,
            # valid at every step.
            xl = slice(None) if av_lanes is None else slice(0, av_lanes)
            ctr = [t[ksteps : ksteps + by, xl] for t in tmp]
            rho = functools.reduce(jnp.add, ctr)
            mxc = ctr[1] + ctr[5] + ctr[8] - ctr[3] - ctr[6] - ctr[7]
            myc = ctr[2] + ctr[5] + ctr[6] - ctr[4] - ctr[7] - ctr[8]
            parts.append(
                jnp.sum(
                    jnp.where(
                        fluid[ksteps : ksteps + by, xl],
                        jnp.sqrt(mxc * mxc + myc * myc) / rho,
                        f32(0.0),
                    )
                )
            )
        planes = outs
    return planes, parts


def _step_kernel_temporal(
    c_ref,  # [9, BY, nx]       center rows at time t
    gs_ref,  # [1, K, 9, nx]    rows [R0-K, R0) at time t
    gn_ref,  # [1, K, 9, nx]    rows [R0+BY, R0+BY+K) at time t
    maskext_ref,  # [1, BY+2K, nx]  fluid mask of the whole window
    gate_ref,  # [1, 2] SMEM int32: body-force gates for the interior site
    #            (last program, this device owns row ny-2) and the
    #            south-wrap site (program 0; 1 on single chip / device 0)
    out_ref,  # [9, BY, nx]     center rows at time t+K
    gs_out,  # [1, K, 9, nx]    ghosts for program (i+1)%P
    gn_out,  # [1, K, 9, nx]    ghosts for program (i-1)%P
    avs_ref,  # [K, 1] SMEM     per-internal-step av partial sums
    *,
    by: int,
    ksteps: int,
    ny: int,
    nx: int,
    omega: float,
    aw1: float,
    aw2: float,
    av_lanes: int | None = None,
    storage=jnp.float32,
):
    """Trapezoidal temporal blocking: advance the window ``ksteps`` times.

    The window [R0-K, R0+BY+K) shrinks by one valid row per side per
    internal step; after K steps exactly the center [R0, R0+BY) is valid.
    HBM traffic per timestep drops by ~K/(1 + K/BY) versus the single-step
    kernel (the reference's REDUCE_FREQ amortization idea applied to the
    whole stencil, not just the reduction).

    Body-force rows: global row ny-2 appears at ext index BY+K-2 in the
    last program's window AND (K >= 2) at ext index K-2 in program 0's
    south halo; both applications are gated on the program id.  Kicking a
    row that has already left the valid region is a no-op (never read).
    Each program accumulates the av contribution of its own center rows at
    every internal step, summed across programs in SMEM.

    ``storage``: HBM dtype of the carried f/ghost state (fp32 production
    default).  16-bit storage halves a pass's dominant HBM traffic and
    the state footprint; all in-kernel arithmetic stays fp32 (widen on
    load, round once per K-step pass on store) — the fp16-residency
    experiment, docs/PERF.md round 4.
    """
    f32 = jnp.float32
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    # Mask arrives as int8 (4x less HBM traffic than f32 — the mask is
    # ~6% of a pass's bytes at production configs) or f32 (older callers);
    # widen BEFORE comparing — Mosaic can't relayout sub-byte compare
    # results (same trap as the blocked kernel).
    fluid = maskext_ref[0, :, :].astype(f32) > f32(0.5)

    planes = [
        jnp.concatenate(
            [gs_ref[0, :, k, :], c_ref[k, :, :], gn_ref[0, :, k, :]], axis=0
        ).astype(f32)
        for k in range(NSPEEDS)
    ]
    final, parts = _window_advance(
        planes,
        fluid,
        (i == last) & (gate_ref[0, 0] > 0),
        (i == 0) & (gate_ref[0, 1] > 0),
        by=by,
        ksteps=ksteps,
        nx=nx,
        omega=omega,
        aw1=aw1,
        aw2=aw2,
        av_lanes=av_lanes,
    )
    for s, part in enumerate(parts):

        @pl.when(i == 0)
        def _(s=s, part=part):
            avs_ref[s, 0] = part

        @pl.when(i > 0)
        def _(s=s, part=part):
            avs_ref[s, 0] += part

    for k in range(NSPEEDS):
        fin = final[k].astype(storage)
        out_ref[k, :, :] = fin[ksteps : ksteps + by, :]
        gn_out[0, :, k, :] = fin[ksteps : 2 * ksteps, :]
        gs_out[0, :, k, :] = fin[by : by + ksteps, :]


def build_temporal_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    by: int,
    ksteps: int,
    *,
    interpret: bool = False,
    storage=jnp.float32,
) -> StepProgram:
    """Temporal-blocked program (``chunk == ksteps``) for row-blocked
    grids.  ``storage``: HBM dtype of the carried f/ghost state (16-bit
    halves state bytes and pass traffic; fp32 in-kernel compute either
    way — the fp16-residency experiment, docs/PERF.md round 4; fp32 is
    the production default)."""
    ny, nx = params.ny, params.nx
    storage = jnp.dtype(storage)
    if ny % by != 0:
        raise ValueError(f"BY={by} does not divide ny={ny}")
    grid = ny // by
    if grid < 2:
        raise ValueError("temporal blocking needs >= 2 row blocks")
    if not interpret and by % 8 != 0:
        # Mosaic requires block row dims divisible by 8 (sub-8 blocks fail
        # at lowering with a cryptic tiling error); interpret mode has no
        # such constraint, so tests may use smaller blocks there.
        raise ValueError(
            f"BY={by}: Pallas row blocks must be divisible by 8 to lower "
            "on TPU (use interpret=True for sub-8 test blocks)"
        )
    # K <= BY-2 keeps the body-force row ny-2 out of every window except
    # the last program's interior and program 0's south halo (the two
    # gated kick sites); a larger K would let it enter program last-1's
    # north halo un-kicked and contaminate that block's output.
    if not 2 <= ksteps <= by - 2:
        raise ValueError(f"need 2 <= K <= BY-2, got K={ksteps}, BY={by}")
    aw1, aw2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    # int8 mask: the kernel widens before comparing; 4x less HBM traffic
    # for the ~1.1x-grid-sized static operand streamed every pass.
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)
    # Per-program extended fluid mask (static): rows [R0-K, R0+BY+K) mod ny.
    maskext_host = np.stack(
        [
            fluid_host[
                np.arange(i * by - ksteps, i * by + by + ksteps) % ny, :
            ]
            for i in range(grid)
        ]
    )
    south_rows = [np.arange(i * by - ksteps, i * by) % ny for i in range(grid)]
    north_rows = [
        np.arange(i * by + by, i * by + by + ksteps) % ny for i in range(grid)
    ]
    call = build_temporal_kernel(
        ny,
        nx,
        by,
        ksteps,
        float(np.float32(params.omega)),
        float(aw1),
        float(aw2),
        interpret=interpret,
        storage=storage,
    )
    gates = np.ones((1, 2), dtype=np.int32)  # single chip: both kick sites

    def init(f, maskext=None):
        # maskext rides the carry as a runtime argument when the driver
        # supplies it (see StepProgram.consts); embedded otherwise.
        if maskext is None:
            maskext = jnp.asarray(maskext_host)
        f = f.astype(storage)  # no-op for the fp32 production default
        gs = jnp.stack(
            [jnp.transpose(f[:, rows, :], (1, 0, 2)) for rows in south_rows]
        )
        gn = jnp.stack(
            [jnp.transpose(f[:, rows, :], (1, 0, 2)) for rows in north_rows]
        )
        return (f, gs, gn, maskext)

    def step(carry):
        f, gs, gn, maskext = carry
        f_new, gs_new, gn_new, avs = call(
            f, gs, gn, maskext, jnp.asarray(gates)
        )
        return (f_new, gs_new, gn_new, maskext), avs[:, 0] * fcinv

    return StepProgram(
        init=init,
        step=step,
        final=lambda c: c[0].astype(jnp.float32),
        chunk=ksteps,
        consts=(maskext_host,),
    )


def build_temporal_kernel(
    ny: int,
    nx: int,
    by: int,
    ksteps: int,
    omega: float,
    aw1: float,
    aw2: float,
    *,
    interpret: bool = False,
    av_lanes: int | None = None,
    storage=jnp.float32,
):
    """Raw temporal pallas_call:
    ``call(f, gs, gn, maskext, gates) -> (f', gs', gn', avs)`` with ghost
    slabs [P, K, 9, nx], per-program extended masks [P, BY+2K, nx] and
    int32 gates [1, 2] = (interior kick site on, south-wrap kick site on).
    ``ny``/``nx`` are the *local* slab dims when used per-shard;
    ``av_lanes`` bounds the reduction to the owned lanes of an x-padded
    tile (2-D sharding — see ``_window_advance``); ``storage`` is the HBM
    dtype of f and the ghost slabs (see ``_step_kernel_temporal``)."""
    grid = ny // by
    storage = jnp.dtype(storage)
    center_spec = pl.BlockSpec(
        (NSPEEDS, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ghost_in_spec = pl.BlockSpec(
        (1, ksteps, NSPEEDS, nx), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    gn_out_spec = pl.BlockSpec(
        (1, ksteps, NSPEEDS, nx),
        lambda i: ((i - 1) % grid, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gs_out_spec = pl.BlockSpec(
        (1, ksteps, NSPEEDS, nx),
        lambda i: ((i + 1) % grid, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    maskext_spec = pl.BlockSpec(
        (1, by + 2 * ksteps, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    gate_spec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ghost_shape = jax.ShapeDtypeStruct((grid, ksteps, NSPEEDS, nx), storage)

    return pl.pallas_call(
        functools.partial(
            _step_kernel_temporal,
            by=by,
            ksteps=ksteps,
            ny=ny,
            nx=nx,
            omega=omega,
            aw1=aw1,
            aw2=aw2,
            av_lanes=av_lanes,
            storage=storage,
        ),
        grid=(grid,),
        in_specs=[
            center_spec,
            ghost_in_spec,
            ghost_in_spec,
            maskext_spec,
            gate_spec,
        ],
        out_specs=[center_spec, gs_out_spec, gn_out_spec,
                   pl.BlockSpec((ksteps, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), storage),
            ghost_shape,
            ghost_shape,
            jax.ShapeDtypeStruct((ksteps, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(ny * nx * 110 * ksteps),
            bytes_accessed=int(
                (2 * NSPEEDS * storage.itemsize + 1) * ny * nx
            ),
            transcendentals=int(ny * nx * ksteps),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )


def _step_kernel_temporal_xt(
    c_ref,  # [1, 9, BY, W]        center rows of one (strip, block)
    gs_ref,  # [1, 1, K, 9, W]     rows [R0-K, R0) at time t
    gn_ref,  # [1, 1, K, 9, W]     rows [R0+BY, R0+BY+K)
    xe_ref,  # [1, 9, BY, 128]     WEST neighbor's last 128 owned lanes
    xw_ref,  # [1, 9, BY, 128]     EAST neighbor's first 128 owned lanes
    gse_ref,  # [1, 1, K, 9, 128]  east neighbor's gs slab, first lane-block
    gsw_ref,  # [1, 1, K, 9, 128]  west neighbor's gs slab, last owned block
    gne_ref,  # [1, 1, K, 9, 128]  east neighbor's gn slab, first lane-block
    gnw_ref,  # [1, 1, K, 9, 128]  west neighbor's gn slab, last owned block
    maskext_ref,  # [1, BY+2K, W]  window fluid mask (halo lanes carry the
    #                               x-neighbor's mask, dead pad is 0)
    gate_ref,  # [1, 2] SMEM int32: body-force gates, as in the 1-D
    #            temporal kernel (single chip passes ones; the y-sharded
    #            factory gates on the shard owning global row ny-2 /
    #            shard 0's wrapped south halo)
    out_ref,  # [1, 9, BY, W]
    gs_out,  # [1, 1, K, 9, W]     ghosts for block (i+1) % P of this strip
    gn_out,  # [1, 1, K, 9, W]     ghosts for block (i-1) % P
    xe_out,  # [1, 9, BY, 128]     this block's last 128 owned lanes ->
    #                               XE slot of the EAST neighbor strip
    xw_out,  # [1, 9, BY, 128]     first 128 owned lanes -> west neighbor
    avs_ref,  # [K, 1] SMEM        per-internal-step av partials
    *,
    by: int,
    ksteps: int,
    bx: int,
    w: int,
    edge: int,
    omega: float,
    aw1: float,
    aw2: float,
    av_lanes: int,
):
    """Temporal window advance on the 2-D (strip, row-block) grid of the
    single-chip x-tiled schedule (:func:`build_temporal_xtiled_program`).

    Identical algebra to :func:`_step_kernel_temporal` — the second grid
    dimension only changes which ids gate the body-force sites (row-block
    id) and which program owns the first av write (strip 0, block 0).
    Both kick sites fire in every strip when gated on: each strip owns its
    lanes of global row ny-2, and the halo lanes kick under the NEIGHBOR's
    mask, tracking the owner's evolution exactly (as in the sharded 2-D
    path).  ``gate_ref`` additionally gates the two sites per DEVICE when
    the kernel runs per-shard (``make_sharded_temporal_xt_run``): only the
    shard owning global row ny-2 kicks the interior site, only shard 0 the
    wrapped south-halo site; the single-chip program passes ones.

    x halos are KERNEL-ROUNDTRIP state, exactly like the y ghosts: the
    halo lane bands of the assembled window are overwritten from the
    carried edge-strip inputs (xe/xw for the BY center rows; the
    neighbors' y-ghost slabs' edge lane-blocks for the ±K row
    extensions), and each block emits its own 128-lane edge columns
    routed to the neighbor strips' xe/xw slots for the next pass.  The
    first x-tiled design refreshed the bands with a jnp patch between
    passes — XLA could not update the Pallas-aliased carry in place, so
    every pass copied the full strip-major f (measured: +1.56 GB temp at
    8192², ~640 MB/step of copy traffic, 13.9 -> 11.2 GLUPS regression
    vs row blocking; docs/PERF.md round-3).
    """
    f32 = jnp.float32
    i = pl.program_id(1)  # row block within the strip
    last = pl.num_programs(1) - 1
    first_program = (pl.program_id(0) == 0) & (i == 0)
    # int8 mask widened before comparing (Mosaic sub-byte relayout trap).
    fluid = maskext_ref[0, :, :].astype(f32) > f32(0.5)

    planes = []
    byext = by + 2 * ksteps
    for k in range(NSPEEDS):
        # Assemble the window by lane-concatenation in the carried layout
        # [owned BX | east K | dead | west K]: the halo bands are rebuilt
        # at the current time — east [bx, bx+K) from the east neighbor's
        # west edge, west [w-K, w) from the west neighbor's east edge.
        # The stale bands carried in c/gs/gn (invalidated by last pass's
        # trapezoidal shrink) are never read.  (Mosaic has no in-kernel
        # dynamic_update_slice; concatenation lowers.)
        core = jnp.concatenate(
            [
                gs_ref[0, 0, :, k, :bx],
                c_ref[0, k, :, :bx],
                gn_ref[0, 0, :, k, :bx],
            ],
            axis=0,
        )
        east = jnp.concatenate(
            [
                gse_ref[0, 0, :, k, :ksteps],
                xw_ref[0, k, :, :ksteps],
                gne_ref[0, 0, :, k, :ksteps],
            ],
            axis=0,
        )
        west = jnp.concatenate(
            [
                gsw_ref[0, 0, :, k, edge - ksteps :],
                xe_ref[0, k, :, edge - ksteps :],
                gnw_ref[0, 0, :, k, edge - ksteps :],
            ],
            axis=0,
        )
        pieces = [core, east]
        if w - bx - 2 * ksteps > 0:
            pieces.append(
                jnp.zeros((byext, w - bx - 2 * ksteps), jnp.float32)
            )
        pieces.append(west)
        planes.append(jnp.concatenate(pieces, axis=1))
    final, parts = _window_advance(
        planes,
        fluid,
        (i == last) & (gate_ref[0, 0] > 0),
        (i == 0) & (gate_ref[0, 1] > 0),
        by=by,
        ksteps=ksteps,
        nx=w,
        omega=omega,
        aw1=aw1,
        aw2=aw2,
        av_lanes=av_lanes,
    )
    for s, part in enumerate(parts):

        @pl.when(first_program)
        def _(s=s, part=part):
            avs_ref[s, 0] = part

        @pl.when(~first_program)
        def _(s=s, part=part):
            avs_ref[s, 0] += part

    for k in range(NSPEEDS):
        out_ref[0, k, :, :] = final[k][ksteps : ksteps + by, :]
        gn_out[0, 0, :, k, :] = final[k][ksteps : 2 * ksteps, :]
        gs_out[0, 0, :, k, :] = final[k][by : by + ksteps, :]
        xe_out[0, k, :, :] = final[k][ksteps : ksteps + by, bx - edge : bx]
        xw_out[0, k, :, :] = final[k][ksteps : ksteps + by, :edge]


# Lane padding of each x strip; keeps W lane-aligned while hosting the two
# K-wide halo bands (same scheme as the sharded 2-D tiles).
_XT_PAD = 128


def build_temporal_xtiled_kernel(
    ny: int,
    nx: int,
    by: int,
    ksteps: int,
    px: int,
    omega: float,
    aw1: float,
    aw2: float,
    *,
    interpret: bool = False,
):
    """Raw x-tiled temporal pallas_call:
    ``call(fs, gs, gn, xe, xw, gse, gsw, gne, gnw, maskext, gates) ->
    (fs', gs', gn', xe', xw', avs)`` on strip-major state
    ``fs [Px, 9, ny, W]`` (W = nx/Px + 128), ghost slabs
    ``[Px, P, K, 9, W]``, edge columns ``[Px, 9, ny, edge]``, per-window
    masks ``[Px*P, BY+2K, W]`` and int32 gates ``[1, 2]`` — the x-tiled
    analog of :func:`build_temporal_kernel`, factored out so the sharded
    factory (``parallel/sharded.py::make_sharded_temporal_xt_run``) can
    run it per-shard with device-gated body-force sites.  ``ny``/``nx``
    are the LOCAL slab dims in that use; the x wrap is the local strip
    ring either way (x is never device-sharded on this path).  The
    gse/gsw/gne/gnw operands alias the gs/gn arrays (callers pass gs/gn
    twice) — the BlockSpecs select the neighbor strips' edge lane-blocks.

    Validates every kernel-level constraint with a clear ValueError (the
    TPU-lowering forms; ``interpret=True`` relaxes the hardware tiling
    minima for test miniatures).
    """
    if nx % px != 0:
        raise ValueError(f"px={px} does not divide nx={nx}")
    bx = nx // px
    if px < 2:
        raise ValueError("x-tiling needs px >= 2 (use the 1-D temporal "
                         "program for a single strip)")
    w = bx + _XT_PAD
    if not interpret and (bx % 128 != 0):
        raise ValueError(
            f"BX={bx}: x strips must be lane-aligned (multiple of 128) "
            "to lower on TPU"
        )
    if ny % by != 0:
        raise ValueError(f"BY={by} does not divide ny={ny}")
    p_loc = ny // by
    if p_loc < 2:
        raise ValueError("temporal blocking needs >= 2 row blocks")
    if not interpret and by % 8 != 0:
        raise ValueError(
            f"BY={by}: Pallas row blocks must be divisible by 8 to lower "
            "on TPU (use interpret=True for sub-8 test blocks)"
        )
    if not 2 <= ksteps <= by - 2:
        raise ValueError(f"need 2 <= K <= BY-2, got K={ksteps}, BY={by}")
    if 2 * ksteps > _XT_PAD or ksteps > bx:
        raise ValueError(
            f"K={ksteps} x halos don't fit (need 2K <= {_XT_PAD} and "
            f"K <= BX={bx})"
        )
    byext = by + 2 * ksteps
    # Edge-column block width: 128 lanes on hardware (the Mosaic lane-dim
    # tiling minimum — K alone would be below it); interpret-mode test
    # miniatures with BX < 128 use the whole strip.
    edge = _XT_PAD if bx >= _XT_PAD else bx
    if bx % edge != 0:
        raise ValueError(
            f"BX={bx} must be a multiple of the edge block width {edge}"
        )

    center_spec = pl.BlockSpec(
        (1, NSPEEDS, by, w), lambda s, i: (s, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    ghost_in_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, w), lambda s, i: (s, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gn_out_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, w),
        lambda s, i: (s, (i - 1) % p_loc, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gs_out_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, w),
        lambda s, i: (s, (i + 1) % p_loc, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    maskext_spec = pl.BlockSpec(
        (1, byext, w), lambda s, i: (s * p_loc + i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gate_spec = pl.BlockSpec(
        (1, 2), lambda s, i: (0, 0), memory_space=pltpu.SMEM
    )
    # Carried x-edge arrays: XE[s] = WEST neighbor's last `edge` owned
    # lanes, XW[s] = EAST neighbor's first `edge` lanes (all ny rows).
    xedge_in_spec = pl.BlockSpec(
        (1, NSPEEDS, by, edge), lambda s, i: (s, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    xe_out_spec = pl.BlockSpec(
        (1, NSPEEDS, by, edge),
        lambda s, i: ((s + 1) % px, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    xw_out_spec = pl.BlockSpec(
        (1, NSPEEDS, by, edge),
        lambda s, i: ((s - 1) % px, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    # Neighbor ghost-slab edge lane-blocks for the ±K corner rows of the
    # halo bands (gs/gn are non-aliased carries, so cross-strip reads are
    # race-free under the in-place f update).
    last_lane_block = bx // edge - 1
    gse_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, edge),
        lambda s, i: ((s + 1) % px, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gsw_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, edge),
        lambda s, i: ((s - 1) % px, i, 0, 0, last_lane_block),
        memory_space=pltpu.VMEM,
    )
    gne_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, edge),
        lambda s, i: ((s + 1) % px, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gnw_spec = pl.BlockSpec(
        (1, 1, ksteps, NSPEEDS, edge),
        lambda s, i: ((s - 1) % px, i, 0, 0, last_lane_block),
        memory_space=pltpu.VMEM,
    )
    fs_shape = jax.ShapeDtypeStruct((px, NSPEEDS, ny, w), jnp.float32)
    ghost_shape = jax.ShapeDtypeStruct(
        (px, p_loc, ksteps, NSPEEDS, w), jnp.float32
    )
    xedge_shape = jax.ShapeDtypeStruct((px, NSPEEDS, ny, edge), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _step_kernel_temporal_xt,
            by=by,
            ksteps=ksteps,
            bx=bx,
            w=w,
            edge=edge,
            omega=omega,
            aw1=aw1,
            aw2=aw2,
            av_lanes=bx,
        ),
        grid=(px, p_loc),
        in_specs=[
            center_spec,
            ghost_in_spec,
            ghost_in_spec,
            xedge_in_spec,
            xedge_in_spec,
            gse_spec,
            gsw_spec,
            gne_spec,
            gnw_spec,
            maskext_spec,
            gate_spec,
        ],
        out_specs=[
            center_spec,
            gs_out_spec,
            gn_out_spec,
            xe_out_spec,
            xw_out_spec,
            pl.BlockSpec(
                (ksteps, 1), lambda s, i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            fs_shape,
            ghost_shape,
            ghost_shape,
            xedge_shape,
            xedge_shape,
            jax.ShapeDtypeStruct((ksteps, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(px * ny * w * 110 * ksteps),
            bytes_accessed=int((2 * NSPEEDS + 1) * px * ny * w * 4),
            transcendentals=int(px * ny * w * ksteps),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )


def fill_xt_mask_window(
    m: np.ndarray,  # [byext, W] output window (zero-initialized)
    fluid_rows: np.ndarray,  # [byext, nx] fluid mask of the window's rows
    sx: int,
    bx: int,
    nx: int,
    w: int,
    ksteps: int,
) -> None:
    """Fill one x-padded extended-mask window: owned lanes [0, BX), the
    east neighbor's first K columns at [BX, BX+K), the west neighbor's
    last K at [W-K, W), dead pad untouched (zero).

    ONE definition of the halo-band lane layout, shared by the
    single-chip x-tiled factory and the sharded 2-D temporal factory
    (``parallel/sharded.py::make_sharded_temporal_2d_run``) — the band
    placement is load-bearing for both kernels' physics, so divergence
    here would silently break one of them."""
    east = (np.arange(ksteps) + (sx + 1) * bx) % nx
    west = (np.arange(ksteps) + sx * bx - ksteps) % nx
    m[:, :bx] = fluid_rows[:, sx * bx : (sx + 1) * bx]
    m[:, bx : bx + ksteps] = fluid_rows[:, east]
    m[:, w - ksteps :] = fluid_rows[:, west]


def build_temporal_xtiled_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    by: int,
    ksteps: int,
    px: int,
    *,
    interpret: bool = False,
) -> StepProgram:
    """Single-chip 2-D-blocked temporal program: the grid is split into
    ``px`` column strips *and* BY-row blocks, advancing K timesteps per
    pass (``chunk == ksteps``).

    Motivation (VERDICT r2 item 2 / docs/PERF.md): at giant widths the
    row-only temporal window caps BY at the VMEM budget / nx — 8192² is
    forced to (BY=32, K=4) and pays 2K/BY = 25% halo recompute.  Splitting
    x restores big row blocks: strips of W = nx/px + 128 lanes admit
    (BY=128, K=4) windows (~13% total halo waste, and the BY=128 pipeline
    shape that measures fastest at every width — docs/PERF.md sweeps).

    Mechanics (the single-chip composition of the two proven schedules):

    * f is carried strip-major ``[Px, 9, ny, W]``; the two K-wide x-halo
      lane bands sit at ``[BX, BX+K)`` (east neighbor's first K columns)
      and ``[W-K, W)`` (west neighbor's last K), so the kernel's periodic
      lane rotate over W reads globally-correct values for every pull
      that lands in an owned lane during K internal steps (trapezoidal
      containment in x, exactly as in ``make_sharded_temporal_2d_run``).
    * y halos ride the carried ghost slabs with in-kernel ``(i±1) % P``
      output routing — unchanged from the 1-D temporal kernel; no
      cross-device patch exists on one chip, so the slabs never touch
      jnp between passes.
    * x halos are kernel-roundtrip state too: each block OUTPUTS its
      128-lane edge columns routed to the neighbor strips' slots of two
      carried edge arrays (``XE``/``XW``, [Px, 9, ny, 128]), and the
      kernel refreshes the halo lane bands of its assembled window from
      those inputs (±K corner rows from the neighbor ghost slabs' edge
      lane-blocks — separate non-aliased buffers, so the in-place f
      update cannot race them).  The v1 design used a jnp patch between
      passes instead; XLA could not update the Pallas-aliased carry in
      place and copied the full strip-major f every pass (+1.56 GB temp
      at 8192², measured 13.9 -> 11.2 GLUPS vs row blocking).
    * the in-kernel av reduction is bounded to the owned lanes
      (``av_lanes = BX``); halo lanes collide under the neighbor's mask
      but are never counted.
    """
    ny, nx = params.ny, params.nx
    aw1, aw2 = accel_weights(params)
    # Validates every structural constraint (clear ValueErrors) and builds
    # the pallas_call; shared with the per-shard sharded factory.
    call = build_temporal_xtiled_kernel(
        ny,
        nx,
        by,
        ksteps,
        px,
        float(np.float32(params.omega)),
        float(aw1),
        float(aw2),
        interpret=interpret,
    )
    bx = nx // px
    w = bx + _XT_PAD
    p_loc = ny // by
    byext = by + 2 * ksteps
    edge = _XT_PAD if bx >= _XT_PAD else bx
    fcinv = np.float32(free_cells_inv)
    # int8 mask, widened in-kernel before comparing (4x less HBM traffic).
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)

    # Per-(strip, block) extended masks [Px * p_loc, byext, W]: band
    # layout shared with the sharded 2-D temporal factory via
    # fill_xt_mask_window.
    maskext_host = np.zeros((px * p_loc, byext, w), np.int8)
    for s in range(px):
        for i in range(p_loc):
            rows = np.arange(i * by - ksteps, i * by + by + ksteps) % ny
            fill_xt_mask_window(
                maskext_host[s * p_loc + i], fluid_host[rows],
                s, bx, nx, w, ksteps,
            )

    south_rows = [
        np.arange(i * by - ksteps, i * by) % ny for i in range(p_loc)
    ]
    north_rows = [
        np.arange(i * by + by, i * by + by + ksteps) % ny
        for i in range(p_loc)
    ]

    def ghosts_of(fs):
        """Ghost/edge carry slots derived from a padded strip state —
        shared by ``init`` (traced) and ``from_f_host`` (eager; each
        expression is a separate eager op, so every slot owns a distinct
        device buffer — the double-donation invariant)."""
        gs = jnp.stack(
            [
                jnp.transpose(fs[:, :, rows, :], (0, 2, 1, 3))
                for rows in south_rows
            ],
            axis=1,
        )
        gn = jnp.stack(
            [
                jnp.transpose(fs[:, :, rows, :], (0, 2, 1, 3))
                for rows in north_rows
            ],
            axis=1,
        )
        xe = jnp.roll(fs[:, :, :, bx - edge : bx], 1, axis=0)
        xw = jnp.roll(fs[:, :, :, :edge], -1, axis=0)
        return gs, gn, xe, xw

    def init(f, maskext=None):
        if maskext is None:
            maskext = jnp.asarray(maskext_host)
        fs = jnp.transpose(f.reshape(NSPEEDS, ny, px, bx), (2, 0, 1, 3))
        fs = jnp.concatenate(
            [fs, jnp.zeros((px, NSPEEDS, ny, _XT_PAD), jnp.float32)], axis=3
        )
        return (fs, *ghosts_of(fs), maskext)

    def init0(maskext=None):
        """Carry for the canonical uniform state, built by broadcast — no
        f0 argument, no relayout transient (at 16384² ``init`` would hold
        f0 + the strip-major fs ≈ 20 GB at once; this path peaks at the
        carry itself, ~12 GB).  The only difference from ``init`` is the
        PAD/dead lanes ``[bx+K, w-K)`` carrying the weights instead of
        zeros — don't-cares by the trapezoidal reach argument (owned
        outputs read at most K lanes past the strip edge, i.e. only the
        refreshed halo bands), and ``final`` strips them."""
        if maskext is None:
            maskext = jnp.asarray(maskext_host)
        per = jnp.asarray(uniform_weights(params))
        fs = jnp.broadcast_to(
            per[None, :, None, None], (px, NSPEEDS, ny, w)
        ).astype(jnp.float32)

        # Each carry slot gets its OWN buffer.  Returning one array object
        # in two slots (the original `(fs, ghost, ghost, xedge, xedge, m)`)
        # is fine inside jit, but a caller that donates the carry — the
        # autotuner's timing scan — then donates the same device buffer
        # twice, which the TPU runtime rejects at dispatch with an opaque
        # INVALID_ARGUMENT (observed: every eager-init0 x-tiled run on
        # hardware; misdiagnosed for a while as a giant-grid capacity
        # ceiling, docs/PERF.md round-3 capacity note).
        def ghost_buf():
            return jnp.broadcast_to(
                per[None, None, None, :, None],
                (px, p_loc, ksteps, NSPEEDS, w),
            ).astype(jnp.float32)

        def xedge_buf():
            return jnp.broadcast_to(
                per[None, :, None, None], (px, NSPEEDS, ny, edge)
            ).astype(jnp.float32)

        return (fs, ghost_buf(), ghost_buf(), xedge_buf(), xedge_buf(),
                maskext)

    # Single chip: both body-force sites always on (cf. the per-shard
    # gates in make_sharded_temporal_xt_run).
    gates = np.ones((1, 2), dtype=np.int32)

    def step(carry):
        fs, gs, gn, xe, xw, maskext = carry
        fs2, gs2, gn2, xe2, xw2, avs = call(
            fs, gs, gn, xe, xw, gs, gs, gn, gn, maskext, jnp.asarray(gates)
        )
        return (fs2, gs2, gn2, xe2, xw2, maskext), avs[:, 0] * fcinv

    def final(carry):
        fs = carry[0]
        return jnp.transpose(fs[:, :, :, :bx], (1, 2, 0, 3)).reshape(
            NSPEEDS, ny, nx
        )

    density = float(np.float32(params.density))

    def final_fields(carry):
        """Per-strip ``[u_x, u_y, rho - density]`` fp16 payload — same
        math as ``runtime.raw_fields_fn`` but computed in the carry's
        strip-major layout so the un-tiled fp32 f never materializes
        (the transposed intermediate is 3 fp16 planes, 24x smaller; the
        difference between 16384² fields readback running and OOMing).
        The fluid mask comes from the carried maskext's owned region
        (window rows [K, K+BY), lanes [0, BX)) — re-deriving it from
        ``obstacles`` would embed a second giant literal."""
        fs = carry[0][:, :, :, :bx]  # [px, 9, ny, bx] owned lanes
        maskext = carry[5].reshape(px, p_loc, byext, w)
        fluid = (
            maskext[:, :, ksteps : ksteps + by, :bx]
            .reshape(px, ny, bx)
            .astype(bool)
        )
        rho = jnp.sum(fs, axis=1)
        ux = jnp.where(
            fluid,
            (fs[:, 1] + fs[:, 5] + fs[:, 8] - fs[:, 3] - fs[:, 6] - fs[:, 7])
            / rho,
            0.0,
        )
        uy = jnp.where(
            fluid,
            (fs[:, 2] + fs[:, 5] + fs[:, 6] - fs[:, 4] - fs[:, 7] - fs[:, 8])
            / rho,
            0.0,
        )
        raw = jnp.stack([ux, uy, rho - density], axis=1).astype(jnp.float16)
        return jnp.transpose(raw, (1, 2, 0, 3)).reshape(3, ny, nx)

    def to_f_host(carry):
        """Fetch the strip state and un-tile on the HOST — the device-side
        ``final()`` transpose would hold both layouts at once (the
        giant-grid checkpoint OOM; see CheckpointIO).

        Fetched per strip: ~1 GiB chunks sustain 21.5 MB/s through the
        tunnel vs 16.9 for the monolithic array (measured, 5.4 GiB
        probe), the un-tiling lands each strip directly in the output
        (no second host copy of the padded fs), and the per-strip device
        slice is a ~1/px transient instead of none — a fine trade at
        ~1 GiB against 16 GiB.  The pad lanes are sliced off ON DEVICE:
        fetching them would move w/bx (6.25% at bx=2048) dead bytes
        through the same slow link this path exists to feed."""
        out = np.empty((NSPEEDS, ny, nx), np.float32)
        fs = carry[0]
        for s in range(px):
            out[:, :, s * bx : (s + 1) * bx] = np.asarray(
                jax.device_get(fs[s, :, :, :bx])
            )
        return out

    def from_f_host(f):
        """Host-side strip relayout + eager device ghost construction.
        Device peak: the padded fs plus the (small) ghost slots — never
        f and fs together (``init`` on device would; ~19 GiB at 16384²)."""
        f = np.asarray(f, dtype=np.float32)
        fs_host = np.zeros((px, NSPEEDS, ny, w), np.float32)
        fs_host[:, :, :, :bx] = f.reshape(NSPEEDS, ny, px, bx).transpose(
            2, 0, 1, 3
        )
        fs = jnp.asarray(fs_host)
        return (fs, *ghosts_of(fs), jnp.asarray(maskext_host))

    return StepProgram(
        init=init,
        step=step,
        final=final,
        chunk=ksteps,
        consts=(maskext_host,),
        init0=init0,
        final_fields=final_fields,
        checkpoint_io=CheckpointIO(
            to_f_host=to_f_host, from_f_host=from_f_host
        ),
    )


def choose_temporal_xtiled(
    ny: int, nx: int, max_iters: int
) -> tuple[int, int, int] | None:
    """Pick (BY, K, Px) for the x-tiled temporal schedule, or None when
    plain row blocking is the better (or only) choice.

    Heuristic (docs/PERF.md): x-tiling only pays once the row-only
    window cap forces BY below 64 — at nx = 8192 that cap is BY=32 (25%
    halo waste) while strips restore BY=128 (~13% total waste incl. the
    lane pad).

    Px comes from nx's divisor lattice: any Px >= 2 with lane-aligned
    owned width BX = nx/Px >= 1024 qualifies (narrower strips drown in
    the fixed 128-lane pad).  K keeps the measured preference order
    (``_temporal_tuning`` — the waste model below cannot see HBM
    amortization, which is what ranks K); Px then maximizes the useful
    fraction of the computed window,

        score(Px) = BY/(BY + 2K) * BX/(BX + _XT_PAD)

    with BY the largest VMEM-fitting row block at that strip width
    (halo-recompute waste x lane-pad waste — both recomputed rows and
    pad lanes cost full VPU work).  A pure |BX - 2048| proximity rule
    mis-ranks widths where a wide strip caps BY: at 12800² it picked
    Px=5 (BX=2560, capped BY=64) = 18.3 GLUPS where Px=10 (BX=1280,
    BY=128) measures 19.0 (docs/PERF.md round-4 spot checks).  The
    model keeps every hardware-validated 2048-multiple pick (8192² →
    Px=4, 10240² → Px=5, 12288² → Px=6, 16384² → Px=8) and fixes the
    non-multiples (12800² → Px=10).  Ties break toward the WIDER strip
    (fewer strips → fewer ghost-slab roundtrips).
    """
    if nx < 8192 or ny < 16:
        return None
    cands = [
        p
        for p in range(2, nx // 1024 + 1)
        if nx % p == 0 and (nx // p) % 128 == 0
    ]
    if not cands:
        return None
    _, window_budget, k_pref = _temporal_tuning(nx)
    for ksteps in k_pref:
        if max_iters % ksteps != 0 or 2 * ksteps > _XT_PAD:
            continue
        best = None  # (score, px, by); cands ascend so ties keep wider
        for px in cands:
            bx = nx // px
            w = bx + _XT_PAD
            by = _largest_block_rows(ny, w, window_budget)
            while by is not None and by >= 8 and (by + 2 * ksteps) * w > window_budget:
                by //= 2
            if (
                by is None
                or by < 8
                or ksteps > by - 2
                or ny % by != 0
                or ny // by < 2
            ):
                continue
            score = by / (by + 2 * ksteps) * bx / (bx + _XT_PAD)
            if best is None or score > best[0] + 1e-12:
                best = (score, px, by)
        if best is not None:
            return best[2], ksteps, best[1]
    return None


def _step_kernel_mega(
    f_hbm,  # ANY [9, ny, nx] (aliased to fout_hbm)
    gs0_hbm,  # ANY [P, 9, K, nx] initial south ghost slabs
    gn0_hbm,  # ANY [P, 9, K, nx]
    mask_ref,  # VMEM [P, BY+2K, nx] int8 per-block extended fluid masks
    fout_hbm,  # ANY [9, ny, nx]
    gs_fin_hbm,  # ANY [P, 9, K, nx] final south ghost slabs
    gn_fin_hbm,  # ANY [P, 9, K, nx]
    avs_ref,  # SMEM [T*K, 1]
    win,  # VMEM scratch (2, 9, BY, nx): center in/out staging
    ghosts,  # VMEM scratch (2, 2, P, 9, K, nx): parity x (south, north)
    sem_in,  # DMA (ring,)
    sem_out,  # DMA (ring,)
    sem_misc,  # DMA (4,)
    *,
    by: int,
    ksteps: int,
    tpasses: int,
    ny: int,
    nx: int,
    omega: float,
    aw1: float,
    aw2: float,
    ring: int = 2,
):
    """Megakernel: ``tpasses`` temporal K-passes over the whole grid in ONE
    pallas_call, with manually pipelined DMA.

    Motivation (measured, docs/PERF.md): in the scan-of-pallas_call
    temporal schedule the per-step cost is almost exactly DMA floor +
    compute (47 us = 19.7 + 27), i.e. Mosaic's automatic pipeline does NOT
    overlap the center-block DMA with compute when the f buffer is
    aliased in place.  Here ``f`` stays in HBM (ANY memory space) and the
    kernel overlaps explicitly: while block ``i`` computes its K internal
    steps, block ``i+1``'s center rows are prefetched and block ``i-1``'s
    results are written back (classic 2-deep double buffering, one DMA
    semaphore pair per direction).

    In-place safety over the aliased HBM f (no Mosaic hazard tracking in
    ANY space — the ordering proof is ours):

    * prefetch(j+1) reads rows of block (i+1)%P at the state written in
      pass p-1 (or p for the wrap into the next pass) — always a region
      whose writeback completed >= P-1 iterations earlier (P >= ring);
    * the up-to-(ring-1) in-flight writebacks (iterations j-ring+2..j)
      and prefetch(j+1) touch pairwise disjoint row bands whenever
      P >= ring (block indices differ mod P);
    * the buffer-reuse waits (sem_out) guarantee writeback(j+1-ring) has
      landed before win[(j+1)%ring] is overwritten by prefetch(j+1).

    ``ring`` is the staging-buffer depth.  ring=2 (classic double
    buffering) leaves the writeback fully EXPOSED: it starts at the
    bottom of iteration j and is waited as the first op of j+1, because
    prefetch(j+1) reuses the very slot writeback(j-1) drained into.
    ring=3 gives each writeback two full compute iterations to retire
    behind the next blocks' compute (~9*BY*nx*4 bytes hidden per block).
    Requires P >= ring for the disjointness argument above — the builder
    picks ring = 3 when grid_p >= 3, else 2.

    Ghost slabs never touch HBM during the call: they live in a
    parity-double-buffered VMEM scratch (pass p reads parity p%2, writes
    parity (p+1)%2 — double-buffered because slot (i+-1)%P of the SAME
    pass must not be clobbered before its owner reads it).  Layout is
    ``[P, 9, K, nx]`` so the tiled trailing dims (K, nx) pad nothing.
    The body-force gates are the single-chip ones (interior kick on the
    last block, wrap kick on block 0) — the sharded paths keep the
    scan-of-pallas_call schedule.
    """
    f32 = jnp.float32
    grid_p = ny // by

    # --- load initial ghost state into parity 0 -----------------------------
    init_s = pltpu.make_async_copy(gs0_hbm, ghosts.at[0, 0], sem_misc.at[0])
    init_n = pltpu.make_async_copy(gn0_hbm, ghosts.at[0, 1], sem_misc.at[1])
    init_s.start()
    init_n.start()
    init_s.wait()
    init_n.wait()

    def dma_in(i: int, slot: int):
        # Read through the OUTPUT ref: it is aliased to the input, and
        # pass p+1 must see pass p's writebacks (reading the input ref
        # returns stale pre-call data in interpret mode).
        return pltpu.make_async_copy(
            fout_hbm.at[:, pl.ds(i * by, by), :], win.at[slot], sem_in.at[slot]
        )

    def dma_out(i: int, slot: int):
        return pltpu.make_async_copy(
            win.at[slot], fout_hbm.at[:, pl.ds(i * by, by), :], sem_out.at[slot]
        )

    dma_in(0, 0).start()
    total = tpasses * grid_p

    def loop(j, carry):
        p = jax.lax.div(j, grid_p)
        i = jax.lax.rem(j, grid_p)
        slot = jax.lax.rem(j, ring)
        nxt = jax.lax.rem(j + 1, ring)
        par = jax.lax.rem(p, 2)
        npar = jax.lax.rem(p + 1, 2)

        # Free the prefetch target slot: wait writeback(j+1-ring), the
        # iteration that last used slot (j+1)%ring.  With ring=2 this is
        # writeback(j-1) — fully exposed; with ring=3 it is
        # writeback(j-2), which had two compute iterations to retire.
        @pl.when(j >= ring - 1)
        def _():
            jj = j - (ring - 1)
            dma_out(jax.lax.rem(jj, grid_p), nxt).wait()

        @pl.when(j + 1 < total)
        def _():
            dma_in(jax.lax.rem(j + 1, grid_p), nxt).start()

        dma_in(i, slot).wait()

        planes = [
            jnp.concatenate(
                [
                    ghosts[par, 0, i, k, :, :],
                    win[slot, k, :, :],
                    ghosts[par, 1, i, k, :, :],
                ],
                axis=0,
            )
            for k in range(NSPEEDS)
        ]
        fluid = mask_ref[i].astype(f32) > f32(0.5)
        final, parts = _window_advance(
            planes,
            fluid,
            i == grid_p - 1,
            i == 0,
            by=by,
            ksteps=ksteps,
            nx=nx,
            omega=omega,
            aw1=aw1,
            aw2=aw2,
        )
        ip1 = jax.lax.rem(i + 1, grid_p)
        im1 = jax.lax.rem(i - 1 + grid_p, grid_p)
        for k in range(NSPEEDS):
            win[slot, k, :, :] = final[k][ksteps : ksteps + by, :]
            ghosts[npar, 0, ip1, k, :, :] = final[k][by : by + ksteps, :]
            ghosts[npar, 1, im1, k, :, :] = final[k][ksteps : 2 * ksteps, :]

        base = p * ksteps
        for s, part in enumerate(parts):

            @pl.when(i == 0)
            def _(s=s, part=part):
                avs_ref[base + s, 0] = part

            @pl.when(i > 0)
            def _(s=s, part=part):
                avs_ref[base + s, 0] += part

        dma_out(i, slot).start()
        return carry

    jax.lax.fori_loop(0, total, loop, 0)
    # Drain the writebacks whose buffer-reuse wait never ran: the last
    # ring-1 iterations' (the loop waits writeback(j+1-ring) only).
    for jj in range(max(0, total - ring + 1), total):
        dma_out(jj % grid_p, jj % ring).wait()

    # --- flush final ghost state -------------------------------------------
    fpar = tpasses % 2
    fin_s = pltpu.make_async_copy(
        ghosts.at[fpar, 0], gs_fin_hbm, sem_misc.at[2]
    )
    fin_n = pltpu.make_async_copy(
        ghosts.at[fpar, 1], gn_fin_hbm, sem_misc.at[3]
    )
    fin_s.start()
    fin_n.start()
    fin_s.wait()
    fin_n.wait()


def build_mega_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    by: int,
    ksteps: int,
    tpasses: int,
    *,
    interpret: bool = False,
) -> StepProgram:
    """Megakernel program: ``chunk == tpasses * ksteps`` timesteps per
    pallas_call (see :func:`_step_kernel_mega`).  Ghost slabs are carried
    between calls as HBM arrays shaped [P, 9, K, nx]."""
    ny, nx = params.ny, params.nx
    grid_p = ny // by
    if grid_p < 2:
        raise ValueError("megakernel needs >= 2 row blocks")
    if not 2 <= ksteps <= by - 2:
        raise ValueError(f"need 2 <= K <= BY-2, got K={ksteps}, BY={by}")
    # Staging ring depth: 3 hides the center-block writeback behind the
    # next two blocks' compute; the in-place disjointness proof needs
    # grid_p >= ring (see _step_kernel_mega), so 2-block grids keep the
    # classic (writeback-exposed) double buffer.
    ring = 3 if grid_p >= 3 else 2
    aw1, aw2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)
    maskext_host = np.stack(
        [
            fluid_host[
                np.arange(i * by - ksteps, i * by + by + ksteps) % ny, :
            ]
            for i in range(grid_p)
        ]
    )
    south_rows = [
        np.arange(i * by - ksteps, i * by) % ny for i in range(grid_p)
    ]
    north_rows = [
        np.arange(i * by + by, i * by + by + ksteps) % ny
        for i in range(grid_p)
    ]
    chunk = tpasses * ksteps
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    call = pl.pallas_call(
        functools.partial(
            _step_kernel_mega,
            by=by,
            ksteps=ksteps,
            tpasses=tpasses,
            ny=ny,
            nx=nx,
            omega=float(np.float32(params.omega)),
            aw1=float(aw1),
            aw2=float(aw2),
            ring=ring,
        ),
        grid=(1,),
        in_specs=[
            any_spec,
            any_spec,
            any_spec,
            pl.BlockSpec(
                (grid_p, by + 2 * ksteps, nx),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            any_spec,
            any_spec,
            any_spec,
            pl.BlockSpec((chunk, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((grid_p, NSPEEDS, ksteps, nx), jnp.float32),
            jax.ShapeDtypeStruct((grid_p, NSPEEDS, ksteps, nx), jnp.float32),
            jax.ShapeDtypeStruct((chunk, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ring, NSPEEDS, by, nx), jnp.float32),
            pltpu.VMEM((2, 2, grid_p, NSPEEDS, ksteps, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(ny * nx * 110 * chunk),
            bytes_accessed=int(2 * NSPEEDS * ny * nx * 4 * tpasses),
            transcendentals=int(ny * nx * chunk),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    def init(f, maskext=None):
        # The extended mask rides the carry as a runtime operand (the
        # mask-literal rule: an embedded [P, BY+2K, nx] literal blows the
        # remote compile service's request limit at giant grids — same
        # HTTP-413 mode the temporal programs fixed via ``consts``).
        if maskext is None:
            maskext = jnp.asarray(maskext_host)
        gs = jnp.stack(
            [f[:, rows, :] for rows in south_rows]
        )  # [P, 9, K, nx]
        gn = jnp.stack([f[:, rows, :] for rows in north_rows])
        return (f, gs, gn, maskext)

    def step(carry):
        f, gs, gn, maskext = carry
        f_new, gs_new, gn_new, avs = call(f, gs, gn, maskext)
        return (f_new, gs_new, gn_new, maskext), avs[:, 0] * fcinv

    return StepProgram(
        init=init,
        step=step,
        final=lambda c: c[0],
        chunk=chunk,
        consts=(maskext_host,),
    )


def _temporal_window_budget() -> int:
    """Empirical VMEM budget for the temporal kernel's (BY+2K)-row
    working set (unrolled-step temporaries): cells per window, with the
    raised VMEM limit.  (128+16)x1024 and (64+8)x4096 both fit;
    (64+32)x4096 (393k) and (512+16)x1024 (540k) overflow.  Scales with
    ``LBM_VMEM_LIMIT_MB`` (see :func:`_vmem_limit_bytes`)."""
    return int(192 * 1024 * _vmem_scale())


def _temporal_tuning(nx: int) -> tuple[int, int, tuple[int, ...]]:
    """(block-cell budget, window-cell budget, preferred K order) —
    empirically tuned on v5e (docs/PERF.md sweeps).

    Narrow grids are HBM-amortization-bound: deep K wins ((128, 8) at
    1024² = 47.0 µs vs 48.9 for K=4).  Wide grids (nx >= 2048) are
    VPU/halo-waste-bound: the biggest VMEM-fitting window with shallow K
    wins — (64, 4) at 4096² = 19.8 GLUPS vs 13.4 for the old (32, 8)
    pick, and (128, 4) at 2048² = 22.3 GLUPS vs 19.0 for (64, 8).  (The
    'wide grids are anomalously slow' lore was a tuning artifact: at the
    right (BY, K) every size runs ~20-22 GLUPS pure-step.)"""
    if nx >= 2048:
        return (
            int(256 * 1024 * _vmem_scale()),
            int(340 * 1024 * _vmem_scale()),
            (4, 8, 2),
        )
    return _block_cell_budget(), _temporal_window_budget(), (8, 4, 2)


def _largest_block_rows(ny: int, nx: int, budget: int) -> int | None:
    """Largest power-of-two divisor of ny with by*nx <= budget (>= 3)."""
    by = 1
    while by * 2 <= ny and ny % (by * 2) == 0 and (by * 2) * nx <= budget:
        by *= 2
    if by * nx > budget or by < 3:
        return None
    if by < 8 and by < ny:
        return None  # Pallas row-dim tiling constraint (see choose_block_rows)
    return by


def _structurally_valid(ny: int, by: int, ksteps: int, max_iters: int) -> bool:
    """The temporal kernel's hard constraints (see build_temporal_program)."""
    return (
        by >= 4
        # Pallas row-dim tiling: BY % 8 == 0 (a whole-grid by == ny block
        # would also lower, but the >= 2 row-block constraint below
        # already excludes it).
        and by % 8 == 0
        and ny % by == 0
        and ny // by >= 2
        and 2 <= ksteps <= by - 2
        and max_iters % ksteps == 0
    )


def _xtiled_structurally_valid(
    ny: int, nx: int, by: int, ksteps: int, px: int, max_iters: int
) -> bool:
    """The x-tiled temporal kernel's hard constraints (the build-time
    checks of :func:`build_temporal_xtiled_program`, TPU lowering form)."""
    if px < 2 or nx % px != 0:
        return False
    bx = nx // px
    return (
        bx % 128 == 0  # lane-aligned strips
        and by % 8 == 0
        and ny % by == 0
        and ny // by >= 2
        and 2 <= ksteps <= by - 2
        and max_iters % ksteps == 0
        and 2 * ksteps <= _XT_PAD
        and ksteps <= bx
    )


def choose_schedule(
    ny: int, nx: int, max_iters: int, device_kind: str | None = None
) -> tuple[int, int, int] | None:
    """Unified temporal-schedule chooser: ``(BY, K, Px)`` with Px = 1 for
    plain row blocking, Px > 1 for the x-tiled schedule; None when neither
    applies (whole-grid / multi-step cases).

    Precedence: the measured tuning cache first — entries are ranked
    fastest-first by ``lbm autotune``, which sweeps BOTH schedules, so the
    first structurally-valid entry wins regardless of its Px — then the
    x-tiled width heuristic (:func:`choose_temporal_xtiled`), then the
    row-only heuristics (:func:`choose_temporal`).
    """
    from lbm_tpu import tuning

    if device_kind is None:
        device_kind = tuning.default_device_kind()
    for by, ksteps, px in tuning.lookup(device_kind, ny, nx):
        if px == 1 and _structurally_valid(ny, by, ksteps, max_iters):
            return by, ksteps, 1
        if px > 1 and _xtiled_structurally_valid(
            ny, nx, by, ksteps, px, max_iters
        ):
            return by, ksteps, px
    picked_xt = choose_temporal_xtiled(ny, nx, max_iters)
    if picked_xt is not None:
        return picked_xt
    picked = choose_temporal(ny, nx, max_iters, device_kind=device_kind)
    if picked is not None:
        return picked[0], picked[1], 1
    return None


def choose_temporal(
    ny: int, nx: int, max_iters: int, device_kind: str | None = None
) -> tuple[int, int] | None:
    """Pick (BY, K) for the temporal kernel: K | max_iters, K <= BY-2,
    BY a power-of-two divisor of ny with >= 2 blocks, window within the
    VMEM budget.  A measured tuning-cache entry for this device/grid wins
    (``lbm_tpu.tuning``, populated by ``tools/autotune.py``); otherwise
    the width-dependent heuristics (:func:`_temporal_tuning`) apply.

    ``device_kind``: the kind of the device the program will actually run
    on (defaults to the default backend's first device — pass it when the
    simulator is bound to a non-default device via LBM_DEVICE/--device)."""
    from lbm_tpu import tuning

    if device_kind is None:
        device_kind = tuning.default_device_kind()
    for by, ksteps, px in tuning.lookup(device_kind, ny, nx):
        if px == 1 and _structurally_valid(ny, by, ksteps, max_iters):
            return by, ksteps
    block_budget, window_budget, k_pref = _temporal_tuning(nx)
    by_max = _largest_block_rows(ny, nx, block_budget)
    if by_max is None or by_max >= ny:
        return None
    for ksteps in k_pref:
        if max_iters % ksteps != 0:
            continue
        by = by_max
        while by >= 8 and (by + 2 * ksteps) * nx > window_budget:
            by //= 2
        # by >= 8: Pallas requires block row dims divisible by 8 (by is a
        # power of two and < ny here, so 4 would not lower).
        if by >= 8 and ksteps <= by - 2 and ny % by == 0 and ny // by >= 2:
            return by, ksteps
    return None


def pick_chunk(max_iters: int, limit: int = 256) -> int:
    """Largest divisor of ``max_iters`` not exceeding ``limit``.

    Prefers a multiple of 8: the multi-step kernel's internal unroll is
    ``gcd(chunk, 8)``-deep, and Mosaic only pipelines across unrolled
    steps — chunk=250 (unroll 2) measures ~40% slower per step than
    chunk=200 (unroll 8) at 256² on v5e.
    """
    best_any = 1
    for c in range(min(limit, max_iters), 0, -1):
        if max_iters % c == 0:
            if c % 8 == 0:
                return c
            best_any = max(best_any, c)
    return best_any


def make_reference_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
) -> StepProgram:
    """Pure-jnp reference path wrapped as a StepProgram with the fluid
    mask routed as a runtime operand (carried scan leaf seeded from
    ``consts``), per the mask-literal rule — the jnp path is the level-2
    compile fallback on TPU, so it must not itself embed a giant literal.
    """
    from lbm_tpu.ops.reference import make_masked_step_fn

    fluid_host = ~np.asarray(obstacles, dtype=bool)
    masked = make_masked_step_fn(params, free_cells_inv)

    def init(f, fluid=None):
        if fluid is None:
            fluid = jnp.asarray(fluid_host)
        return (f, fluid)

    def step(carry):
        f, fluid = carry
        f_new, av = masked(f, fluid)
        return (f_new, fluid), av

    return StepProgram(
        init=init,
        step=step,
        final=lambda carry: carry[0],
        consts=(fluid_host,),
    )


def make_fused_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    *,
    interpret: bool = False,
    max_iters: int | None = None,
    device_kind: str | None = None,
) -> StepProgram:
    """Fused-kernel step program, falling back to the jnp reference path
    when the grid doesn't admit a valid row-block decomposition.

    With ``max_iters`` given and a whole-grid-in-VMEM case, returns a
    multi-step (chunked) program whose chunk divides ``max_iters``.
    ``device_kind`` keys the measured tuning cache (see
    :func:`choose_temporal`).
    """
    by = choose_block_rows(params.ny, params.nx)
    if by is None:
        return make_reference_program(params, obstacles, free_cells_inv)
    if (
        params.ny * params.nx <= _multistep_cell_budget()
        and max_iters is not None
        and max_iters > 1
    ):
        chunk = pick_chunk(max_iters)
        if chunk > 1:
            return build_multi_step_program(
                params, obstacles, free_cells_inv, chunk, interpret=interpret
            )
    if by < params.ny and max_iters is not None:
        picked = choose_schedule(
            params.ny, params.nx, max_iters, device_kind=device_kind
        )
        if picked is not None:
            t_by, ksteps, px = picked
            if px > 1:
                return build_temporal_xtiled_program(
                    params,
                    obstacles,
                    free_cells_inv,
                    t_by,
                    ksteps,
                    px,
                    interpret=interpret,
                )
            return build_temporal_program(
                params,
                obstacles,
                free_cells_inv,
                t_by,
                ksteps,
                interpret=interpret,
            )
    return build_fused_program(
        params, obstacles, free_cells_inv, by, interpret=interpret
    )


def make_fused_step_fn(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    *,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """Plain ``f -> (f', av)`` view of the fused program (re-derives the
    ghost state every call — use :func:`make_fused_program` inside loops)."""
    return make_fused_program(
        params, obstacles, free_cells_inv, interpret=interpret
    ).single()
