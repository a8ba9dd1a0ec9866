"""Multi-chip spatial sharding: row-sharded grid with per-step halo exchange.

The reference is a single-device code; its scaling story stops at one GPU
(SURVEY §2 parallelism table).  This module adds the TPU-native scale-out:
``f[9, ny, nx]`` is sharded by rows across a 1-D ``jax.sharding.Mesh``
axis ``"y"``, and each timestep exchanges one ghost row per direction with
``lax.ppermute`` over ICI, then runs the same fused physics locally.  The
per-step mean-speed reduction becomes a ``lax.psum``.

The whole run (the ``lax.scan`` over timesteps) lives *inside* one
``shard_map``, so the entire multi-chip simulation is a single SPMD XLA
program: no host round-trips, collectives compiled into the loop body —
the distributed analog of the reference's "enqueue 40k kernels, sync once"
contract (``d2q9-bgk.c:221-240``).

Correctness notes:

* Fully-periodic wrap in y is the ring permutation itself: device 0's
  south ghost is device P-1's last row.
* The body-force row ``ny-2`` lives on device P-1 (requires local
  ``ny/P >= 3`` so its streaming readers are local too); the kick is
  applied with a uniform row-index mask so the SPMD program stays
  identical across devices.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbm_tpu.config import LBMParams
from lbm_tpu.diagnostics import ResultMetrics
from lbm_tpu.runtime import COMPILE_FALLBACK_ERRORS, enable_compile_cache
from lbm_tpu.geometry import free_cells_of
from lbm_tpu.ops.lattice import CX, CY, NSPEEDS, kick_scale
from lbm_tpu.ops.reference import accel_weights, collide, init_cells

AXIS = "y"


class _LoweredWithConsts:
    """Adapter so a factory whose program takes ``(f, *consts)`` still
    presents the single-argument ``run.lower(spec).compile()(f)`` protocol
    ``ShardedSimulator.compiled`` uses.  The consts (large static operands
    like the temporal extended mask) ride as runtime ARGUMENTS — an
    embedded multi-hundred-MB literal exceeds the remote compile
    service's request limit at giant grids (HTTP 413 at 8192²; see
    ``lbm_tpu.ops.fused.StepProgram.consts``)."""

    def __init__(self, lowered, consts):
        self._lowered = lowered
        self._consts = consts

    def compile(self):
        exe = self._lowered.compile()
        consts = self._consts
        return lambda f: exe(f, *consts)


def default_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` (all by default).

    Raises when fewer devices exist than requested — silently clamping
    would hand back a smaller mesh and the caller would run (and report)
    the wrong topology.
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _halo_exchange(f_loc: jax.Array, n_shards: int) -> tuple[jax.Array, jax.Array]:
    """Ring-exchange the boundary rows.

    Returns ``(ghost_s, ghost_n)``: the global rows just below/above this
    shard's slab — one ``ppermute`` each way over the ICI ring.
    """
    if n_shards == 1:
        return f_loc[:, -1:, :], f_loc[:, :1, :]
    down, up = _rings(n_shards)
    ghost_s = jax.lax.ppermute(f_loc[:, -1:, :], AXIS, down)
    ghost_n = jax.lax.ppermute(f_loc[:, :1, :], AXIS, up)
    return ghost_s, ghost_n


def _stream_with_ghosts(
    f_loc: jax.Array, ghost_s: jax.Array, ghost_n: jax.Array
) -> jax.Array:
    """Pull-streaming on a row slab with explicit ghost rows."""
    ny_loc = f_loc.shape[1]
    ext = jnp.concatenate([ghost_s, f_loc, ghost_n], axis=1)
    return jnp.stack(
        [
            jnp.roll(
                ext[k, 1 - int(CY[k]) : 1 - int(CY[k]) + ny_loc, :],
                int(CX[k]),
                axis=1,
            )
            for k in range(NSPEEDS)
        ]
    )


def _accelerate_masked(
    f_loc: jax.Array,
    fluid_loc: jax.Array,
    row_is_kick: jax.Array,  # [ny_loc, 1] bool: local row == global ny-2
    w1: np.float32,
    w2: np.float32,
) -> jax.Array:
    """Body force with a uniform row mask (same program on every device)."""
    ok = (
        row_is_kick
        & fluid_loc
        & (f_loc[3] - w1 > 0.0)
        & (f_loc[6] - w2 > 0.0)
        & (f_loc[7] - w2 > 0.0)
    )
    okf = jnp.where(ok, jnp.float32(1.0), jnp.float32(0.0))
    updates = []
    for k in range(NSPEEDS):
        s = kick_scale(k, w1, w2)
        updates.append(f_loc[k] if s is None else f_loc[k] + okf * s)
    return jnp.stack(updates)


def _rings(n: int) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """(down, up) neighbor pairs for a ring ``ppermute`` over an n-device
    mesh axis — the single definition every sharded factory uses."""
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    return down, up


def _patch_ghost_slots(gs, gn, axis: str, n: int, down, up):
    """Cross-device ghost-slot patch shared by all four Pallas sharded
    factories (1-D/2-D x fused/temporal).

    Slot algebra (load-bearing — keep ONE definition): the local kernels
    wrap ghosts block-cyclically, so after a pass slot 0's south ghost
    holds the shard's OWN last row(s) — exactly what the next shard down
    the ring needs — and the last slot's north ghost its OWN first
    row(s).  One ``ppermute`` each way replaces those two slots with the
    true neighbors' rows; interior slots are already correct.
    """
    if n == 1:
        return gs, gn
    p_loc = gs.shape[0]
    recv_s = jax.lax.ppermute(gs[0], axis, down)
    recv_n = jax.lax.ppermute(gn[p_loc - 1], axis, up)
    gs = jnp.concatenate([recv_s[None], gs[1:]], axis=0)
    gn = jnp.concatenate([gn[: p_loc - 1], recv_n[None]], axis=0)
    return gs, gn


def _ghost_seed_rows(
    ny_loc: int, by: int, ksteps: int
) -> tuple[np.ndarray, np.ndarray]:
    """In-slab row indices seeding each block's ghost slots, shape
    ``[p_loc, ksteps]`` (block-cyclic wrap): slot i's south ghost holds
    the ``ksteps`` rows above block i's first row, its north ghost the
    ``ksteps`` rows below its last.  Fused kernels seed 1-row ghosts,
    temporal kernels K-row slabs — same formula."""
    p_loc = ny_loc // by
    south = np.stack(
        [np.arange(i * by - ksteps, i * by) % ny_loc for i in range(p_loc)]
    ).astype(np.int32)
    north = np.stack(
        [
            np.arange((i + 1) * by, (i + 1) * by + ksteps) % ny_loc
            for i in range(p_loc)
        ]
    ).astype(np.int32)
    return south, north


def make_sharded_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """Build ``run(f_global) -> (f_final_global, av_vels)`` — one SPMD
    program containing the full time loop over the mesh."""
    if max_iters is None:
        max_iters = params.max_iters
    n_shards = mesh.shape[AXIS]
    ny, nx = params.ny, params.nx
    if ny % n_shards != 0:
        raise ValueError(f"ny={ny} not divisible by mesh size {n_shards}")
    ny_loc = ny // n_shards
    if ny_loc < 3:
        raise ValueError(
            f"need >= 3 rows per shard (ny={ny}, shards={n_shards})"
        )
    omega = np.float32(params.omega)
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)

    def local_run(f_loc: jax.Array, fluid_loc: jax.Array):
        shard = jax.lax.axis_index(AXIS)
        row0 = shard * ny_loc
        local_rows = jax.lax.broadcasted_iota(jnp.int32, (ny_loc, 1), 0)
        row_is_kick = (local_rows + row0) == (ny - 2)

        def body(f, _):
            f = _accelerate_masked(f, fluid_loc, row_is_kick, w1, w2)
            ghost_s, ghost_n = _halo_exchange(f, n_shards)
            tmp = _stream_with_ghosts(f, ghost_s, ghost_n)
            f_new, tot_u = collide(tmp, fluid_loc, omega)
            av = jax.lax.psum(tot_u, AXIS) * fcinv
            return f_new, av

        return jax.lax.scan(body, f_loc, None, length=max_iters)

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None)),
        out_specs=(P(None, AXIS, None), P()),
    )

    # The fluid mask enters as a runtime ARGUMENT (committed to the mesh
    # here), never an HLO literal — an embedded giant-grid literal blows
    # the remote compile service's request limit (see _LoweredWithConsts).
    fluid_dev = jax.device_put(
        ~np.asarray(obstacles, dtype=bool),
        NamedSharding(mesh, P(AXIS, None)),
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, fluid: jax.Array):
        return sharded(f_global, fluid)

    def run(f_global: jax.Array):
        return run_base(f_global, fluid_dev)

    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, fluid_dev), (fluid_dev,)
    )
    return run


AXIS_X = "x"


def default_mesh_2d(py: int, px: int) -> Mesh:
    """2-D mesh (rows x cols) over the first py*px devices."""
    devs = jax.devices()
    if py * px > len(devs):
        raise ValueError(
            f"requested a {py}x{px} mesh but only {len(devs)} devices "
            "are available"
        )
    return Mesh(np.array(devs[: py * px]).reshape(py, px), (AXIS, AXIS_X))


def make_sharded_2d_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """2-D spatial decomposition: grid tiles sharded over a (y, x) mesh.

    Halo exchange is the classic two-phase scheme: rows first (one
    ``ppermute`` each way over the ``y`` ring), then columns of the
    row-extended slab (one ``ppermute`` each way over the ``x`` ring) —
    the column phase carries the corner cells the diagonal speeds need.
    Streaming then becomes pure static slices of the (nyl+2, nxl+2)
    extended tile; the av reduction is a ``psum`` over both axes.
    """
    if max_iters is None:
        max_iters = params.max_iters
    py, px = mesh.shape[AXIS], mesh.shape[AXIS_X]
    ny, nx = params.ny, params.nx
    if ny % py != 0 or nx % px != 0:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    nyl, nxl = ny // py, nx // px
    if nyl < 3 or nxl < 2:
        raise ValueError(f"tiles too thin: {nyl}x{nxl} (need >=3 rows, >=2 cols)")
    omega = np.float32(params.omega)
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    ring_y, ring_y_up = _rings(py)
    ring_x, ring_x_up = _rings(px)

    def local_run(f_loc: jax.Array, fluid_loc: jax.Array):
        yshard = jax.lax.axis_index(AXIS)
        row0 = yshard * nyl
        local_rows = jax.lax.broadcasted_iota(jnp.int32, (nyl, 1), 0)
        row_is_kick = (local_rows + row0) == (ny - 2)

        def exchange(f):
            gs = f[:, -1:, :] if py == 1 else jax.lax.ppermute(
                f[:, -1:, :], AXIS, ring_y
            )
            gn = f[:, :1, :] if py == 1 else jax.lax.ppermute(
                f[:, :1, :], AXIS, ring_y_up
            )
            ext_y = jnp.concatenate([gs, f, gn], axis=1)
            gw = ext_y[:, :, -1:] if px == 1 else jax.lax.ppermute(
                ext_y[:, :, -1:], AXIS_X, ring_x
            )
            ge = ext_y[:, :, :1] if px == 1 else jax.lax.ppermute(
                ext_y[:, :, :1], AXIS_X, ring_x_up
            )
            return jnp.concatenate([gw, ext_y, ge], axis=2)

        def body(f, _):
            f = _accelerate_masked(f, fluid_loc, row_is_kick, w1, w2)
            ext = exchange(f)
            tmp = jnp.stack(
                [
                    ext[
                        k,
                        1 - int(CY[k]) : 1 - int(CY[k]) + nyl,
                        1 - int(CX[k]) : 1 - int(CX[k]) + nxl,
                    ]
                    for k in range(NSPEEDS)
                ]
            )
            f_new, tot_u = collide(tmp, fluid_loc, omega)
            av = jax.lax.psum(tot_u, (AXIS, AXIS_X)) * fcinv
            return f_new, av

        return jax.lax.scan(body, f_loc, None, length=max_iters)

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, AXIS_X), P(AXIS, AXIS_X)),
        out_specs=(P(None, AXIS, AXIS_X), P()),
    )

    # Runtime operand, not an HLO literal — see make_sharded_run.
    fluid_dev = jax.device_put(
        ~np.asarray(obstacles, dtype=bool),
        NamedSharding(mesh, P(AXIS, AXIS_X)),
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, fluid: jax.Array):
        return sharded(f_global, fluid)

    def run(f_global: jax.Array):
        return run_base(f_global, fluid_dev)

    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, fluid_dev), (fluid_dev,)
    )
    return run


def make_sharded_fused_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
    *,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """Fused-Pallas sharded run: each shard runs the blocked ghost-roundtrip
    kernel locally; the two cross-shard ghost slots are patched per step
    with one ``ppermute`` each way over ICI.

    Slot algebra: the local kernel wraps ghosts block-cyclically, so after a
    step shard ``d``'s ``gs_out[0]`` holds its *own last row* — exactly what
    shard ``d+1`` needs as its south ghost — and ``gn_out[P-1]`` holds its
    own first row — what shard ``d-1`` needs as its north ghost.  The
    per-step patch is therefore a pure neighbor exchange of those two slots.
    """
    from lbm_tpu.ops.fused import build_blocked_kernel, choose_block_rows

    if max_iters is None:
        max_iters = params.max_iters
    n_shards = mesh.shape[AXIS]
    ny, nx = params.ny, params.nx
    if ny % n_shards != 0:
        raise ValueError(f"ny={ny} not divisible by mesh size {n_shards}")
    ny_loc = ny // n_shards
    by = choose_block_rows(ny_loc, nx)
    if by is None:
        raise ValueError(
            f"local grid {ny_loc}x{nx} has no valid row-block split; "
            "use ShardedSimulator(kernel='reference')"
        )
    p_loc = ny_loc // by
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    call = build_blocked_kernel(
        ny_loc,
        nx,
        by,
        float(np.float32(params.omega)),
        float(w1),
        float(w2),
        dynamic_accel_gate=True,
        interpret=interpret,
    )
    down, up = _rings(n_shards)
    south_rows, north_rows = _ghost_seed_rows(ny_loc, by, 1)

    def local_run(f_loc: jax.Array, fluid_loc: jax.Array):
        shard = jax.lax.axis_index(AXIS)
        # Global row ny-2 lives on the last shard (local row ny_loc-2,
        # inside local program p_loc-1 since by >= 3).
        gate = (shard == n_shards - 1).astype(jnp.int32).reshape(1, 1)

        def body(carry, _):
            f, gs, gn = carry
            gs, gn = _patch_ghost_slots(gs, gn, AXIS, n_shards, down, up)
            f2, gs2, gn2, tot = call(f, gs, gn, fluid_loc, gate)
            av = jax.lax.psum(tot[0, 0] * fcinv, AXIS)
            return (f2, gs2, gn2), av

        gs0 = jnp.transpose(f_loc[:, south_rows[:, 0], :], (1, 0, 2))
        gn0 = jnp.transpose(f_loc[:, north_rows[:, 0], :], (1, 0, 2))
        (f_fin, _, _), avs = jax.lax.scan(
            body, (f_loc, gs0, gn0), None, length=max_iters
        )
        return f_fin, avs

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None)),
        out_specs=(P(None, AXIS, None), P()),
        # pallas_call outputs carry no varying-mesh-axis metadata; skip the
        # static replication check (correctness is covered by tests that
        # compare sharded vs single-device runs).
        check_vma=False,
    )

    # int8 mask the blocked kernel streams every step — a runtime operand
    # committed to the mesh, not an HLO literal (see make_sharded_run).
    fluid_dev = jax.device_put(
        (~np.asarray(obstacles, dtype=bool)).astype(np.int8),
        NamedSharding(mesh, P(AXIS, None)),
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, fluid: jax.Array):
        return sharded(f_global, fluid)

    def run(f_global: jax.Array):
        return run_base(f_global, fluid_dev)

    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, fluid_dev), (fluid_dev,)
    )
    return run


def make_sharded_fused_2d_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
    *,
    by: int | None = None,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]] | None:
    """Fused-Pallas 2-D (y, x) decomposition.

    The blocked ghost-roundtrip kernel is reused UNCHANGED on an x-padded
    local tile ``[9, nyl, W]`` with ``W = nxl + PAD`` (PAD = 128 lanes, so W
    stays lane-aligned).  The kernel's periodic lane rotate wraps over W,
    which makes exactly two pad lanes load-bearing: a pull with cx=+1 at
    lane 0 reads lane W-1, and a pull with cx=-1 at lane nxl-1 reads lane
    nxl.  Those two ghost lanes are refreshed every step from the x-ring
    neighbors' edge columns (one ``ppermute`` each way), so the local
    rotate produces globally correct streaming; the remaining pad lanes
    hold dead values that are masked out of collision and reduction (pad
    mask = obstacle) and are never read by any pull that lands in a real
    lane.

    Ordering per step:
    1. body force on the local kick row in jnp (gated to the last y-shard)
       BEFORE the exchanges, so exchanged columns carry post-kick values —
       same ordering as the jnp 2-D path;
    2. y-phase: cross-device ghost-row slot patch (as in the 1-D fused
       path: slot 0 south / slot P-1 north ride the y ring);
    3. x-phase: edge columns with one-row y-extensions (taken from the
       *patched* ghost rows, which carries the corner cells) ride the x
       ring and are scattered into the ghost lanes of the center tile and
       of every ghost-row slot.

    Note on the "never re-gather halos from f" invariant (CLAUDE.md): it
    applies to the Y halos, which this path still carries through the
    ghost-roundtrip slots.  The X ghost *columns* are necessarily gathered
    from ``f`` each step — they must cross devices, so they have to be
    materialized as a ``ppermute`` operand either way; emitting them as
    extra kernel outputs would require 1-lane output blocks (below the
    128-lane tiling minimum) or 128x over-wide edge blocks.  The gather is
    two columns + six 1-lane scatters per step (O(nyl) cells vs the
    kernel's O(nyl·nxl)); this path cannot be perf-validated on the
    single-chip environment regardless, so correctness (equality tests)
    is the bar it is held to.

    Returns None when the padded local tile admits no valid row-block
    split (caller falls back to the jnp 2-D path).
    """
    from lbm_tpu.ops.fused import build_blocked_kernel, choose_block_rows

    if max_iters is None:
        max_iters = params.max_iters
    py, px = mesh.shape[AXIS], mesh.shape[AXIS_X]
    ny, nx = params.ny, params.nx
    if ny % py != 0 or nx % px != 0:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    nyl, nxl = ny // py, nx // px
    if nyl < 3 or nxl < 2:
        raise ValueError(
            f"tiles too thin: {nyl}x{nxl} (need >=3 rows, >=2 cols)"
        )
    pad = 128
    w = nxl + pad
    if by is None:
        by = choose_block_rows(nyl, w)
    if by is None:
        return None
    if nyl % by != 0 or by < 3:
        raise ValueError(f"invalid row block BY={by} for local slab {nyl}")
    p_loc = nyl // by
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    omega = float(np.float32(params.omega))
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)
    # Padded global mask [ny, px*W]: per x-shard block = [fluid, 0-pad],
    # so the (AXIS, AXIS_X) sharding hands each shard its [nyl, W] tile.
    # int8: the blocked kernel streams the mask every step (see fused.py).
    fluid_pad_host = np.concatenate(
        [
            np.concatenate(
                [
                    fluid_host[:, i * nxl : (i + 1) * nxl],
                    np.zeros((ny, pad), np.int8),
                ],
                axis=1,
            )
            for i in range(px)
        ],
        axis=1,
    )
    call = build_blocked_kernel(
        nyl,
        w,
        by,
        omega,
        float(w1),
        float(w2),
        dynamic_accel_gate=True,
        interpret=interpret,
    )
    ring_y_dn, ring_y_up = _rings(py)
    ring_x_dn, ring_x_up = _rings(px)
    south_rows, north_rows = _ghost_seed_rows(nyl, by, 1)
    # Row r of the local slab sits at index r+1 of the exchanged
    # [-1 .. nyl] column strip.  Ghost-slot i holds local row i*by-1
    # (slot 0 = row -1 = strip index 0: the cross-device row — no modulo
    # wrap here, unlike the in-slab south_rows/north_rows init indices)
    # resp. (i+1)*by (last slot = row nyl = strip index nyl+1).
    slot_s = np.array([i * by for i in range(p_loc)], np.int32)
    slot_n = np.array([(i + 1) * by + 1 for i in range(p_loc)], np.int32)
    zero_gate = np.zeros((1, 1), np.int32)  # in-kernel kick stays off

    def local_run(f_loc: jax.Array, fluid_loc: jax.Array):
        yshard = jax.lax.axis_index(AXIS)
        # The kick row ny-2 is local row nyl-2 of the last y-shard (every
        # x-shard along it kicks its own lanes).
        kick_gate = (yshard == py - 1).astype(jnp.float32)
        fluid_b = fluid_loc != 0

        def kick(f):
            r = f[:, nyl - 2, :]  # [9, W] static row slice
            ok = (
                fluid_b[nyl - 2, :]
                & (r[3] - w1 > 0.0)
                & (r[6] - w2 > 0.0)
                & (r[7] - w2 > 0.0)
            )
            okf = jnp.where(ok, jnp.float32(1.0), jnp.float32(0.0)) * kick_gate
            r2 = jnp.stack(
                [
                    r[k] if kick_scale(k, w1, w2) is None
                    else r[k] + okf * kick_scale(k, w1, w2)
                    for k in range(9)
                ]
            )
            return jax.lax.dynamic_update_slice(f, r2[:, None, :], (0, nyl - 2, 0))

        def patch_x(f, gs, gn):
            # Edge columns with one-row extensions: rows [-1 .. nyl].
            def strip(col):
                return jnp.concatenate(
                    [
                        gs[0, :, col : col + 1],  # row -1 (post y-patch)
                        f[:, :, col],  # rows 0..nyl-1
                        gn[p_loc - 1, :, col : col + 1],  # row nyl
                    ],
                    axis=1,
                )  # [9, nyl+2]

            send_e, send_w = strip(nxl - 1), strip(0)
            if px == 1:
                recv_w, recv_e = send_e, send_w  # self-wrap
            else:
                recv_w = jax.lax.ppermute(send_e, AXIS_X, ring_x_dn)
                recv_e = jax.lax.ppermute(send_w, AXIS_X, ring_x_up)
            # Scatter into the two ghost lanes of the center tile ...
            f = f.at[:, :, w - 1].set(recv_w[:, 1 : nyl + 1])
            f = f.at[:, :, nxl].set(recv_e[:, 1 : nyl + 1])
            # ... and of every ghost-row slot (slot i = one specific row).
            gs = gs.at[:, :, w - 1].set(jnp.transpose(recv_w[:, slot_s]))
            gs = gs.at[:, :, nxl].set(jnp.transpose(recv_e[:, slot_s]))
            gn = gn.at[:, :, w - 1].set(jnp.transpose(recv_w[:, slot_n]))
            gn = gn.at[:, :, nxl].set(jnp.transpose(recv_e[:, slot_n]))
            return f, gs, gn

        def body(carry, _):
            f, gs, gn = carry
            f = kick(f)
            gs, gn = _patch_ghost_slots(gs, gn, AXIS, py, ring_y_dn, ring_y_up)
            f, gs, gn = patch_x(f, gs, gn)
            f2, gs2, gn2, tot = call(
                f, gs, gn, fluid_loc, jnp.asarray(zero_gate)
            )
            av = jax.lax.psum(tot[0, 0] * fcinv, (AXIS, AXIS_X))
            return (f2, gs2, gn2), av

        f_pad = jnp.concatenate(
            [f_loc, jnp.zeros((NSPEEDS, nyl, pad), jnp.float32)], axis=2
        )
        gs0 = jnp.transpose(f_pad[:, south_rows[:, 0], :], (1, 0, 2))
        gn0 = jnp.transpose(f_pad[:, north_rows[:, 0], :], (1, 0, 2))
        (f_fin, _, _), avs = jax.lax.scan(
            body, (f_pad, gs0, gn0), None, length=max_iters
        )
        return f_fin[:, :, :nxl], avs

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, AXIS_X), P(AXIS, AXIS_X)),
        out_specs=(P(None, AXIS, AXIS_X), P()),
        check_vma=False,
    )

    # Padded int8 mask as a runtime operand committed to the mesh, not an
    # HLO literal (see make_sharded_run).
    fluid_dev = jax.device_put(
        fluid_pad_host, NamedSharding(mesh, P(AXIS, AXIS_X))
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, fluid: jax.Array):
        return sharded(f_global, fluid)

    def run(f_global: jax.Array):
        return run_base(f_global, fluid_dev)

    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, fluid_dev), (fluid_dev,)
    )
    return run


def make_sharded_temporal_2d_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
    *,
    by: int | None = None,
    ksteps: int | None = None,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]] | None:
    """Temporal blocking on a 2-D (rows x cols) mesh: K timesteps per
    kernel launch with BOTH exchanges amortized — K-row ghost slabs over
    the y ring and K-lane ghost columns over the x ring, every K steps.

    The temporal kernel is reused UNCHANGED (as the blocked kernel is in
    :func:`make_sharded_fused_2d_run`) on an x-padded local tile
    ``[9, nyl, W]``, ``W = nxl + 128``: the K-wide x halos live at lanes
    ``[nxl, nxl+K)`` (east neighbor's first K columns) and ``[W-K, W)``
    (west neighbor's last K), so the kernel's periodic lane rotate over W
    reads globally-correct values at both tile edges.  Trapezoidal
    containment holds in x exactly as it does in y: garbage from the dead
    pad lanes advances one lane per internal step, and a K-wide halo
    keeps the owned lanes ``[0, nxl)`` valid for all K steps.  Three
    consequences the 1-D path doesn't have:

    * the extended masks carry the NEIGHBOR's fluid mask in the halo
      lanes (a halo copy must collide/kick exactly like its owner — with
      a zero mask it would bounce and diverge from the neighbor's
      evolution by internal step 2);
    * the kernel's av reduction is bounded to the owned lanes
      (``av_lanes=nxl``) or halo cells would be double-counted;
    * the x strips exchanged every K steps are ``[9, nyl+2K, K]`` — they
      include the post-y-patch ghost-slab rows, which carries the corner
      cells the diagonal speeds need (two-phase exchange, as in the 2-D
      fused path), and they also refresh the halo lanes of every ghost
      slab slot.

    Returns None when the local tile admits no valid (BY, K) split.
    Per-step ICI bytes match per-step exchange; message count drops K×.
    Real-hardware lane alignment wants ``nxl % 128 == 0`` (as for the 2-D
    fused path); correctness is mesh-equality-tested in interpret mode.
    """
    from lbm_tpu.ops.fused import build_temporal_kernel, choose_temporal

    if max_iters is None:
        max_iters = params.max_iters
    py, px = mesh.shape[AXIS], mesh.shape[AXIS_X]
    ny, nx = params.ny, params.nx
    if ny % py != 0 or nx % px != 0:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    nyl, nxl = ny // py, nx // px
    pad = 128
    w = nxl + pad
    if by is None or ksteps is None:
        kind = mesh.devices.flat[0].device_kind
        if px == 1:
            # Degenerate x axis: the full width is local, so the slab can
            # take the x-tiled local schedule when the unified chooser
            # picks strips (giant widths — VERDICT r3 missing 2).  A mesh
            # with real x sharding already divides nx and keeps the
            # row-blocked padded tile below.
            from lbm_tpu.ops.fused import choose_schedule

            if not interpret:
                from lbm_tpu import tuning

                tuning.maybe_autotune_slab(
                    nyl, nx, kind, schedules=("row", "xtiled")
                )
            picked = choose_schedule(nyl, nx, max_iters, device_kind=kind)
            if picked is not None and picked[2] > 1:
                return make_sharded_temporal_xt_run(
                    params,
                    obstacles,
                    free_cells_inv,
                    mesh,
                    max_iters,
                    by=picked[0],
                    ksteps=picked[1],
                    px=picked[2],
                    interpret=interpret,
                )
            if picked is not None and picked[2] == 1:
                # The route decision just ranked row vs x-tiled at the TRUE
                # slab width; a row winner transfers to the padded tile
                # (3% wider — same ranking) whenever its window still fits
                # the W-width VMEM budget.  Re-sweeping at (nyl, W) would
                # double the sweep minutes for measurements the route
                # decision already paid for.  Exception: a MEASURED cache
                # entry for the exact padded shape (nyl, W) — e.g. from an
                # LBM_AUTOTUNE_ON_MISS run that swept the padded tile
                # directly — outranks the transferred pick: fall through so
                # choose_temporal consults it (round-4 advisor finding).
                from lbm_tpu import tuning
                from lbm_tpu.ops.fused import (
                    _structurally_valid,
                    _temporal_tuning,
                )

                _, window_budget, _ = _temporal_tuning(w)
                padded_measured = any(
                    e_px == 1
                    and _structurally_valid(nyl, e_by, e_k, max_iters)
                    for e_by, e_k, e_px in tuning.lookup(kind, nyl, w)
                )
                if (
                    not padded_measured
                    and (picked[0] + 2 * picked[1]) * w <= window_budget
                ):
                    by, ksteps = picked[0], picked[1]
        if by is None or ksteps is None:
            if not interpret:
                # Opt-in (LBM_AUTOTUNE_ON_MISS=1): measure the local slab
                # shape on first compile instead of trusting the heuristic.
                from lbm_tpu import tuning

                tuning.maybe_autotune_slab(nyl, w, kind)
            picked = choose_temporal(nyl, w, max_iters, device_kind=kind)
            if picked is None:
                return None
            by, ksteps = picked
    if nyl % by != 0:
        raise ValueError(f"BY={by} does not divide local slab nyl={nyl}")
    if nyl // by < 2:
        raise ValueError("temporal blocking needs >= 2 row blocks per shard")
    if max_iters % ksteps != 0 or not 2 <= ksteps <= by - 2:
        raise ValueError(
            f"need K | max_iters and 2 <= K <= BY-2 (K={ksteps}, BY={by}, "
            f"max_iters={max_iters})"
        )
    if not interpret and by % 8 != 0:
        raise ValueError(
            f"BY={by}: Pallas row blocks must be divisible by 8 to lower "
            "on TPU (use interpret=True for sub-8 test blocks)"
        )
    if 2 * ksteps > pad or ksteps > nxl:
        raise ValueError(
            f"K={ksteps} x halos don't fit (need 2K <= {pad} and K <= "
            f"nxl={nxl})"
        )
    p_loc = nyl // by
    byext = by + 2 * ksteps
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    omega = float(np.float32(params.omega))
    # int8 mask: the temporal kernel widens before comparing (4x less
    # HBM traffic for the static operand streamed every pass).
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)

    # Per-(y-shard, x-shard, program) extended masks [byext, W]: owned
    # columns in lanes [0, nxl), neighbor columns in the two K-wide halo
    # lane bands, zeros in the dead pad (band layout shared with the
    # single-chip x-tiled factory via fused.fill_xt_mask_window).
    # Sharded (AXIS, AXIS_X) on the leading dims.
    from lbm_tpu.ops.fused import fill_xt_mask_window

    maskext_host = np.zeros((py * p_loc, px, byext, w), np.int8)
    for d in range(py):
        for i in range(p_loc):
            rows = (
                np.arange(d * nyl + i * by - ksteps,
                          d * nyl + i * by + by + ksteps) % ny
            )
            for sx in range(px):
                fill_xt_mask_window(
                    maskext_host[d * p_loc + i, sx], fluid_host[rows],
                    sx, nxl, nx, w, ksteps,
                )

    call = build_temporal_kernel(
        nyl,
        w,
        by,
        ksteps,
        omega,
        float(w1),
        float(w2),
        interpret=interpret,
        av_lanes=nxl,
    )
    ring_y_dn, ring_y_up = _rings(py)
    ring_x_dn, ring_x_up = _rings(px)
    south_rows, north_rows = _ghost_seed_rows(nyl, by, ksteps)
    # Ghost-slab rows as indices into the [-K, nyl+K) exchange strip
    # (strip row = local row + K): gs[i] holds local rows i*BY-K..i*BY-1,
    # gn[i] holds (i+1)*BY..(i+1)*BY+K-1.  No modulo: slot 0 / slot
    # p_loc-1 hold the CROSS-DEVICE rows (-K.. / nyl..), which the strip
    # covers via the post-y-patch slab rows.
    strip_rows_s = np.stack(
        [i * by + np.arange(ksteps) for i in range(p_loc)]
    )  # [p_loc, K]
    strip_rows_n = np.stack(
        [(i + 1) * by + ksteps + np.arange(ksteps) for i in range(p_loc)]
    )

    def local_run(f_loc: jax.Array, maskext_loc: jax.Array):
        yshard = jax.lax.axis_index(AXIS)
        gates = jnp.stack(
            [
                (yshard == py - 1).astype(jnp.int32),
                (yshard == 0).astype(jnp.int32),
            ]
        ).reshape(1, 2)
        mask_loc = maskext_loc[:, 0]  # [p_loc, byext, W]

        def patch_x(f, gs, gn):
            def strip(lo):  # edge lanes [lo, lo+K) with K-row extensions
                return jnp.concatenate(
                    [
                        jnp.transpose(
                            gs[0][:, :, lo : lo + ksteps], (1, 0, 2)
                        ),  # local rows -K..-1 (post y-patch: cross-device)
                        f[:, :, lo : lo + ksteps],  # rows 0..nyl-1
                        jnp.transpose(
                            gn[p_loc - 1][:, :, lo : lo + ksteps], (1, 0, 2)
                        ),  # rows nyl..nyl+K-1
                    ],
                    axis=1,
                )  # [9, nyl+2K, K]

            send_e, send_w = strip(nxl - ksteps), strip(0)
            if px == 1:
                recv_w, recv_e = send_e, send_w  # self-wrap
            else:
                recv_w = jax.lax.ppermute(send_e, AXIS_X, ring_x_dn)
                recv_e = jax.lax.ppermute(send_w, AXIS_X, ring_x_up)
            # Center tile halo lanes (rows 0..nyl-1) ...
            f = f.at[:, :, w - ksteps :].set(recv_w[:, ksteps : ksteps + nyl])
            f = f.at[:, :, nxl : nxl + ksteps].set(
                recv_e[:, ksteps : ksteps + nyl]
            )

            # ... and every ghost slab's halo lanes (slot rows gathered
            # from the strips; [9, p_loc, K, K] -> [p_loc, K, 9, K]).
            def slab_rows(recv, rows):
                return jnp.transpose(recv[:, rows, :], (1, 2, 0, 3))

            gs = gs.at[:, :, :, w - ksteps :].set(
                slab_rows(recv_w, strip_rows_s)
            )
            gs = gs.at[:, :, :, nxl : nxl + ksteps].set(
                slab_rows(recv_e, strip_rows_s)
            )
            gn = gn.at[:, :, :, w - ksteps :].set(
                slab_rows(recv_w, strip_rows_n)
            )
            gn = gn.at[:, :, :, nxl : nxl + ksteps].set(
                slab_rows(recv_e, strip_rows_n)
            )
            return f, gs, gn

        def body(carry, _):
            f, gs, gn = carry
            gs, gn = _patch_ghost_slots(gs, gn, AXIS, py, ring_y_dn, ring_y_up)
            f, gs, gn = patch_x(f, gs, gn)
            f2, gs2, gn2, avs = call(f, gs, gn, mask_loc, gates)
            av = jax.lax.psum(avs[:, 0] * fcinv, (AXIS, AXIS_X))
            return (f2, gs2, gn2), av

        f_pad = jnp.concatenate(
            [f_loc, jnp.zeros((NSPEEDS, nyl, pad), jnp.float32)], axis=2
        )
        gs0 = jnp.stack(
            [jnp.transpose(f_pad[:, rows, :], (1, 0, 2)) for rows in south_rows]
        )
        gn0 = jnp.stack(
            [jnp.transpose(f_pad[:, rows, :], (1, 0, 2)) for rows in north_rows]
        )
        (f_fin, _, _), avs = jax.lax.scan(
            body, (f_pad, gs0, gn0), None, length=max_iters // ksteps
        )
        return f_fin[:, :, :nxl], avs.reshape(max_iters)

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, AXIS_X), P(AXIS, AXIS_X, None, None)),
        out_specs=(P(None, AXIS, AXIS_X), P()),
        check_vma=False,
    )

    # Runtime-argument mask, as in the 1-D factory (no giant HLO literal).
    maskext_dev = jax.device_put(
        maskext_host, NamedSharding(mesh, P(AXIS, AXIS_X, None, None))
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, maskext: jax.Array):
        return sharded(f_global, maskext)

    def run(f_global: jax.Array):
        return run_base(f_global, maskext_dev)

    run.chunk = ksteps
    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, maskext_dev), (maskext_dev,)
    )
    return run


def make_sharded_temporal_xt_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
    *,
    by: int,
    ksteps: int,
    px: int,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]:
    """X-TILED temporal blocking composed with row sharding: each shard
    runs the single-chip x-tiled schedule (``px`` local column strips,
    K steps per pass — ``ops/fused.py::build_temporal_xtiled_kernel``) on
    its slab, and only the K-row ghost SLABS cross devices (one
    ``ppermute`` each way every K steps, exactly as in
    :func:`make_sharded_temporal_run`).

    Why it exists (VERDICT r3 missing 2): a giant-width local slab
    (per-shard nx >= 8192) caps the row-only window at BY=32 and pays the
    25% halo-recompute cliff the single chip fixed with x-tiling
    (13.9 -> 20.7 GLUPS at 8192², docs/PERF.md round-3); this factory
    routes the same fix through the sharded path.

    Composition notes:

    * x never crosses devices here — the strip ring (periodic wrap in x)
      is local to the shard, so the kernel's carried XE/XW edge columns
      and cross-strip ghost-slab corner reads work UNCHANGED; only the y
      ghost slabs need the cross-device slot patch (slot (s, 0) south /
      slot (s, P-1) north for every strip s ride the y ring).
    * body-force gating: global row ny-2 is the last y-shard's local row
      ny_loc-2 (interior kick site, every strip kicks its own lanes) and
      wraps into shard 0's south halo (wrap site) — the same two gated
      sites as the 1-D temporal kernel, passed via the kernel's gates
      operand.
    * works on a 1-D mesh or a 2-D mesh whose x axis has size 1 (the
      (Py, 1) / (1, 1) shapes — a 2-D mesh with real x sharding already
      has its width divided by the mesh and keeps the row-blocked local
      kernel).

    The extended masks carry GLOBAL rows (the ±K window rows of shard
    boundaries hold the neighbor shard's mask) and the x-neighbor strips'
    columns in the halo lane bands (``fill_xt_mask_window``).
    """
    from lbm_tpu.ops.fused import (
        _XT_PAD,
        build_temporal_xtiled_kernel,
        fill_xt_mask_window,
    )

    if max_iters is None:
        max_iters = params.max_iters
    n_shards = mesh.shape[AXIS]
    xaxis = AXIS_X if AXIS_X in mesh.shape else None
    if xaxis is not None and mesh.shape[AXIS_X] != 1:
        raise ValueError(
            "the x-tiled sharded schedule needs a 1-D mesh or a 2-D mesh "
            f"with one x shard (got {mesh.shape[AXIS_X]} x shards); a "
            "wider x mesh already divides nx and keeps row blocking"
        )
    ny, nx = params.ny, params.nx
    if ny % n_shards != 0:
        raise ValueError(f"ny={ny} not divisible by mesh size {n_shards}")
    ny_loc = ny // n_shards
    if max_iters % ksteps != 0:
        raise ValueError(
            f"need K | max_iters (K={ksteps}, max_iters={max_iters})"
        )
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    # Validates BY/K/Px structurally (clear ValueErrors) and builds the
    # pallas_call on the LOCAL slab dims.
    call = build_temporal_xtiled_kernel(
        ny_loc,
        nx,
        by,
        ksteps,
        px,
        float(np.float32(params.omega)),
        float(w1),
        float(w2),
        interpret=interpret,
    )
    bx = nx // px
    w = bx + _XT_PAD
    p_loc = ny_loc // by
    byext = by + 2 * ksteps
    edge = _XT_PAD if bx >= _XT_PAD else bx
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)
    # Global per-(shard, strip, block) extended masks, sharded on dim 0
    # (d-major ordering matches the contiguous P(AXIS) slab each device
    # gets); window rows are GLOBAL (cross-shard halo rows carry the
    # neighbor's mask), halo lanes the x-neighbor strip's columns.
    maskext_host = np.zeros((n_shards * px * p_loc, byext, w), np.int8)
    for d in range(n_shards):
        for s in range(px):
            for i in range(p_loc):
                rows = (
                    np.arange(
                        d * ny_loc + i * by - ksteps,
                        d * ny_loc + i * by + by + ksteps,
                    )
                    % ny
                )
                fill_xt_mask_window(
                    maskext_host[(d * px + s) * p_loc + i],
                    fluid_host[rows],
                    s,
                    bx,
                    nx,
                    w,
                    ksteps,
                )
    down, up = _rings(n_shards)
    south_rows, north_rows = _ghost_seed_rows(ny_loc, by, ksteps)
    psum_axes = (AXIS, AXIS_X) if xaxis is not None else AXIS

    def local_run(f_loc: jax.Array, maskext_loc: jax.Array):
        shard = jax.lax.axis_index(AXIS)
        gates = jnp.stack(
            [
                (shard == n_shards - 1).astype(jnp.int32),
                (shard == 0).astype(jnp.int32),
            ]
        ).reshape(1, 2)

        def patch(gs, gn):
            # Same slot algebra as _patch_ghost_slots, strip axis leading:
            # after a pass slot (s, 0) holds the shard's OWN last K rows
            # of strip s, slot (s, P-1) its own first K — one ppermute
            # each way swaps them for the true cross-device rows.
            if n_shards == 1:
                return gs, gn
            recv_s = jax.lax.ppermute(gs[:, 0], AXIS, down)
            recv_n = jax.lax.ppermute(gn[:, p_loc - 1], AXIS, up)
            gs = jnp.concatenate([recv_s[:, None], gs[:, 1:]], axis=1)
            gn = jnp.concatenate([gn[:, : p_loc - 1], recv_n[:, None]], axis=1)
            return gs, gn

        def body(carry, _):
            fs, gs, gn, xe, xw = carry
            gs, gn = patch(gs, gn)
            fs2, gs2, gn2, xe2, xw2, avs = call(
                fs, gs, gn, xe, xw, gs, gs, gn, gn, maskext_loc, gates
            )
            av = jax.lax.psum(avs[:, 0] * fcinv, psum_axes)
            return (fs2, gs2, gn2, xe2, xw2), av

        # Strip-major relayout + lane pad, once per run (inverse at the
        # end) — the per-pass state stays in the kernel's carried layout.
        fs = jnp.transpose(
            f_loc.reshape(NSPEEDS, ny_loc, px, bx), (2, 0, 1, 3)
        )
        fs = jnp.concatenate(
            [fs, jnp.zeros((px, NSPEEDS, ny_loc, _XT_PAD), jnp.float32)],
            axis=3,
        )
        # Ghost seeds wrap mod ny_loc; the cross-device slots are patched
        # before the first kernel pass (as in the row-blocked factory).
        gs0 = jnp.stack(
            [
                jnp.transpose(fs[:, :, rows, :], (0, 2, 1, 3))
                for rows in south_rows
            ],
            axis=1,
        )
        gn0 = jnp.stack(
            [
                jnp.transpose(fs[:, :, rows, :], (0, 2, 1, 3))
                for rows in north_rows
            ],
            axis=1,
        )
        # x edge columns: local strip ring (x never crosses devices).
        xe0 = jnp.roll(fs[:, :, :, bx - edge : bx], 1, axis=0)
        xw0 = jnp.roll(fs[:, :, :, :edge], -1, axis=0)
        (fs_fin, *_), avs = jax.lax.scan(
            body, (fs, gs0, gn0, xe0, xw0), None, length=max_iters // ksteps
        )
        f_out = jnp.transpose(fs_fin[:, :, :, :bx], (1, 2, 0, 3)).reshape(
            NSPEEDS, ny_loc, nx
        )
        return f_out, avs.reshape(max_iters)

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, xaxis), P(AXIS, None, None)),
        out_specs=(P(None, AXIS, xaxis), P()),
        check_vma=False,
    )

    # The extended mask enters as a runtime ARGUMENT (committed to the
    # mesh here), never an HLO literal — see _LoweredWithConsts.
    maskext_dev = jax.device_put(
        maskext_host, NamedSharding(mesh, P(AXIS, None, None))
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, maskext: jax.Array):
        return sharded(f_global, maskext)

    def run(f_global: jax.Array):
        return run_base(f_global, maskext_dev)

    run.chunk = ksteps
    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, maskext_dev), (maskext_dev,)
    )
    return run


def make_sharded_temporal_run(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    mesh: Mesh,
    max_iters: int | None = None,
    *,
    by: int | None = None,
    ksteps: int | None = None,
    px: int | None = None,
    interpret: bool = False,
) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]] | None:
    """Temporal blocking composed with row sharding: each shard advances K
    timesteps per kernel launch, and the cross-shard ghost exchange moves
    one K-row slab each way every K steps — the same ICI byte volume as
    per-step exchange, with K× fewer messages (latency amortized).

    The local schedule comes from ``choose_schedule`` on the slab shape:
    giant-width slabs (per-shard nx >= 8192) route to the x-tiled local
    kernel (:func:`make_sharded_temporal_xt_run` — Px > 1), everything
    else to the row-blocked kernel; an explicit ``(by, ksteps[, px])``
    pins the choice.  Returns None when the local slab admits no valid
    split.  Body-force sites: global row ny-2 sits in the last shard's
    interior window and (via periodic wrap) in shard 0's south halo; each
    shard passes gates for the two in-kernel kick sites.  Containment
    needs K <= BY-2 <= ny_loc-2, which keeps the row out of every other
    shard's window (same algebra as the single-chip case with ny_loc in
    place of ny).
    """
    from lbm_tpu.ops.fused import build_temporal_kernel, choose_schedule

    if max_iters is None:
        max_iters = params.max_iters
    n_shards = mesh.shape[AXIS]
    ny, nx = params.ny, params.nx
    if ny % n_shards != 0:
        raise ValueError(f"ny={ny} not divisible by mesh size {n_shards}")
    ny_loc = ny // n_shards
    if by is None or ksteps is None:
        kind = mesh.devices.flat[0].device_kind
        if not interpret:
            # Opt-in (LBM_AUTOTUNE_ON_MISS=1): measure the local slab
            # shape on first compile instead of trusting the heuristic —
            # BOTH schedules, now that this factory consumes Px > 1.
            from lbm_tpu import tuning

            tuning.maybe_autotune_slab(
                ny_loc, nx, kind, schedules=("row", "xtiled")
            )
        picked = choose_schedule(ny_loc, nx, max_iters, device_kind=kind)
        if picked is None:
            return None  # no valid auto split; caller falls back
        by, ksteps, px = picked
    elif px is None:
        px = 1
    if px > 1:
        return make_sharded_temporal_xt_run(
            params,
            obstacles,
            free_cells_inv,
            mesh,
            max_iters,
            by=by,
            ksteps=ksteps,
            px=px,
            interpret=interpret,
        )
    # Explicitly-passed (by, ksteps) must be valid — a BY that doesn't
    # divide ny_loc would leave the trailing rows of the aliased output
    # silently un-advanced.
    if ny_loc % by != 0:
        raise ValueError(f"BY={by} does not divide local slab ny_loc={ny_loc}")
    if ny_loc // by < 2:
        # Same hard constraint as the 2-D factory and
        # build_temporal_program: the ghost-slot routing assumes a block
        # has a DISTINCT north and south neighbor within the shard.
        raise ValueError("temporal blocking needs >= 2 row blocks per shard")
    if max_iters % ksteps != 0 or not 2 <= ksteps <= by - 2:
        raise ValueError(
            f"need K | max_iters and 2 <= K <= BY-2 (K={ksteps}, BY={by}, "
            f"max_iters={max_iters})"
        )
    if not interpret and by % 8 != 0:
        # Same Mosaic row-tiling constraint as build_temporal_program:
        # catch it here with a clear error instead of a lowering failure.
        raise ValueError(
            f"BY={by}: Pallas row blocks must be divisible by 8 to lower "
            "on TPU (use interpret=True for sub-8 test blocks)"
        )
    p_loc = ny_loc // by
    w1, w2 = accel_weights(params)
    fcinv = np.float32(free_cells_inv)
    # int8 mask, widened in-kernel before comparing (4x less HBM traffic).
    fluid_host = (~np.asarray(obstacles, dtype=bool)).astype(np.int8)
    # Global per-(shard, program) extended masks, sharded on dim 0.
    maskext_host = np.stack(
        [
            fluid_host[
                np.arange(
                    d * ny_loc + i * by - ksteps,
                    d * ny_loc + i * by + by + ksteps,
                )
                % ny,
                :,
            ]
            for d in range(n_shards)
            for i in range(p_loc)
        ]
    )  # [n_shards * p_loc, by+2K, nx]
    call = build_temporal_kernel(
        ny_loc,
        nx,
        by,
        ksteps,
        float(np.float32(params.omega)),
        float(w1),
        float(w2),
        interpret=interpret,
    )
    down, up = _rings(n_shards)
    south_rows, north_rows = _ghost_seed_rows(ny_loc, by, ksteps)

    def local_run(f_loc: jax.Array, maskext_loc: jax.Array):
        shard = jax.lax.axis_index(AXIS)
        gates = jnp.stack(
            [
                (shard == n_shards - 1).astype(jnp.int32),
                (shard == 0).astype(jnp.int32),
            ]
        ).reshape(1, 2)

        def body(carry, _):
            f, gs, gn = carry
            gs, gn = _patch_ghost_slots(gs, gn, AXIS, n_shards, down, up)
            f2, gs2, gn2, avs = call(f, gs, gn, maskext_loc, gates)
            av = jax.lax.psum(avs[:, 0] * fcinv, AXIS)
            return (f2, gs2, gn2), av

        gs0 = jnp.stack(
            [jnp.transpose(f_loc[:, rows, :], (1, 0, 2)) for rows in south_rows]
        )
        gn0 = jnp.stack(
            [jnp.transpose(f_loc[:, rows, :], (1, 0, 2)) for rows in north_rows]
        )
        (f_fin, _, _), avs = jax.lax.scan(
            body, (f_loc, gs0, gn0), None, length=max_iters // ksteps
        )
        return f_fin, avs.reshape(max_iters)

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None, None)),
        out_specs=(P(None, AXIS, None), P()),
        check_vma=False,
    )

    # The extended mask enters as a runtime ARGUMENT (committed to the
    # mesh here), never an HLO literal — see _LoweredWithConsts.
    maskext_dev = jax.device_put(
        maskext_host, NamedSharding(mesh, P(AXIS, None, None))
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def run_base(f_global: jax.Array, maskext: jax.Array):
        return sharded(f_global, maskext)

    def run(f_global: jax.Array):
        return run_base(f_global, maskext_dev)

    # Timesteps advanced per kernel pass — read by ShardedSimulator.chunk()
    # for variant-aware bandwidth accounting.
    run.chunk = ksteps
    run.lower = lambda spec: _LoweredWithConsts(
        run_base.lower(spec, maskext_dev), (maskext_dev,)
    )
    return run


@dataclasses.dataclass
class ShardedRunResult(ResultMetrics):
    params: LBMParams
    f: np.ndarray | None
    av_vels: np.ndarray
    obstacles: np.ndarray
    free_cells_inv: float
    elapsed: float
    n_shards: int
    fields: np.ndarray | None = None  # [4, ny, nx] when readback="fields"
    steps_timed: int | None = None  # see RunResult.steps_timed
    steps_per_pass: int = 1


class ShardedSimulator:
    """Row-sharded multi-chip simulator (weak-scaling path, BASELINE.json
    4096x4096 / v5e-8 configuration)."""

    def __init__(
        self,
        params: LBMParams,
        obstacles: np.ndarray,
        mesh: Mesh | None = None,
        kernel: str = "auto",
        interpret: bool = False,
        temporal_split: tuple[int, int] | None = None,
    ) -> None:
        self.params = params
        self.obstacles = np.asarray(obstacles, dtype=bool)
        if self.obstacles.shape != (params.ny, params.nx):
            raise ValueError(
                f"obstacle mask {self.obstacles.shape} != grid "
                f"{(params.ny, params.nx)}"
            )
        self.mesh = mesh if mesh is not None else default_mesh()
        enable_compile_cache()
        if kernel == "auto":
            kernel = "fused" if jax.default_backend() == "tpu" else "reference"
        if kernel not in ("fused", "temporal", "reference"):
            raise ValueError(
                f"unknown sharded kernel {kernel!r}; choose auto | fused | "
                "temporal | reference (the 'mega' variant is single-chip "
                "only)"
            )
        self.free_cells = free_cells_of(self.obstacles)
        self.free_cells_inv = np.float32(1.0) / np.float32(self.free_cells)
        self.kernel = kernel
        self.interpret = interpret
        # Explicit temporal (BY, K) or x-tiled (BY, K, PX) override; None =
        # choose_schedule's measured-cache/heuristic pick on the local
        # slab.  Only the temporal factories consume it — reject
        # combinations that would silently drop an explicitly-requested
        # split.
        if temporal_split is not None and kernel not in ("fused", "temporal"):
            raise ValueError(
                f"temporal_split={temporal_split} requires kernel='fused' "
                f"or 'temporal', not {kernel!r} (on CPU, 'auto' resolves "
                "to 'reference' — pass kernel explicitly)"
            )
        if temporal_split is not None and len(temporal_split) not in (2, 3):
            raise ValueError(
                f"temporal_split must be (BY, K) or (BY, K, PX), got "
                f"{temporal_split!r}"
            )
        self.temporal_split = temporal_split
        self._compiled: dict[int, Callable] = {}
        self._chunks: dict[int, int] = {}
        self._variants: dict[int, str] = {}
        self._finalize = None
        self._init_compiled = None

    def compiled(self, max_iters: int | None = None):
        """AOT-compile (and cache) the sharded full-run program.

        Mirrors ``Simulator.compiled``: compilation happens here, outside
        the timed region, and a routed kernel variant that fails to
        compile on this device (e.g. a temporal window exceeding VMEM —
        the remote compile service surfaces that as a runtime error, or a
        Mosaic lowering rejection surfacing as ValueError; see
        ``runtime.COMPILE_FALLBACK_ERRORS``) falls back temporal -> fused
        -> jnp.  Factory-time validation errors (an explicitly-requested
        split that is structurally invalid) propagate instead of silently
        degrading.
        """
        if max_iters is None:
            max_iters = self.params.max_iters
        if max_iters not in self._compiled:
            # Fail with the precise divisibility error regardless of which
            # kernel variant would be routed to.
            n_y = self.mesh.shape[AXIS]
            if self.params.ny % n_y != 0:
                raise ValueError(
                    f"ny={self.params.ny} not divisible by mesh size {n_y}"
                )
            common = (
                self.params,
                self.obstacles,
                self.free_cells_inv,
                self.mesh,
                max_iters,
            )
            if AXIS_X in self.mesh.shape:
                # 2-D decomposition: the fused Pallas path (blocked kernel
                # on an x-padded tile, two-phase ghost exchange) when the
                # tile admits a row-block split, else the jnp step; an
                # explicit 'temporal' request gets the K-slab/K-column
                # variant (no silent fallback).
                in_spec = P(None, AXIS, AXIS_X)
                factories = []  # (thunk, variant_name)
                split = self.temporal_split or (None, None)
                if len(split) > 2:
                    # Explicit x-tiled split on a 2-D mesh: route straight
                    # to the x-tiled factory (it validates that the mesh's
                    # x axis is degenerate — strips are LOCAL x tiling).
                    def make_temporal_2d():
                        return make_sharded_temporal_xt_run(
                            *common,
                            by=split[0],
                            ksteps=split[1],
                            px=split[2],
                            interpret=self.interpret,
                        )
                else:
                    def make_temporal_2d():
                        return make_sharded_temporal_2d_run(
                            *common,
                            by=split[0],
                            ksteps=split[1],
                            interpret=self.interpret,
                        )
                if self.kernel == "temporal":
                    factories.append((make_temporal_2d, "temporal"))
                else:
                    if self.kernel == "fused":
                        if self.temporal_split is not None:
                            # An explicit split makes 'fused' prefer the
                            # temporal variant, mirroring the 1-D chain.
                            factories.append((make_temporal_2d, "temporal"))
                        factories.append(
                            (
                                lambda: make_sharded_fused_2d_run(
                                    *common, interpret=self.interpret
                                ),
                                "fused",
                            )
                        )
                    factories.append(
                        (lambda: make_sharded_2d_run(*common), "reference")
                    )
            else:
                in_spec = P(None, AXIS, None)
                split = self.temporal_split or (None, None)
                if self.kernel in ("fused", "temporal"):
                    factories = [
                        (
                            lambda: make_sharded_temporal_run(
                                *common,
                                by=split[0],
                                ksteps=split[1],
                                px=(split[2] if len(split) > 2 else None),
                                interpret=self.interpret,
                            ),
                            "temporal",
                        )
                    ]
                    if self.kernel == "fused":
                        factories.append(
                            (
                                lambda: make_sharded_fused_run(
                                    *common, interpret=self.interpret
                                ),
                                "fused",
                            )
                        )
                        factories.append(
                            (lambda: make_sharded_run(*common), "reference")
                        )
                else:
                    factories = [
                        (lambda: make_sharded_run(*common), "reference")
                    ]
            spec = jax.ShapeDtypeStruct(
                (NSPEEDS, self.params.ny, self.params.nx),
                jnp.float32,
                sharding=NamedSharding(self.mesh, in_spec),
            )
            exe = last_err = None
            for make, name in factories:
                run = make()  # None = this variant admits no valid split
                if run is None:
                    continue
                try:
                    exe = run.lower(spec).compile()
                except COMPILE_FALLBACK_ERRORS as e:
                    if name == "temporal" and self.temporal_split is not None:
                        # The explicitly-requested split built but failed
                        # to COMPILE; 'fused' routing falls back, but a
                        # silent drop of an explicit request is a trap.
                        import warnings

                        warnings.warn(
                            f"explicit temporal_split={self.temporal_split} "
                            f"failed to compile "
                            f"({str(e).splitlines()[0][:120]}); falling "
                            "back to the next kernel variant",
                            RuntimeWarning,
                            stacklevel=2,
                        )
                    last_err = e
                    continue
                # Timesteps per kernel pass, as reported by the factory
                # that actually built the program (temporal attaches
                # run.chunk); the compiled executable drops the attribute.
                self._chunks[max_iters] = getattr(run, "chunk", 1)
                self._variants[max_iters] = name
                break
            if exe is None:
                if last_err is not None:
                    raise last_err
                raise ValueError(
                    "no valid temporal (BY, K) split for this "
                    "grid/mesh/max_iters"
                )
            self._compiled[max_iters] = exe
        return self._compiled[max_iters]

    def chunk(self, max_iters: int | None = None) -> int:
        """Timesteps per kernel pass of the compiled program (K for the
        temporal sharded path, 1 otherwise)."""
        if max_iters is None:
            max_iters = self.params.max_iters
        return self._chunks.get(max_iters, 1)

    def variant(self, max_iters: int | None = None) -> str:
        """Which kernel variant the compile fallback chain actually landed
        on ('temporal' | 'fused' | 'reference') — may differ from
        ``self.kernel`` when a Pallas variant failed to compile."""
        if max_iters is None:
            max_iters = self.params.max_iters
        return self._variants.get(max_iters, self.kernel)

    def run(
        self,
        max_iters: int | None = None,
        readback: str = "state",
        f0: np.ndarray | None = None,
    ) -> ShardedRunResult:
        """``readback="fields"`` computes the compact
        ``[u_x, u_y, rho - density]`` float16 payload on the mesh
        (elementwise over the existing sharding — no resharding) and
        fetches those 3 half-precision planes instead of the 9 fp32
        f-planes (96 MB instead of 576 MB at 4096² over the host link);
        |u| and pressure are reconstructed on host in fp64 (encoding +
        error bounds: ``runtime.raw_fields_fn`` / ``expand_fields``)."""
        from lbm_tpu.runtime import check_readback, expand_fields, raw_fields_fn

        check_readback(readback)
        if max_iters is None:
            max_iters = self.params.max_iters
        fn = self.compiled(max_iters)
        if AXIS_X in self.mesh.shape:
            sharding = NamedSharding(self.mesh, P(None, AXIS, AXIS_X))
        else:
            sharding = NamedSharding(self.mesh, P(None, AXIS, None))
        finalize = None
        if readback == "fields":
            if self._finalize is None:
                # AOT-compile the field derivation outside the timed
                # region, like the step program itself; cached (the grid
                # and mesh are fixed per simulator).  The device emits the
                # compact float16 [u_x, u_y, rho - density] payload;
                # |u|/pressure are host
                # derived (see runtime.raw_fields_fn — 3 planes instead of
                # 4 over the slow device->host link).
                # The fluid mask is a runtime OPERAND (device-put onto the
                # mesh with f's spatial sharding), never a jit closure
                # constant — the embedded [ny, nx] literal blows the
                # remote compile service's request limit at giant grids
                # (HTTP 413; the mask-literal rule, CLAUDE.md).
                spec = jax.ShapeDtypeStruct(
                    (NSPEEDS, self.params.ny, self.params.nx),
                    jnp.float32,
                    sharding=sharding,
                )
                fluid_sharding = NamedSharding(
                    self.mesh, P(*sharding.spec[1:])
                )
                fluid_spec = jax.ShapeDtypeStruct(
                    (self.params.ny, self.params.nx),
                    jnp.bool_,
                    sharding=fluid_sharding,
                )
                exe = (
                    jax.jit(raw_fields_fn(self.params, self.obstacles))
                    .lower(spec, fluid_spec)
                    .compile()
                )
                fluid_dev = jax.device_put(
                    ~np.asarray(self.obstacles, dtype=bool), fluid_sharding
                )
                self._finalize = functools.partial(
                    (lambda _e, _m, f: _e(f, _m)), exe, fluid_dev
                )
            finalize = self._finalize
        if self._init_compiled is None:
            # On-device constant f0 (no host array, no upload), compiled
            # outside the timed region.
            self._init_compiled = (
                jax.jit(
                    functools.partial(init_cells, self.params),
                    out_shardings=sharding,
                )
                .lower()
                .compile()
            )

        tic = time.perf_counter()
        if f0 is None:
            f0 = self._init_compiled()
        elif isinstance(f0, jax.Array):
            # Already on device (checkpointed segments feed the previous
            # segment's sharded f straight back in) — re-lay it out on the
            # mesh without a host roundtrip.
            if f0.dtype != jnp.float32:
                f0 = f0.astype(jnp.float32)
            f0 = jax.device_put(f0, sharding)
        else:
            # Direct host->mesh upload: jnp.asarray first would
            # materialize the full global array on the DEFAULT device and
            # pay a device-to-device re-shard copy on top (f-sized:
            # 2.25 GiB at 8192^2 — exactly the resume-from-per-shard-
            # checkpoint sizes this path serves).  Same hazard/fix as
            # Simulator.run's from_f0 upload.
            f0 = jax.device_put(np.asarray(f0, np.float32), sharding)
        f_fin, av = fn(f0)
        if readback == "device":
            # f stays sharded on the mesh (checkpointed segments feed it
            # straight to the next segment / the per-shard snapshot
            # writer); av depends on every step, so fetching it is the
            # sync point.  av is fully replicated (out_specs P()) but on a
            # multi-process mesh it still SPANS non-addressable devices,
            # which jax refuses to fetch whole — read the local copy
            # (every process holds a complete one).  This is the readback
            # multi-host runs use (state/fields readbacks gather the
            # global f and are single-controller only).
            out_host = f_fin
            if av.is_fully_addressable:
                av_host = np.asarray(jax.device_get(av))
            else:
                av_host = np.asarray(av.addressable_shards[0].data)
        else:
            out_host, av_host = jax.device_get(
                (finalize(f_fin) if finalize else f_fin, av)
            )
            out_host, av_host = np.asarray(out_host), np.asarray(av_host)
        # Timer stops when the download drains; the host-side fp64 field
        # expansion is not device time (same contract as Simulator.run).
        toc = time.perf_counter()
        if readback == "fields":
            out_host = expand_fields(
                out_host, self.obstacles, self.params.density
            )
        return ShardedRunResult(
            params=dataclasses.replace(self.params, max_iters=max_iters),
            f=out_host if readback in ("state", "device") else None,
            fields=out_host if readback == "fields" else None,
            av_vels=av_host,
            obstacles=self.obstacles,
            free_cells_inv=float(self.free_cells_inv),
            elapsed=toc - tic,
            n_shards=self.mesh.shape[AXIS],
            steps_timed=max_iters,
            steps_per_pass=self.chunk(max_iters),
        )

    def run_checkpointed(
        self,
        checkpoint_dir: str,
        every: int,
        max_iters: int | None = None,
        resume: bool = True,
    ) -> ShardedRunResult:
        """Segmented sharded run with checkpoint/resume (same contract as
        ``Simulator.run_checkpointed``).  Snapshots are PER-SHARD
        (:func:`lbm_tpu.checkpoint.save_sharded`): each device's slab is
        written from ``addressable_shards`` without gathering the global
        array — at 8192² the gathered snapshot would be 2.4 GB through a
        ~30 MB/s host link; per-shard files also let every process of a
        multi-host mesh write only its local slabs.  f stays ON DEVICE
        between segments (``readback="device"``).  Resume reassembles the
        global array on host and re-shards, so a run can resume on a
        different mesh shape."""
        from lbm_tpu import checkpoint as ckpt
        from lbm_tpu.runtime import run_segments_checkpointed

        if max_iters is None:
            max_iters = self.params.max_iters
        f, av, elapsed, executed = run_segments_checkpointed(
            run_segment=lambda seg, f0: self.run(
                max_iters=seg, f0=f0, readback="device"
            ),
            precompile=self.compiled,
            params=self.params,
            obstacles=self.obstacles,
            checkpoint_dir=checkpoint_dir,
            every=every,
            max_iters=max_iters,
            resume=resume,
            save_fn=ckpt.save_sharded,
        )
        if f is None:
            return self.run(max_iters=0)
        if not isinstance(f, np.ndarray):
            # f is still sharded on the mesh, but the per-shard snapshot
            # committed just above holds exactly this state — reassemble
            # it from the LOCAL shard files instead of gathering the
            # global device array through the ~30 MB/s host link a second
            # time (the snapshot already pulled every slab once).
            f = ckpt.load(checkpoint_dir).f
        return ShardedRunResult(
            params=dataclasses.replace(self.params, max_iters=max_iters),
            f=np.asarray(f),
            av_vels=av,
            obstacles=self.obstacles,
            free_cells_inv=float(self.free_cells_inv),
            elapsed=elapsed,
            n_shards=self.mesh.shape[AXIS],
            steps_timed=executed,
            steps_per_pass=(
                self.chunk(min(every, executed)) if executed else 1
            ),
        )
