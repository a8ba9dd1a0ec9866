"""Host runtime: device selection, compilation cache, and the scan driver.

This is the TPU-native analog of the reference's host layer (C1 + C4):

* Device discovery/selection — env var ``LBM_DEVICE`` indexes
  ``jax.devices()``, mirroring ``OCL_DEVICE`` (``d2q9-bgk.c:885-944``).
* Per-grid kernel specialization — ``jax.jit`` retraces per (grid shape,
  params), the analog of rebuilding ``kernels.cl`` with ``-D`` constants
  (``d2q9-bgk.c:639-663``).
* The time loop — the reference enqueues ``maxIters`` asynchronous kernel
  launches and syncs once at the end (``d2q9-bgk.c:221-240``).  Here the
  *entire* loop is one compiled XLA program: ``lax.scan`` carries
  ``f[9, ny, nx]`` on-chip, accumulates the per-step average velocity into a
  device array, and the host touches data exactly twice (upload f0,
  download f_final + av_vels) — the same two-transfer contract.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu import diagnostics
from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import free_cells_of
from lbm_tpu.ops.reference import init_cells

StepFn = Callable[[jax.Array], tuple[jax.Array, jax.Array]]

# "state"  — fetch the 9 f-planes to host.
# "fields" — fetch the compact float16 [u_x, u_y, rho - density]
#            payload, reconstruct on host.
# "device" — return f as the (possibly sharded) on-device array, no fetch
#            (the checkpointed segment driver's mode: f never round-trips
#            the host link between segments; av_vels is still fetched, and
#            that fetch is the sync point the elapsed timer stops on).
READBACK_MODES = ("state", "fields", "device")

# Exception types that trigger the kernel-variant compile fallback chain
# (temporal -> fused -> jnp).  ``jax.errors.JaxRuntimeError`` IS the jaxlib
# XlaRuntimeError alias on current jaxlib (one class, both names); Mosaic
# lowering failures additionally surface as ValueError from the Pallas
# lowering pass.  The chains guard ONLY the lower()/compile() call with
# this tuple — factory/validation ValueErrors (bad kernel name, invalid
# explicit split) are raised outside it and propagate.
COMPILE_FALLBACK_ERRORS = (jax.errors.JaxRuntimeError, ValueError)

# Measured on the 16 GiB v5e (docs/PERF.md capacity-ceiling section): the
# state-readback program peaks at roughly 3x f's bytes — the x-tiled
# carry (~1.06x f with the lane pad), the un-tiled [9, ny, nx] output,
# and the un-tiling transpose temp coexist.  12288^2 (f = 5.06 GiB) was
# rejected at dispatch with a bare RESOURCE_EXHAUSTED while the fields
# readback — whose device-side payload is 3 fp16 planes derived without
# keeping a second full f — ran the same grid fine; 8192^2 (2.25 GiB)
# runs in state mode.  The budget is deliberately a little under the
# physical 16 GiB to leave room for scan bookkeeping and masks.
_STATE_READBACK_PEAK_FACTOR = 3.2
_HBM_BUDGET_GIB = 15.0


def hbm_budget_gib(device: jax.Device | None = None) -> float:
    """HBM budget for the state-readback predicate.  Precedence:
    ``LBM_HBM_GIB`` env override > the device's reported
    ``memory_stats()['bytes_limit']`` (scaled by the same 15/16 headroom
    as the default) > the v5e-measured default.  Both the axon tunnel
    and the CPU backend report no memory stats, so the default governs
    there; devices with more HBM that do report it get a correctly
    larger budget instead of a spurious giant-grid downgrade."""
    env = os.environ.get("LBM_HBM_GIB")
    if env:
        return float(env)
    try:
        stats = device.memory_stats() if device is not None else None
    except Exception:
        stats = None
    limit = (stats or {}).get("bytes_limit")
    if limit:
        return limit / 2**30 * (15.0 / 16.0)
    return _HBM_BUDGET_GIB


def state_readback_fits(
    ny: int, nx: int, budget_gib: float | None = None
) -> bool:
    """Whether the full-state readback program's peak HBM footprint is
    expected to fit (see the factor's derivation above).  Pass
    ``hbm_budget_gib(device)`` when a device is at hand; the bare
    default still honors the ``LBM_HBM_GIB`` override."""
    if budget_gib is None:
        budget_gib = hbm_budget_gib()
    f_gib = 9 * ny * nx * 4 / 2**30
    return _STATE_READBACK_PEAK_FACTOR * f_gib <= budget_gib


def raw_fields_fn(params: LBMParams, obstacles: np.ndarray):
    """Device-side ``f -> [u_x, u_y, rho - density]`` in float16 — the
    COMPACT fields-readback payload.

    The device->host link is the run's dominant fixed cost (measured
    ~30 MB/s + ~30 ms/fetch through the tunnel; the reference reads the
    full 9-plane fp32 cells buffer inside ITS timer, ``d2q9-bgk.c:252-261``),
    so the payload is compressed two ways:

    * |u| and pressure are derived on host (:func:`expand_fields`) — 3
      planes instead of 4;
    * the 3 planes travel as float16, halving the bytes again.  Precision:
      the checker protocol validates only the PRESSURE column of
      final_state (``check/check.py:66`` loads usecols [0, 1, 5]), and
      pressure = rho/3 with rho DELTA-encoded against the nominal density
      — the fp16 quantum of the small fluctuation field (|rho - density|
      ~1e-2) bounds the absolute rho error at ~3e-5 (~0.003% on pressure,
      ~300x inside the 1% tolerance, vs the fp32 engine's own ~0.2%
      drift).  u_x/u_y (written to final_state.dat but outside the checked
      protocol; visualization payload) carry <=0.1% relative error — far
      below plottable differences.  av_vels stays fp32 end-to-end.

    u is masked to 0 on obstacle cells on device (``d2q9-bgk.c:789-836``
    semantics).

    The returned function takes an optional ``fluid`` operand (bool
    [ny, nx]).  Jitted callers MUST pass it as a runtime argument — the
    embedded-closure default lowers the mask to an HLO ``dense<"0x...">``
    literal (~2 hex chars/element) and blows the remote compile service's
    request limit at giant grids (HTTP 413 at 8192², the same failure the
    step programs route around via ``StepProgram.consts``).  The default
    exists for eager/small ad-hoc use only."""
    density = float(np.float32(params.density))
    fluid_host = ~np.asarray(obstacles, dtype=bool)

    def fields(f, fluid=None):
        if fluid is None:
            fluid = jnp.asarray(fluid_host)
        rho = jnp.sum(f, axis=0)
        ux = jnp.where(fluid, (f[1] + f[5] + f[8] - f[3] - f[6] - f[7]) / rho, 0.0)
        uy = jnp.where(fluid, (f[2] + f[5] + f[6] - f[4] - f[7] - f[8]) / rho, 0.0)
        return jnp.stack([ux, uy, rho - density]).astype(jnp.float16)

    return fields


def expand_fields(
    raw: np.ndarray, obstacles: np.ndarray, density: float
) -> np.ndarray:
    """Host-side ``[u_x, u_y, rho - density] -> [u_x, u_y, |u|, pressure]``
    (the complete ``final_state.dat`` payload; obstacle cells get u = 0
    and pressure = density/3 per ``d2q9-bgk.c:789-836``).  Reconstruction
    runs in fp64 and rounds to fp32; see :func:`raw_fields_fn` for the
    float16 payload encoding and its error bounds."""
    fluid = ~np.asarray(obstacles, dtype=bool)
    ux = np.asarray(raw[0], dtype=np.float64)
    uy = np.asarray(raw[1], dtype=np.float64)
    rho = float(np.float32(density)) + np.asarray(raw[2], dtype=np.float64)
    speed = np.sqrt(ux * ux + uy * uy)
    pressure = np.where(fluid, rho / 3.0, density / 3.0)
    return np.stack([ux, uy, speed, pressure]).astype(np.float32)


def check_readback(readback: str) -> None:
    if readback not in READBACK_MODES:
        raise ValueError(
            f"readback must be one of {READBACK_MODES}, got {readback!r}"
        )


_COMPILE_CACHE_STATE: list[str | None] = []  # [dir-or-None] once set


def enable_compile_cache() -> str | None:
    """Point XLA's persistent compilation cache at a per-user directory
    (idempotent; returns the directory, or None when disabled).

    The reference JIT-builds ``kernels.cl`` on EVERY invocation
    (``clBuildProgram``, ``d2q9-bgk.c:639-663``); here a full-run
    executable costs 20-40 s through the remote compile service, but
    XLA's disk cache works across processes even on the tunneled
    backend — measured at 1024²: 24.4 s cold, 4.0 s in the next process
    (the residue is cache deserialization + transport).  Keyed by the
    computation fingerprint + jaxlib/platform, so it is always safe to
    leave on.

    ``LBM_COMPILE_CACHE`` overrides: a directory path, or ``0``/``off``
    to disable.  Default: ``~/.cache/lbm_tpu/xla``.  Only entries whose
    compile took >= 1 s are written (tiny test jits don't churn disk).
    """
    if _COMPILE_CACHE_STATE:
        return _COMPILE_CACHE_STATE[0]
    existing = jax.config.jax_compilation_cache_dir
    if existing:
        # The embedding application already configured XLA's cache —
        # never re-point it out from under them.
        _COMPILE_CACHE_STATE.append(existing)
        return existing
    spec = os.environ.get("LBM_COMPILE_CACHE", "")
    if spec.lower() in ("0", "off", "none", "disable", "disabled"):
        _COMPILE_CACHE_STATE.append(None)
        return None
    path = spec or os.path.join(
        os.path.expanduser("~"), ".cache", "lbm_tpu", "xla"
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Single-frame MLIR locations: the full-traceback default embeds the
    # CALLER's Python stack in the serialized Mosaic kernel, so the same
    # program reached through different call paths (CLI vs library)
    # hashes to different cache keys — measured as a one-varint location
    # diff deep in the kernel bytecode producing a spurious miss.  The
    # op's own source line survives; only the caller frames are dropped.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    _COMPILE_CACHE_STATE.append(path)
    return path


def select_device(spec: str | int | None = None) -> jax.Device:
    """Pick the compute device (``LBM_DEVICE`` env analog of OCL_DEVICE)."""
    if spec is None:
        spec = os.environ.get("LBM_DEVICE", "")
    devices = jax.devices()
    if spec == "" or spec is None:
        return devices[0]
    idx = int(spec)
    if not 0 <= idx < len(devices):
        raise ValueError(
            f"LBM_DEVICE={idx} out of range; {len(devices)} device(s): {devices}"
        )
    return devices[idx]


def make_program(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    kernel: str = "auto",
    max_iters: int | None = None,
    device_kind: str | None = None,
):
    """Step-program factory.
    ``kernel``: 'auto' | 'fused' | 'mega' | 'reference'.

    Returns a :class:`lbm_tpu.ops.fused.StepProgram` whose scan carry may
    hold extra state (e.g. the fused kernel's ghost-row buffers) and whose
    ``chunk`` may exceed 1 (multi-step kernels; requires ``max_iters``).
    'mega' selects the manual-DMA megakernel (T temporal passes per
    pallas_call; measures within ~8% of the temporal schedule — see
    docs/PERF.md) and falls back to 'fused' when the grid admits no
    (BY, K, T) split.
    """
    from lbm_tpu.ops.fused import make_fused_program

    if kernel == "auto":
        kernel = "fused" if jax.default_backend() == "tpu" else "reference"
    if kernel == "temporal":
        # Single-chip alias: the fused path auto-selects the temporal
        # variant when the grid admits one (the explicit name exists for
        # the sharded API, where it forces K-slab exchange).
        kernel = "fused"
    if kernel == "mega":
        from lbm_tpu.ops.fused import build_mega_program, choose_temporal

        if max_iters is not None:
            picked = choose_temporal(
                params.ny, params.nx, max_iters, device_kind=device_kind
            )
            if picked is not None:
                by, ksteps = picked
                tpasses = next(
                    (
                        t
                        for t in range(25, 0, -1)
                        if max_iters % (t * ksteps) == 0
                    ),
                    None,
                )
                if tpasses is not None:
                    return build_mega_program(
                        params,
                        obstacles,
                        free_cells_inv,
                        by,
                        ksteps,
                        tpasses,
                    )
        kernel = "fused"
    if kernel == "fused":
        return make_fused_program(
            params,
            obstacles,
            free_cells_inv,
            max_iters=max_iters,
            device_kind=device_kind,
        )
    if kernel == "reference":
        from lbm_tpu.ops.fused import make_reference_program

        return make_reference_program(params, obstacles, free_cells_inv)
    raise ValueError(f"unknown kernel {kernel!r}")


def make_step(
    params: LBMParams,
    obstacles: np.ndarray,
    free_cells_inv: np.float32,
    kernel: str = "auto",
) -> StepFn:
    """Plain ``f -> (f', av)`` step function (see :func:`make_program`)."""
    return make_program(params, obstacles, free_cells_inv, kernel).single()


@dataclasses.dataclass
class RunResult(diagnostics.ResultMetrics):
    """Outcome of a full simulation run.

    Exactly one of ``f`` (readback="state", the 9 distribution planes) or
    ``fields`` (readback="fields": device-computed ``[u_x, u_y, |u|,
    pressure]`` — everything ``final_state.dat`` needs, at 4/9 the
    device->host bytes) is set.
    """

    params: LBMParams
    f: np.ndarray | None  # [9, ny, nx] float32 final distributions
    av_vels: np.ndarray  # [maxIters] float32 per-step mean fluid speed
    obstacles: np.ndarray  # [ny, nx] bool
    free_cells_inv: float
    elapsed: float  # seconds, upload -> download (reference's tic..toc)
    fields: np.ndarray | None = None  # [4, ny, nx] float32
    # Timesteps actually executed within ``elapsed`` — differs from
    # params.max_iters when a checkpointed run RESUMED partway (perf
    # figures must not credit the pre-crash steps to this invocation).
    steps_timed: int | None = None
    # Timesteps per kernel pass of the program that ran (for variant-aware
    # bandwidth accounting).
    steps_per_pass: int = 1


class Simulator:
    """One configured simulation: grid, obstacles, compiled step program."""

    def __init__(
        self,
        params: LBMParams,
        obstacles: np.ndarray,
        *,
        kernel: str = "auto",
        device: jax.Device | None = None,
        collect_av_vels: bool = True,
    ) -> None:
        obstacles = np.asarray(obstacles, dtype=bool)
        if obstacles.shape != (params.ny, params.nx):
            raise ValueError(
                f"obstacle mask {obstacles.shape} != grid {(params.ny, params.nx)}"
            )
        self.params = params
        self.obstacles = obstacles
        self.free_cells = free_cells_of(obstacles)
        self.free_cells_inv = np.float32(1.0) / np.float32(self.free_cells)
        self.device = device if device is not None else select_device()
        enable_compile_cache()
        self.kernel = kernel
        self._collect = collect_av_vels
        self._compiled: dict[tuple[int, str, bool], Any] = {}
        self._chunks: dict[int, int] = {}
        self._init_compiled: Any = None
        # Giant-grid checkpoint caches: StepProgram per segment-length
        # key, and per-program carry-segment executables (see
        # _run_checkpointed_carry).
        self._ckpt_programs: dict[int | None, Any] = {}
        self._carry_exes: dict[int, dict[int, Any]] = {}

    # -- compiled program ---------------------------------------------------

    def _build(self, max_iters: int, fallback_level: int = 0,
               readback: str = "state", from_f0: bool = True):
        """fallback_level: 0 = chunked/temporal kernels allowed, 1 =
        single-step fused only, 2 = jnp reference path.  readback:
        'state' returns the 9-plane f, 'fields' returns the 4 derived
        final-state planes (less than half the device->host traffic).
        ``from_f0=False`` builds the zero-f-argument variant: the carry
        for the canonical uniform initial state is constructed INSIDE the
        compiled program (``StepProgram.init0``, or ``init`` composed with
        the on-device ``init_cells`` broadcast) — one fewer executable
        dispatch per run, and no f0+carry relayout transient at giant
        grids."""
        program = make_program(
            self.params,
            self.obstacles,
            self.free_cells_inv,
            "reference" if fallback_level >= 2 else self.kernel,
            max_iters=max_iters if fallback_level == 0 else None,
            device_kind=self.device.device_kind,
        )
        assert max_iters % program.chunk == 0
        self._chunks[max_iters] = program.chunk
        n_pconsts = len(program.consts)
        extra_consts: tuple = ()
        if readback == "fields" and program.final_fields is not None:
            # Programs with a non-f carry layout (x-tiled) derive the
            # payload per strip — composing raw_fields_fn(final(carry))
            # would materialize the un-tiled fp32 f next to the carry and
            # OOM at giant grids (see StepProgram.final_fields).
            def emit(carry):
                return program.final_fields(carry)

        elif readback == "fields":
            # The fluid mask rides as a runtime operand (appended to the
            # program consts), never as a jit closure constant — an
            # embedded [ny, nx] bool literal blows the remote compile
            # service's request limit at giant grids (HTTP 413; the
            # mask-literal rule, see raw_fields_fn).
            finalize = raw_fields_fn(self.params, self.obstacles)
            extra_consts = (np.asarray(~self.obstacles, dtype=bool),)

            def emit(carry, fluid):
                return finalize(program.final(carry), fluid)

        else:

            def emit(carry):
                return program.final(carry)

        def body(carry, _):
            carry, av = program.step(carry)
            return carry, av if self._collect else None

        if from_f0:
            # Donation lets XLA alias f0 with the returned f buffer; in
            # fields mode no output matches the input shape, so donating
            # would only emit a "donated buffers were not usable" warning.
            donate = (0,) if readback == "state" else ()

            @functools.partial(jax.jit, donate_argnums=donate)
            def run_scan(f0, *consts):
                # Large static operands (e.g. the temporal program's
                # extended mask, the fields readback's fluid mask) enter
                # as ARGUMENTS, not closure constants: an embedded
                # multi-hundred-MB literal blows the remote compile
                # service's request limit at big grids (HTTP 413 at
                # 8192^2).
                carry, av = jax.lax.scan(
                    body,
                    program.init(f0, *consts[:n_pconsts]),
                    None,
                    length=max_iters // program.chunk,
                )
                if self._collect and program.chunk > 1:
                    av = av.reshape(max_iters)
                return emit(carry, *consts[n_pconsts:]), av

        else:
            init0 = program.init0 or (
                lambda *consts: program.init(init_cells(self.params), *consts)
            )
            # No f argument to infer placement from: pin the outputs (and
            # with them the whole program) to the bound device.
            sharding = jax.sharding.SingleDeviceSharding(self.device)

            @functools.partial(jax.jit, out_shardings=sharding)
            def run_scan(*consts):
                carry, av = jax.lax.scan(
                    body,
                    init0(*consts[:n_pconsts]),
                    None,
                    length=max_iters // program.chunk,
                )
                if self._collect and program.chunk > 1:
                    av = av.reshape(max_iters)
                return emit(carry, *consts[n_pconsts:]), av

        run_scan.consts = (*program.consts, *extra_consts)
        return run_scan

    def compiled(self, max_iters: int | None = None, readback: str = "state",
                 from_f0: bool = False):
        """AOT-compile (and cache) the full-run program for ``max_iters``.

        Ahead-of-time compilation is the analog of the reference's
        ``clBuildProgram`` inside ``initialise()`` — it happens before the
        run timer starts.

        ``from_f0=False`` (the plain-``run()`` variant) takes no f
        argument: initialization is fused into the program (see
        ``_build``).  ``from_f0=True`` is the ``f(f0)`` variant used when
        the caller supplies a starting state (checkpoint resume).
        """
        check_readback(readback)
        if max_iters is None:
            max_iters = self.params.max_iters
        # "device" runs the identical program as "state" (the difference is
        # only whether the caller fetches) — share the compile cache entry.
        if readback == "device":
            readback = "state"
        if readback == "state" and not state_readback_fits(
            self.params.ny, self.params.nx, hbm_budget_gib(self.device)
        ):
            import warnings

            warnings.warn(
                f"state readback at {self.params.ny}x{self.params.nx} "
                "peaks at ~3x f's bytes and exceeded HBM in testing "
                "(RESOURCE_EXHAUSTED at dispatch, surfacing only at the "
                "next device_get); use readback='fields' for giant grids",
                stacklevel=2,
            )
        key = (max_iters, readback, from_f0)
        if key not in self._compiled:
            # Bind the target device at lowering time; otherwise the
            # executable is pinned to the default device and a non-default
            # LBM_DEVICE/--device run fails with a sharding mismatch.
            spec = jax.ShapeDtypeStruct(
                (9, self.params.ny, self.params.nx),
                jnp.float32,
                sharding=jax.sharding.SingleDeviceSharding(self.device),
            )
            last_err = None
            for level in range(3):
                # Program construction stays OUTSIDE the guarded region:
                # its ValueErrors are configuration errors (unknown kernel,
                # invalid split) that must propagate, not silently degrade
                # to the jnp path.
                fn = self._build(
                    max_iters, fallback_level=level, readback=readback,
                    from_f0=from_f0,
                )
                consts = getattr(fn, "consts", ())
                cspecs = [
                    jax.ShapeDtypeStruct(
                        np.asarray(c).shape,
                        np.asarray(c).dtype,
                        sharding=spec.sharding,
                    )
                    for c in consts
                ]
                try:
                    args = (spec, *cspecs) if from_f0 else tuple(cspecs)
                    exe = fn.lower(*args).compile()
                    if consts:
                        # Bind the device-resident consts so callers keep
                        # the plain ``fn(f)`` / ``fn()`` calling convention.
                        cdev = tuple(
                            jax.device_put(np.asarray(c), self.device)
                            for c in consts
                        )
                        if from_f0:
                            exe = functools.partial(
                                (lambda _e, _c, f: _e(f, *_c)), exe, cdev
                            )
                        else:
                            exe = functools.partial(
                                (lambda _e, _c: _e(*_c)), exe, cdev
                            )
                    self._compiled[key] = exe
                    break
                except COMPILE_FALLBACK_ERRORS as e:
                    # e.g. a temporal/multi-step variant exceeding VMEM on
                    # this grid (JaxRuntimeError from the compile service)
                    # or a Mosaic lowering rejection (ValueError); retry
                    # with a more conservative kernel.  Loudly: a silent
                    # degrade would hand the user a multi-x slower variant
                    # with no indication which kernel actually ran.
                    import warnings

                    warnings.warn(
                        f"kernel variant at fallback level {level} failed "
                        f"to compile ({type(e).__name__}: "
                        f"{str(e).splitlines()[0][:120]}); retrying with a "
                        "more conservative schedule",
                        stacklevel=2,
                    )
                    last_err = e
            else:
                raise last_err
        # The f0-variant needs the standalone on-device initializer (the
        # checkpoint driver seeds fresh runs from it); pre-build it so the
        # first run() doesn't pay its trace/compile inside the timed
        # region (measured ~0.8 s of jit dispatch on the first call).  The
        # plain variant fuses initialization into the program itself.
        if from_f0:
            self._init_program()
        return self._compiled[key]

    def _init_program(self):
        """AOT-compiled zero-arg initial-state program: f0 is a constant
        9-plane broadcast (``d2q9-bgk.c:529-550``) generated directly on
        the target device — no host-side array, no upload."""
        if self._init_compiled is None:
            sharding = jax.sharding.SingleDeviceSharding(self.device)
            fn = jax.jit(
                functools.partial(init_cells, self.params),
                out_shardings=sharding,
            )
            self._init_compiled = fn.lower().compile()
        return self._init_compiled

    def chunk(self, max_iters: int | None = None) -> int:
        """Timesteps per kernel pass of the compiled program (1 = the
        single-step kernel; K for multi-step/temporal variants).  Used for
        variant-aware bandwidth accounting in perf reports."""
        if max_iters is None:
            max_iters = self.params.max_iters
        return self._chunks.get(max_iters, 1)

    def initial_state(self) -> jax.Array:
        return self._init_program()()

    def step_fn(self) -> StepFn:
        """The raw (unjitted) single-step function, for composition/tests."""
        return make_program(
            self.params,
            self.obstacles,
            self.free_cells_inv,
            self.kernel,
            device_kind=self.device.device_kind,
        ).single()

    # -- driver ---------------------------------------------------------------

    def run(
        self,
        max_iters: int | None = None,
        f0: np.ndarray | jax.Array | None = None,
        warmup: bool = False,
        readback: str = "state",
    ) -> RunResult:
        """Initialise, run the time loop on-device, read back once.

        ``readback="fields"`` fetches the compact float16
        ``[u_x, u_y, rho - density]`` payload instead of the 9 fp32
        f-planes — everything the output writers and the epilogue need at
        ~1/6 of the transfer bytes (encoding + error bounds:
        :func:`raw_fields_fn`); |u|/pressure are reconstructed on host
        after the timer stops.

        A device-resident ``f0`` is DONATED to the compiled program (the
        run updates f in place, so the caller's buffer is consumed —
        reusing it afterwards raises "Array has been deleted"; pass
        ``jnp.copy(f0)`` to keep a live copy).  Host-side ``f0`` arrays
        are copied on upload and stay valid.
        """
        if max_iters is None:
            max_iters = self.params.max_iters
        del warmup  # compilation is always ahead-of-time via compiled()
        from_f0 = f0 is not None
        fn = self.compiled(max_iters, readback=readback, from_f0=from_f0)
        tic = time.perf_counter()
        if from_f0:
            if isinstance(f0, jax.Array):
                if f0.dtype != jnp.float32:
                    f0 = f0.astype(jnp.float32)
                f = jax.device_put(f0, self.device)
            else:
                # Direct host->device upload.  jnp.asarray first would
                # materialize the array on the DEFAULT device and pay a
                # second device-to-device copy when a non-default device
                # is bound (f-sized: 2.25 GiB at 8192^2).
                f = jax.device_put(np.asarray(f0, np.float32), self.device)
            out, av = fn(f)
        else:
            # Initialization is fused into the compiled program — the
            # timed region is a single executable dispatch plus the fetch.
            out, av = fn()
        if readback == "device":
            # f stays on device (the checkpointed segment driver feeds it
            # straight into the next segment); fetch only the av stream —
            # it depends on every step, so its arrival is the sync point.
            out_host = out
            if self._collect:
                av_host = np.asarray(jax.device_get(av))
            else:
                jax.block_until_ready(out)
                av_host = np.zeros(max_iters, np.float32)
        # One device_get over the tree: copy_to_host_async is issued for
        # both buffers before either host copy drains.
        elif self._collect:
            out_host, av_host = jax.device_get((out, av))
            out_host, av_host = np.asarray(out_host), np.asarray(av_host)
        else:
            out_host = np.asarray(jax.device_get(out))
            av_host = np.zeros(max_iters, np.float32)
        # The timed region is upload -> download (the reference's tic..toc,
        # ``d2q9-bgk.c:196-260``); the host-side fp64 field expansion below
        # happens after the link has drained and is not device time.
        toc = time.perf_counter()
        if readback == "fields":
            out_host = expand_fields(
                out_host, self.obstacles, self.params.density
            )
        run_params = dataclasses.replace(self.params, max_iters=max_iters)
        return RunResult(
            params=run_params,
            f=out_host if readback in ("state", "device") else None,
            fields=out_host if readback == "fields" else None,
            av_vels=av_host,
            obstacles=self.obstacles,
            free_cells_inv=float(self.free_cells_inv),
            elapsed=toc - tic,
            steps_timed=max_iters,
            steps_per_pass=self.chunk(max_iters),
        )

    def run_checkpointed(
        self,
        checkpoint_dir: str,
        every: int,
        max_iters: int | None = None,
        resume: bool = True,
    ) -> RunResult:
        """Run in ``every``-step segments, snapshotting resumable state
        (f, step index, av_vels so far) after each segment; picks up from
        an existing checkpoint in ``checkpoint_dir`` when ``resume``.

        The reference has no restart capability (SURVEY §5.4) — a crashed
        80k-step run starts over; this closes that gap.
        """
        if max_iters is None:
            max_iters = self.params.max_iters
        # Giant grids: the f-interchange segments below ride the
        # state-shaped program (~3x f's bytes on device — OOM at
        # >= 12288^2).  When the schedule provides carry<->f host
        # conversion, keep the CARRY resident between segments instead;
        # snapshots stay in the portable f-format .npz.
        if not state_readback_fits(
            self.params.ny, self.params.nx, hbm_budget_gib(self.device)
        ):
            pkey = min(every, max_iters) or None
            if pkey not in self._ckpt_programs:
                program = make_program(
                    self.params,
                    self.obstacles,
                    self.free_cells_inv,
                    self.kernel,
                    max_iters=pkey,
                    device_kind=self.device.device_kind,
                )
                # Cache None (not the program) when the schedule has no
                # carry-resident checkpoint hooks: retaining it would pin
                # its ~grid-sized host maskext for the Simulator's
                # lifetime while the f-interchange fallback below builds
                # its own programs anyway.  The None sentinel still makes
                # the probe once-per-segment-length, not once-per-call.
                self._ckpt_programs[pkey] = (
                    program if program.checkpoint_io is not None else None
                )
            program = self._ckpt_programs[pkey]
            if program is not None:
                return self._run_checkpointed_carry(
                    program, checkpoint_dir, every, max_iters, resume
                )
        f, av, elapsed, executed = run_segments_checkpointed(
            # Device readback: f stays on-chip between segments; the v1
            # save gathers it once per snapshot (np.asarray inside save).
            # A fresh start seeds f0 from the on-device initializer so
            # every segment (first included) runs the SAME compiled
            # f0-variant — one AOT compile per segment length.
            run_segment=lambda seg, f0: self.run(
                max_iters=seg,
                f0=f0 if f0 is not None else self.initial_state(),
                readback="device",
            ),
            precompile=functools.partial(self.compiled, from_f0=True),
            params=self.params,
            obstacles=self.obstacles,
            checkpoint_dir=checkpoint_dir,
            every=every,
            max_iters=max_iters,
            resume=resume,
        )
        if f is None:  # zero remaining work and nothing checkpointed
            return self.run(max_iters=0)
        if not isinstance(f, np.ndarray):
            # f is the last segment's on-device array, but the snapshot
            # committed just above holds exactly this state — read it
            # back from LOCAL DISK instead of paying a second full fetch
            # of the device array through the ~30 MB/s host link (at
            # 8192² that second fetch is ~75 s of pure waste).
            from lbm_tpu import checkpoint as ckpt

            f = ckpt.load(checkpoint_dir).f
        return RunResult(
            params=dataclasses.replace(self.params, max_iters=max_iters),
            f=np.asarray(f),
            av_vels=av,
            obstacles=self.obstacles,
            free_cells_inv=float(self.free_cells_inv),
            elapsed=elapsed,
            steps_timed=executed,
            steps_per_pass=(
                self.chunk(min(every, executed)) if executed else 1
            ),
        )

    def _run_checkpointed_carry(
        self,
        program,
        checkpoint_dir: str,
        every: int,
        max_iters: int,
        resume: bool,
    ) -> RunResult:
        """Carry-resident checkpointed segments for giant grids.

        The scan carry (the x-tiled strip state) stays on device between
        segments — donated through each compiled segment, so the steady
        footprint is one carry (~1.06x f) instead of the f-interchange
        path's ~3x f.  Snapshots and resume convert carry <-> f on the
        HOST via ``program.checkpoint_io`` (portable v1 ``.npz``
        f-format: interchangeable with checkpoints from every other
        kernel and the sharded per-shard driver).
        """
        import types

        from lbm_tpu import checkpoint as ckpt

        io = program.checkpoint_io
        k = program.chunk
        sharding = jax.sharding.SingleDeviceSharding(self.device)
        # Instance-level executable cache: the crash-then-resume pattern
        # calls run_checkpointed twice on one Simulator, and a giant-grid
        # segment compile costs minutes through the remote service.  The
        # program objects are themselves cached in self._ckpt_programs,
        # so id() keys stay live and unique.
        exes: dict[int, Any] = self._carry_exes.setdefault(id(program), {})

        def seg_exe(seg: int):
            if seg % k != 0:
                raise ValueError(
                    f"carry-resident checkpoint segments must be multiples "
                    f"of the giant-grid schedule's {k}-step chunk, got a "
                    f"{seg}-step segment.  It comes from `every`, the "
                    f"remainder to max_iters, or the tail after resuming a "
                    f"checkpoint whose step offset is not {k}-aligned (a "
                    f"snapshot written by a different kernel/driver) — "
                    f"align all three to {k}"
                )
            if seg not in exes:

                @functools.partial(
                    jax.jit, donate_argnums=0, out_shardings=sharding
                )
                def run_scan(carry):
                    def body(c, _):
                        c, av = program.step(c)
                        return c, av

                    carry, av = jax.lax.scan(
                        body, carry, None, length=seg // k
                    )
                    return carry, (av.reshape(seg) if k > 1 else av)

                specs = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        x.shape, x.dtype, sharding=sharding
                    ),
                    jax.eval_shape(program.init0),
                )
                exes[seg] = run_scan.lower(specs).compile()
            return exes[seg]

        def fresh_carry():
            # EAGER init0: every carry slot owns a distinct buffer, so
            # donating the carry into the segment executable is safe (a
            # jitted init0 would CSE the duplicate ghost broadcasts back
            # into one buffer — the double-donation dispatch rejection).
            # default_device pins the eager broadcasts to the BOUND
            # device: on a multi-device host the multi-GiB carry must
            # never materialize on devices[0] and ride a silent
            # cross-device copy into the (device-pinned) segment
            # executable — that copy can itself exhaust the wrong chip's
            # HBM at exactly the capacity regime this driver serves.
            with jax.default_device(self.device):
                mask_dev = jax.device_put(
                    np.asarray(program.consts[0]), self.device
                )
                return program.init0(mask_dev)

        def run_segment(seg, c0):
            if c0 is None:
                carry = fresh_carry()
            elif isinstance(c0, np.ndarray):  # resumed snapshot (host f)
                # Same bound-device pinning as fresh_carry (from_f_host's
                # eager relayout would otherwise land on devices[0]).
                with jax.default_device(self.device):
                    carry = io.from_f_host(c0)
            else:  # previous segment's on-device carry
                carry = c0
            carry, av = seg_exe(seg)(carry)
            return types.SimpleNamespace(
                f=carry, av_vels=np.asarray(jax.device_get(av))
            )

        last_snap: dict[str, Any] = {}

        def save_carry(dirname, params, obstacles, step, carry, av):
            f_host = io.to_f_host(carry)
            # The driver always snapshots after the last segment, so the
            # final RunResult.f can reuse this host copy instead of
            # re-fetching the multi-GiB carry through the host link.
            last_snap["step"], last_snap["f"] = step, f_host
            ckpt.save(dirname, params, obstacles, step, f_host, av)

        state, av, elapsed, executed = run_segments_checkpointed(
            run_segment=run_segment,
            precompile=seg_exe,
            params=self.params,
            obstacles=self.obstacles,
            checkpoint_dir=checkpoint_dir,
            every=every,
            max_iters=max_iters,
            resume=resume,
            save_fn=save_carry,
        )
        if state is None:  # max_iters == 0 and nothing checkpointed
            f_host = io.to_f_host(fresh_carry())
        elif isinstance(state, np.ndarray):  # resume found a complete run
            f_host = state
        elif last_snap.get("step") == max_iters:
            f_host = last_snap["f"]
        else:
            f_host = io.to_f_host(state)
        return RunResult(
            params=dataclasses.replace(self.params, max_iters=max_iters),
            f=f_host,
            av_vels=av,
            obstacles=self.obstacles,
            free_cells_inv=float(self.free_cells_inv),
            elapsed=elapsed,
            steps_timed=executed,
            steps_per_pass=k,
        )


def run_segments_checkpointed(
    *,
    run_segment: Callable[[int, np.ndarray | None], Any],
    precompile: Callable[[int], Any],
    params: LBMParams,
    obstacles: np.ndarray,
    checkpoint_dir: str,
    every: int,
    max_iters: int,
    resume: bool,
    save_fn: Callable[..., Any] | None = None,
) -> tuple[np.ndarray | None, np.ndarray, float, int]:
    """Shared checkpointed-segment driver (single-chip and sharded runs).

    ``run_segment(seg, f0)`` must return an object with ``.f`` and
    ``.av_vels`` — ``.f`` may be an on-device array (``readback="device"``
    segments keep f off the host link between segments; only snapshots
    touch it); returns ``(f_final, av_vels, elapsed, steps_executed)``
    with ``f_final`` None when there was no work at all.
    ``steps_executed`` counts only THIS invocation's steps (a resume does
    not re-run the checkpointed prefix) — perf reporting must use it, not
    ``max_iters``.  ``save_fn(dir, params, obstacles, step, f, av)``
    writes each snapshot (default: the single-``.npz`` v1 writer; sharded
    callers pass :func:`lbm_tpu.checkpoint.save_sharded`).
    """
    from lbm_tpu import checkpoint as ckpt

    if save_fn is None:
        save_fn = ckpt.save
    if every <= 0:
        raise ValueError(f"checkpoint interval must be positive: {every}")

    start = 0
    av_parts: list[np.ndarray] = []
    f = None
    if resume:
        loaded = ckpt.load(checkpoint_dir)
        if loaded is not None:
            loaded.validate(params, obstacles)
            if loaded.step > max_iters:
                raise ValueError(
                    f"checkpoint at step {loaded.step} is beyond "
                    f"max_iters={max_iters}"
                )
            start = loaded.step
            av_parts.append(np.asarray(loaded.av_vels))
            f = loaded.f

    # Precompile every distinct segment length (at most two: ``every``
    # and the final remainder) so no AOT compile lands mid-run inside
    # the timed region.
    remaining = max_iters - start
    if remaining >= every:
        precompile(every)
    tail = remaining % every if remaining >= every else remaining
    if tail:
        precompile(tail)

    tic = time.perf_counter()
    step = start
    while step < max_iters:
        seg = min(every, max_iters - step)
        res = run_segment(seg, f)
        f = res.f
        av_parts.append(res.av_vels)
        step += seg
        save_fn(
            checkpoint_dir,
            params,
            obstacles,
            step,
            f,
            np.concatenate(av_parts) if av_parts else np.zeros(0),
        )
    elapsed = time.perf_counter() - tic

    av = (
        np.concatenate(av_parts) if av_parts else np.zeros(0, dtype=np.float32)
    )
    return f, av, elapsed, max_iters - start
