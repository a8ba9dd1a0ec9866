"""Profiling & perf accounting (reference aux subsystem 1, SURVEY §5.1).

The reference's CPU era used TAU per-function profiles; its GPU era used
wall-clock + derived GB/s in the report.  The TPU equivalents here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the compiled step program.
* :class:`PerfReport` — MLUPS and effective-HBM-bandwidth accounting from
  a run (the GB/s figures the reference report derives by hand).
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

# Bytes touched per cell per kernel pass: read 9 f-planes + 1 mask plane,
# write 9 f-planes, float32.  Chunked kernels (multi-step / temporal)
# advance several timesteps per pass, so divide by ``steps_per_pass`` to
# get the nominal per-timestep HBM traffic.
BYTES_PER_CELL = (9 + 1 + 9) * 4
FLOPS_PER_CELL = 140  # approximate VPU op count of the fused step


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/lbm_trace"): sim.run()`` -> TensorBoard trace."""
    with jax.profiler.trace(log_dir):
        yield


@dataclasses.dataclass(frozen=True)
class PerfReport:
    """Derived performance figures for one run."""

    nx: int
    ny: int
    steps: int
    elapsed: float
    # Timesteps advanced per kernel pass (the StepProgram ``chunk``): a
    # temporal/multi-step kernel touches HBM once per K steps, so its real
    # traffic is ~K x lower than the single-step kernel's.
    steps_per_pass: int = 1

    @property
    def cell_updates(self) -> int:
        return self.nx * self.ny * self.steps

    def _rate(self, quantity: float) -> float:
        # A zero-step run (max_iters=0 is valid) or sub-timer-resolution
        # elapsed must not crash a report; same convention as
        # diagnostics.ResultMetrics.mlups: rate -> inf when elapsed is 0,
        # not an exception and not a spurious 0 (a 0 would make a
        # faster-than-the-timer run read as "no throughput").
        if self.elapsed > 0.0:
            return quantity / self.elapsed
        return float("inf")

    @property
    def mlups(self) -> float:
        return self._rate(self.cell_updates) / 1e6

    @property
    def effective_bandwidth_gbs(self) -> float:
        """Nominal HBM bytes/s of the compiled kernel variant (ghost-slab
        traffic of the chunked kernels, a few rows per pass, is ignored)."""
        per_step = BYTES_PER_CELL / self.steps_per_pass
        return self._rate(self.cell_updates * per_step) / 1e9

    @property
    def effective_gflops(self) -> float:
        return self._rate(self.cell_updates * FLOPS_PER_CELL) / 1e9

    def summary(self) -> str:
        return (
            f"{self.nx}x{self.ny} x {self.steps} steps in {self.elapsed:.3f}s: "
            f"{self.mlups:.0f} MLUPS, {self.effective_bandwidth_gbs:.0f} GB/s "
            f"effective, {self.effective_gflops:.0f} GFLOP/s"
        )
