"""Profiling/debugging utilities and the plot tool."""

import numpy as np
import pytest

from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import channel_box
from lbm_tpu.ops.reference import init_cells
from lbm_tpu.runtime import Simulator
from lbm_tpu.utils.debugging import assert_mass_conserved, nan_guard
from lbm_tpu.utils.profiling import BYTES_PER_CELL, PerfReport

PARAMS = LBMParams(32, 16, 5, 10, 0.1, 0.005, 1.85)


def test_perf_report_math():
    r = PerfReport(nx=1024, ny=1024, steps=20000, elapsed=2.0)
    assert r.cell_updates == 1024 * 1024 * 20000
    np.testing.assert_allclose(r.mlups, r.cell_updates / 2.0 / 1e6)
    np.testing.assert_allclose(
        r.effective_bandwidth_gbs, r.cell_updates * BYTES_PER_CELL / 2.0 / 1e9
    )
    assert "MLUPS" in r.summary()


def test_mass_conservation_guard():
    sim = Simulator(PARAMS, channel_box(32, 16), kernel="reference")
    res = sim.run()
    f0 = np.asarray(init_cells(PARAMS))
    assert_mass_conserved(f0, res.f, rtol=1e-4)
    with pytest.raises(AssertionError, match="mass"):
        assert_mass_conserved(f0, res.f * 2.0)


def test_nan_guard_context():
    import jax.numpy as jnp

    with nan_guard():
        with pytest.raises(FloatingPointError):
            _ = jnp.log(jnp.zeros(4)) * 0.0 + jnp.nan  # produces NaN


def test_plot_tool(tmp_path):
    pytest.importorskip("matplotlib")
    from lbm_tpu.io import write_final_state
    from tools.plot_final_state import main as plot_main

    sim = Simulator(PARAMS, channel_box(32, 16), kernel="reference")
    res = sim.run()
    fs = tmp_path / "final_state.dat"
    write_final_state(fs, PARAMS, res.f, res.obstacles)
    out = tmp_path / "plot.png"
    assert plot_main([str(fs), str(out)]) == 0
    assert out.stat().st_size > 0


def test_perfreport_zero_elapsed_rates_are_inf():
    """Sub-timer-resolution elapsed must follow the ResultMetrics
    convention (rate -> inf), not collapse to a spurious 0 MLUPS."""
    r = PerfReport(nx=64, ny=64, steps=10, elapsed=0.0)
    assert r.mlups == float("inf")
    assert r.effective_bandwidth_gbs == float("inf")
    assert r.effective_gflops == float("inf")
