"""End-to-end golden validation against the reference ``check/`` data.

Fast tests compare a prefix of the av_vels series (the per-step science
metric) at the reference checker's 1% relative tolerance; ``slow``-marked
tests run the full cases exactly as ``make check`` would.
"""

import dataclasses

import numpy as np
import pytest

from lbm_tpu.config import CANONICAL_PARAMS
from lbm_tpu.geometry import canonical_obstacles
from lbm_tpu.io import final_state_columns
from lbm_tpu.runtime import Simulator

TOL_PCT = 1.0


def golden_av_vels(reference_dir, case):
    return np.loadtxt(reference_dir / "check" / f"{case}.av_vels.dat", usecols=[1])


@pytest.mark.parametrize("case", ["128x128", "128x256"])
def test_av_vels_prefix(case, reference_dir):
    steps = 400
    params = dataclasses.replace(CANONICAL_PARAMS[case], max_iters=steps)
    sim = Simulator(params, canonical_obstacles(case), kernel="reference")
    res = sim.run()
    golden = golden_av_vels(reference_dir, case)[:steps]
    pct = np.abs((golden - res.av_vels) / golden) * 100
    assert np.isfinite(res.av_vels).all()
    assert pct.max() < TOL_PCT, f"max diff {pct.max():.4f}% at step {pct.argmax()}"


@pytest.mark.slow
@pytest.mark.parametrize("case", ["128x128", "128x256"])
def test_full_case(case, reference_dir):
    params = CANONICAL_PARAMS[case]
    obs = canonical_obstacles(case)
    sim = Simulator(params, obs, kernel="reference")
    res = sim.run()

    golden = golden_av_vels(reference_dir, case)
    pct = np.abs((golden - res.av_vels) / golden) * 100
    assert pct.max() < TOL_PCT

    ref_fs = np.loadtxt(
        reference_dir / "check" / f"{case}.final_state.dat", usecols=[0, 1, 5]
    )
    _, _, _, pressure = final_state_columns(params, res.f, obs)
    fs_pct = np.abs((ref_fs[:, 2] - pressure.ravel()) / ref_fs[:, 2]) * 100
    assert fs_pct.max() < TOL_PCT


@pytest.mark.slow
def test_reynolds_invariants(reference_dir):
    """Reynolds numbers printed by the reference runs (README.md:78)."""
    case = "128x128"
    sim = Simulator(CANONICAL_PARAMS[case], canonical_obstacles(case))
    res = sim.run()
    assert abs(res.reynolds - 9.7636) / 9.7636 < 0.01
