"""Randomized cross-validation: fp32 device paths vs the fp64 engine.

Property-style sweep over random obstacle fields and physics parameters —
the kind of coverage the reference's fixed golden cases can't give.
"""

import dataclasses

import numpy as np
import pytest

from lbm_tpu.config import LBMParams
from lbm_tpu.diagnostics import total_density
from lbm_tpu.geometry import free_cells_of
from lbm_tpu.runtime import Simulator
from lbm_tpu.validation import run64


def random_case(seed: int):
    rng = np.random.default_rng(seed)
    ny = int(rng.choice([16, 32, 64]))
    nx = int(rng.choice([32, 64, 128]))
    params = LBMParams(
        nx,
        ny,
        40,
        10,
        float(rng.uniform(0.05, 0.2)),
        float(rng.uniform(0.0, 0.01)),
        float(rng.uniform(0.5, 1.9)),
    )
    obstacles = rng.random((ny, nx)) < rng.uniform(0.0, 0.15)
    obstacles[:, 0] = obstacles[:, -1] = True  # side walls like the cases
    # keep the body-force row's guard cells meaningful
    if free_cells_of(obstacles) == 0:
        obstacles[:] = False
    return params, obstacles


@pytest.mark.parametrize("seed", range(6))
def test_fp32_tracks_fp64_on_random_cases(seed):
    params, obstacles = random_case(seed)
    res = Simulator(params, obstacles, kernel="reference").run()
    f64, av64 = run64(params, obstacles)

    # av series within the checker tolerance; ignore exact zeros (possible
    # in fully-blocked pathological rows).
    nz = av64 != 0
    if nz.any():
        pct = np.abs((av64[nz] - res.av_vels[nz]) / av64[nz]) * 100
        assert pct.max() < 1.0, (params, pct.max())
    np.testing.assert_allclose(res.f, f64, rtol=5e-4, atol=1e-7)


@pytest.mark.parametrize("seed", [1, 3])
def test_mass_conserved_on_random_cases(seed):
    params, obstacles = random_case(seed)
    params = dataclasses.replace(params, accel=0.0)
    res = Simulator(params, obstacles, kernel="reference").run()
    m0 = params.density * params.nx * params.ny
    m1 = total_density(res.f)
    assert abs(m1 - m0) / m0 < 1e-4
