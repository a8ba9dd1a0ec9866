"""Writers: byte-format parity with the reference output contract."""

import dataclasses
import re

import numpy as np
import pytest

from lbm_tpu.config import CANONICAL_PARAMS, LBMParams
from lbm_tpu.geometry import channel_box, free_cells_of
from lbm_tpu.io import (
    read_av_vels,
    read_final_state,
    write_av_vels,
    write_final_state,
)
from lbm_tpu.ops.reference import init_cells

PARAMS = LBMParams(16, 8, 4, 10, 0.1, 0.005, 1.85)


def test_av_vels_format(tmp_path):
    path = tmp_path / "av_vels.dat"
    write_av_vels(path, np.array([1.094269153342e-05, 2.5e-3], dtype=np.float64))
    lines = path.read_text().splitlines()
    assert lines[0] == "0:\t1.094269153342E-05"
    assert lines[1] == "1:\t2.500000000000E-03"
    np.testing.assert_allclose(read_av_vels(path), [1.094269153342e-05, 2.5e-3])


def test_final_state_format(tmp_path):
    obstacles = channel_box(PARAMS.nx, PARAMS.ny)
    f = np.asarray(init_cells(PARAMS))
    path = tmp_path / "final_state.dat"
    write_final_state(path, PARAMS, f, obstacles)
    lines = path.read_text().splitlines()
    assert len(lines) == PARAMS.nx * PARAMS.ny

    # Row-major sweep: x varies fastest; 7 columns; C %.12E float format.
    pat = re.compile(
        r"^(\d+) (\d+)"
        + r" ([-+]?\d\.\d{12}E[-+]\d{2,})" * 4
        + r" ([01])$"
    )
    m0 = pat.match(lines[0])
    assert m0, lines[0]
    assert (m0.group(1), m0.group(2), m0.group(7)) == ("0", "0", "1")
    # obstacle cell: u = 0, pressure = density/3
    assert m0.group(3) == "0.000000000000E+00"
    assert m0.group(6) == "3.333333333333E-02"

    # fluid cell away from walls: uniform init -> u=0, pressure=0.1*9w/3
    table = read_final_state(path)
    cell = table[(table[:, 0] == 5) & (table[:, 1] == 3)][0]
    assert cell[6] == 0
    np.testing.assert_allclose(cell[5], 0.1 / 3.0, rtol=1e-6)


def test_final_state_columns_match_loadtxt_contract(tmp_path):
    """The checker reads usecols [0,1,5]; verify coordinate ordering."""
    obstacles = channel_box(PARAMS.nx, PARAMS.ny)
    f = np.asarray(init_cells(PARAMS))
    path = tmp_path / "final_state.dat"
    write_final_state(path, PARAMS, f, obstacles)
    sub = np.loadtxt(path, usecols=[0, 1, 5])
    xs = np.tile(np.arange(PARAMS.nx), PARAMS.ny)
    ys = np.repeat(np.arange(PARAMS.ny), PARAMS.nx)
    np.testing.assert_array_equal(sub[:, 0], xs)
    np.testing.assert_array_equal(sub[:, 1], ys)
