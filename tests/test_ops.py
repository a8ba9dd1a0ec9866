"""Unit tests of the jnp ops against the independent float64 NumPy model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import LBMParams
from lbm_tpu.diagnostics import total_density
from lbm_tpu.ops import lattice
from lbm_tpu.ops.reference import (
    accel_weights,
    accelerate_flow,
    init_cells,
    make_step_fn,
    stream,
)

from tests import numpy_model

TINY = LBMParams(16, 8, 10, 10, 0.1, 0.005, 1.85)


def tiny_obstacles(seed=0):
    rng = np.random.default_rng(seed)
    obs = rng.random((TINY.ny, TINY.nx)) < 0.2
    obs[0, :] = True  # a wall, like the canonical cases
    return obs


def test_lattice_sanity():
    lattice.sanity()


def test_init_cells_matches_reference_weights():
    f = np.asarray(init_cells(TINY))
    assert f.shape == (9, TINY.ny, TINY.nx)
    np.testing.assert_allclose(f[0], 0.1 * 4 / 9, rtol=1e-6)
    np.testing.assert_allclose(f[1:5], 0.1 / 9, rtol=1e-6)
    np.testing.assert_allclose(f[5:9], 0.1 / 36, rtol=1e-6)


def test_stream_is_pull_gather():
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.random((9, TINY.ny, TINY.nx)), jnp.float32)
    out = np.asarray(stream(f))
    fn = np.asarray(f)
    for k in range(9):
        for y in (0, 3, TINY.ny - 1):
            for x in (0, 5, TINY.nx - 1):
                src_y = (y - lattice.CY[k]) % TINY.ny
                src_x = (x - lattice.CX[k]) % TINY.nx
                assert out[k, y, x] == fn[k, src_y, src_x]


def test_accelerate_positivity_guard():
    """No kick where a west-side population would go non-positive."""
    obs = np.zeros((TINY.ny, TINY.nx), dtype=bool)
    f = np.asarray(init_cells(TINY)).copy()
    row = TINY.ny - 2
    f[3, row, 2] = 1e-9  # f3 - w1 <= 0 -> whole-cell kick disabled
    w1, w2 = accel_weights(TINY)
    out = np.asarray(
        accelerate_flow(jnp.asarray(f), jnp.asarray(obs[row]), w1, w2, row)
    )
    np.testing.assert_array_equal(out[:, row, 2], f[:, row, 2])
    assert out[1, row, 3] > f[1, row, 3]  # neighbors still kicked


def test_step_matches_float64_model():
    obs = tiny_obstacles()
    fcinv = np.float32(1.0 / (obs.size - obs.sum()))
    step = jax.jit(make_step_fn(TINY, obs, fcinv))

    f_jnp = init_cells(TINY)
    f_np = numpy_model.init_cells(TINY.ny, TINY.nx, 0.1)
    for t in range(8):
        f_jnp, av = step(f_jnp)
        f_np, tot = numpy_model.step(f_np, obs, 0.1, 0.005, 1.85)
        np.testing.assert_allclose(np.asarray(f_jnp), f_np, rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(
            float(av), tot / (obs.size - obs.sum()), rtol=2e-4
        )


def test_mass_conservation():
    """total_density is invariant (the reference's never-called C checker)."""
    obs = tiny_obstacles()
    fcinv = np.float32(1.0 / (obs.size - obs.sum()))
    params = dataclasses.replace(TINY, accel=0.0)  # no body force: exact
    step = jax.jit(make_step_fn(params, obs, fcinv))
    f = init_cells(params)
    m0 = total_density(np.asarray(f))
    for _ in range(20):
        f, _ = step(f)
    m1 = total_density(np.asarray(f))
    assert abs(m1 - m0) / m0 < 1e-5


def test_obstacle_cells_bounce_back():
    """An obstacle cell's outgoing populations are the reflected inflows."""
    obs = tiny_obstacles()
    fcinv = np.float32(1.0 / (obs.size - obs.sum()))
    step = make_step_fn(TINY, obs, fcinv)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.random((9, TINY.ny, TINY.nx)), jnp.float32)
    streamed = np.asarray(stream(f))
    out = np.asarray(step(f)[0])
    ys, xs = np.nonzero(obs)
    y, x = ys[0], xs[0]
    for k in range(9):
        assert out[k, y, x] == streamed[int(lattice.OPPOSITE[k]), y, x]
