"""Validation-engine chain: scalar model -> fp64 vectorized -> fp32 device.

Plus reference-free golden checks: the fp32 engine must track the fp64
engine within the checker tolerance, with no /root/reference needed.
"""

import numpy as np

from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import canonical_obstacles, channel_box
from lbm_tpu.runtime import Simulator
from lbm_tpu.validation import init_cells64, run64

from tests import numpy_model

TINY = LBMParams(16, 8, 10, 10, 0.1, 0.005, 1.85)


def test_run64_matches_scalar_model():
    rng = np.random.default_rng(0)
    obs = rng.random((TINY.ny, TINY.nx)) < 0.2
    f_vec, av_vec = run64(TINY, obs, max_iters=6)
    f_s = numpy_model.init_cells(TINY.ny, TINY.nx, 0.1)
    free = obs.size - obs.sum()
    for t in range(6):
        f_s, tot = numpy_model.step(f_s, obs, 0.1, 0.005, 1.85)
        np.testing.assert_allclose(av_vec[t], tot / free, rtol=1e-12)
    np.testing.assert_allclose(f_vec, f_s, rtol=1e-12)


def test_engine_tracks_fp64_golden():
    """Reference-free golden: fp32 jnp engine vs fp64 NumPy engine on a
    scaled-down canonical case, at the checker's 1% tolerance."""
    params = LBMParams(64, 64, 500, 10, 0.1, 0.005, 1.85)
    obs = channel_box(64, 64)
    _, av64 = run64(params, obs)
    res = Simulator(params, obs, kernel="reference").run()
    pct = np.abs((av64 - res.av_vels) / av64) * 100
    assert pct.max() < 1.0, pct.max()


def test_mass_conserved_fp64():
    params = LBMParams(32, 32, 50, 10, 0.1, 0.0, 1.85)  # no body force
    obs = channel_box(32, 32)
    f0 = init_cells64(params)
    f, _ = run64(params, obs)
    np.testing.assert_allclose(f.sum(), f0.sum(), rtol=1e-12)


def test_fused_init_variant_matches_explicit_f0():
    """``run()`` with no f0 compiles the init0-fused program (no f
    argument, one dispatch); it must be bit-identical to the f0-variant
    fed the canonical initial state."""
    from lbm_tpu.ops.reference import init_cells

    params = LBMParams(32, 16, 20, 10, 0.1, 0.005, 1.85)
    obs = channel_box(32, 16)
    sim = Simulator(params, obs, kernel="reference")
    res_fused = sim.run()
    res_f0 = sim.run(f0=np.asarray(init_cells(params)))
    np.testing.assert_array_equal(res_fused.f, res_f0.f)
    np.testing.assert_array_equal(res_fused.av_vels, res_f0.av_vels)
    # Both variants coexist in the compile cache under distinct keys.
    assert {k[2] for k in sim._compiled} == {False, True}
