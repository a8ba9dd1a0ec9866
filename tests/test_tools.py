"""Tooling drift guards: the repo tools must keep building against the
library's current carry/kernel contracts (the ablation tool once broke
silently when the temporal mask moved into the carry)."""

import importlib.util
import pathlib

import numpy as np
import pytest

import jax.experimental.pallas as pl

from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import channel_box, free_cells_of
from lbm_tpu.ops.fused import build_temporal_program
from lbm_tpu.ops.reference import accel_weights, init_cells

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, TOOLS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Force interpret mode for pallas_call built inside a tool."""
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )


@pytest.mark.medium
def test_ablated_modes_match_the_production_carry(interpret_pallas):
    """The ablation tool's kernels must accept the production temporal
    carry (f, gs, gn, int8 maskext) and its 'collide' mode must
    reproduce the production kernel's f BITWISE (same physics, minus
    only the av reduction).  (Medium: guards the measurement TOOL, not a
    production path.)"""
    ab = _load("ablate_step")
    params = LBMParams(128, 64, 8, 10, 0.1, 0.005, 1.85)
    obs = channel_box(params.nx, params.ny, interior_row=31)
    fcinv = np.float32(1.0 / free_cells_of(obs))
    by, k = 16, 4
    prog = build_temporal_program(params, obs, fcinv, by, k, interpret=True)
    aw1, aw2 = accel_weights(params)
    omega = float(np.float32(params.omega))
    for mode in ("noop", "stream", "collide"):
        call = ab.build_ablated(
            mode, params.ny, params.nx, by, k, omega, float(aw1), float(aw2)
        )
        f, gs, gn, maskext = prog.init(init_cells(params))
        assert maskext.dtype == np.int8  # the production operand, not f32
        fa, gsa, gna, _ = call(f, gs, gn, maskext)
        assert fa.shape == f.shape
        if mode == "collide":
            (fp, *_), _av = prog.step(prog.init(init_cells(params)))
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fp))


def test_bench_all_golden_series_falls_back_to_vendored(monkeypatch, tmp_path):
    """bench_all's drift gate works without the reference mount: it falls
    back to the vendored fp64 goldens — ALL FOUR full-length since round
    4 — and a truncated vendored series still gates as a loudly-labeled
    prefix (the caller compares the overlapping steps and prints a NOTE
    line; no-silent-caps)."""
    ba = _load("bench_all")
    monkeypatch.setattr(ba, "GOLDEN_DIR", tmp_path / "no_reference")

    for case, steps in (
        ("128x128", 40000), ("128x256", 40000),
        ("256x256", 80000), ("1024x1024", 20000),
    ):
        vendored = ba.golden_series(case, steps)
        assert vendored is not None and vendored.size == steps, case

    # A truncated vendored series (e.g. regenerated short) still gates
    # as a prefix rather than being dropped.
    vend = tmp_path / "vendored"
    vend.mkdir()
    head = np.loadtxt(
        ba.VENDORED_DIR / "1024x1024.fp64gen_av_vels.dat", usecols=[1]
    )[:600]
    from lbm_tpu.io import write_av_vels

    write_av_vels(vend / "1024x1024.fp64gen_av_vels.dat", head)
    monkeypatch.setattr(ba, "VENDORED_DIR", vend)
    prefix = ba.golden_series("1024x1024", 20000)
    assert prefix is not None and 0 < prefix.size < 20000
    # Longer than the run -> wrong case/params: never gate against it.
    assert ba.golden_series("1024x1024", 100) is None
    # Unknown case -> None.
    assert ba.golden_series("7x7", 100) is None


def test_bench_all_golden_series_prefers_reference(reference_dir):
    """With the mount present, the reference's own golden wins."""
    ba = _load("bench_all")
    golden = ba.golden_series("128x128", 40000)
    ref = np.loadtxt(
        reference_dir / "check" / "128x128.av_vels.dat", usecols=[1]
    )
    np.testing.assert_array_equal(golden, ref)


def test_gen_inputs_canonical_max_iters_override(tmp_path):
    """`gen_inputs 1024x1024 --max-iters 600` writes the canonical
    geometry with only max_iters replaced — the `make check-self` prefix
    gate relies on this (a 600-step run's av_vels IS the first 600
    entries of the 20000-step run)."""
    from lbm_tpu.config import CANONICAL_PARAMS, LBMParams
    from lbm_tpu.geometry import canonical_obstacles, load_obstacle_file

    gi = _load("gen_inputs")
    gi.main(["1024x1024", str(tmp_path), "--max-iters", "600"])
    got = LBMParams.from_file(tmp_path / "input_1024x1024.params")
    want = CANONICAL_PARAMS["1024x1024"]
    assert got.max_iters == 600
    assert (got.nx, got.ny, got.density, got.accel, got.omega) == (
        want.nx, want.ny, want.density, want.accel, want.omega
    )
    mask, _ = load_obstacle_file(
        tmp_path / "obstacles_1024x1024.dat", got.nx, got.ny
    )
    np.testing.assert_array_equal(mask, canonical_obstacles("1024x1024"))

    # Without the flag the shipped value is kept.
    gi.main(["128x128", str(tmp_path)])
    assert LBMParams.from_file(tmp_path / "input_128x128.params").max_iters == 40000
