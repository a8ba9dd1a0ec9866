"""Sharded (shard_map + ppermute halo exchange) vs single-device equality.

Runs on the 8-virtual-device CPU mesh forced by conftest — the software
stand-in for a v5e-8 slice.
"""

import dataclasses

import jax
import numpy as np
import pytest

from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import channel_box, free_cells_of
from lbm_tpu.parallel.sharded import ShardedSimulator, default_mesh
from lbm_tpu.runtime import Simulator

PARAMS = LBMParams(128, 64, 30, 10, 0.1, 0.005, 1.85)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    return jax.devices()[:8]


@pytest.mark.parametrize("n_shards", [1, 2, 8])
def test_sharded_matches_single_device(eight_devices, n_shards):
    obstacles = channel_box(PARAMS.nx, PARAMS.ny, interior_row=31)
    single = Simulator(PARAMS, obstacles, kernel="reference").run()

    mesh = default_mesh(n_shards)
    sharded = ShardedSimulator(PARAMS, obstacles, mesh=mesh).run()

    # Same per-cell ops in the same order -> distributions match bitwise;
    # only the av reduction tree differs (psum of per-shard partials).
    np.testing.assert_array_equal(sharded.f, single.f)
    np.testing.assert_allclose(sharded.av_vels, single.av_vels, rtol=1e-5)


def test_body_force_row_crosses_shards(eight_devices):
    """Kick row ny-2 sits on the last shard; its wake must propagate
    identically when that shard boundary is one row above it."""
    params = dataclasses.replace(PARAMS, ny=32, max_iters=20)
    obstacles = channel_box(params.nx, params.ny)
    single = Simulator(params, obstacles, kernel="reference").run()
    sharded = ShardedSimulator(params, obstacles, mesh=default_mesh(8)).run()
    np.testing.assert_array_equal(sharded.f, single.f)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_fused_matches_single_device(eight_devices, n_shards):
    """The fused (Pallas, interpret-mode) sharded path: local blocked
    kernels + cross-shard ghost-slot exchange must match the plain path."""
    params = dataclasses.replace(PARAMS, ny=32, nx=128, max_iters=12)
    obstacles = channel_box(params.nx, params.ny, interior_row=13)
    single = Simulator(params, obstacles, kernel="reference").run()
    sharded = ShardedSimulator(
        params,
        obstacles,
        mesh=default_mesh(n_shards),
        kernel="fused",
        interpret=True,
    ).run()
    np.testing.assert_allclose(sharded.f, single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(sharded.av_vels, single.av_vels, rtol=1e-4)


@pytest.mark.parametrize(
    "n_shards", [2, pytest.param(4, marks=pytest.mark.medium)]
)
def test_sharded_temporal_matches_single_device(eight_devices, n_shards):
    """Temporal blocking composed with sharding: K-row slab exchange every
    K steps must reproduce the per-step path exactly."""
    import jax.numpy as jnp

    from lbm_tpu.parallel.sharded import make_sharded_temporal_run
    from lbm_tpu.ops.reference import init_cells

    params = dataclasses.replace(PARAMS, ny=64, nx=128, max_iters=12)
    obstacles = channel_box(params.nx, params.ny, interior_row=29)
    single = Simulator(params, obstacles, kernel="reference").run()

    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    run = make_sharded_temporal_run(
        params,
        obstacles,
        fcinv,
        default_mesh(n_shards),
        by=8,
        ksteps=2,
        interpret=True,
    )
    assert run is not None
    f_fin, avs = run(init_cells(params))
    np.testing.assert_allclose(
        np.asarray(f_fin), single.f, rtol=1e-5, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(avs), single.av_vels, rtol=1e-4
    )


@pytest.mark.parametrize("py,px", [(2, 4), (4, 2), (1, 4), (8, 1)])
def test_sharded_2d_matches_single_device(eight_devices, py, px):
    """2-D (rows x cols) decomposition with two-phase halo exchange."""
    from lbm_tpu.parallel.sharded import default_mesh_2d

    params = dataclasses.replace(PARAMS, ny=32, nx=64, max_iters=15)
    obstacles = channel_box(params.nx, params.ny, interior_row=13)
    single = Simulator(params, obstacles, kernel="reference").run()
    sharded = ShardedSimulator(
        params, obstacles, mesh=default_mesh_2d(py, px)
    ).run()
    np.testing.assert_array_equal(sharded.f, single.f)
    np.testing.assert_allclose(sharded.av_vels, single.av_vels, rtol=1e-5)


@pytest.mark.parametrize(
    "py,px",
    [
        (2, 4),
        pytest.param(4, 2, marks=pytest.mark.medium),
        pytest.param(1, 4, marks=pytest.mark.medium),
        pytest.param(2, 1, marks=pytest.mark.medium),
    ],
)
def test_sharded_fused_2d_matches_single_device(eight_devices, py, px):
    """The fused-Pallas 2-D path (x-padded tile + two-phase ghost exchange,
    interpret mode) must match the single-device reference step."""
    from lbm_tpu.parallel.sharded import default_mesh_2d, make_sharded_fused_2d_run
    from lbm_tpu.ops.reference import init_cells

    params = dataclasses.replace(PARAMS, ny=32, nx=64, max_iters=12)
    obstacles = channel_box(params.nx, params.ny, interior_row=13)
    single = Simulator(params, obstacles, kernel="reference").run()
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    run = make_sharded_fused_2d_run(
        params,
        obstacles,
        fcinv,
        default_mesh_2d(py, px),
        interpret=True,
    )
    assert run is not None
    f_fin, avs = run(init_cells(params))
    np.testing.assert_allclose(np.asarray(f_fin), single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(avs), single.av_vels, rtol=1e-4)


def test_sharded_fused_2d_multiblock_and_walls(eight_devices):
    """Forced BY < nyl (multiple row blocks per shard) with an interior
    vertical wall crossing the x-shard boundary — exercises the ghost-lane
    scatter into every ghost-row slot, not just slot 0 / slot P-1."""
    from lbm_tpu.parallel.sharded import default_mesh_2d, make_sharded_fused_2d_run
    from lbm_tpu.ops.reference import init_cells

    params = dataclasses.replace(PARAMS, ny=32, nx=64, max_iters=10)
    obstacles = channel_box(params.nx, params.ny, interior_col=33)
    single = Simulator(params, obstacles, kernel="reference").run()
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    run = make_sharded_fused_2d_run(
        params,
        obstacles,
        fcinv,
        default_mesh_2d(2, 4),
        by=4,  # nyl=16 -> 4 blocks per shard
        interpret=True,
    )
    f_fin, avs = run(init_cells(params))
    np.testing.assert_allclose(np.asarray(f_fin), single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(avs), single.av_vels, rtol=1e-4)


def test_sharded_simulator_routes_2d_fused(eight_devices):
    """ShardedSimulator(kernel='fused') on a 2-D mesh must use the fused
    path end-to-end (not silently fall back to jnp)."""
    params = dataclasses.replace(PARAMS, ny=32, nx=64, max_iters=8)
    obstacles = channel_box(params.nx, params.ny)
    single = Simulator(params, obstacles, kernel="reference").run()
    from lbm_tpu.parallel.sharded import default_mesh_2d

    sim = ShardedSimulator(
        params,
        obstacles,
        mesh=default_mesh_2d(2, 2),
        kernel="fused",
        interpret=True,
    )
    res = sim.run()
    np.testing.assert_allclose(res.f, single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(res.av_vels, single.av_vels, rtol=1e-4)


def test_sharded_2d_interior_column(eight_devices):
    """A vertical wall (the 1024x1024 case's x=341 analog) crossing x-shard
    boundaries bounces back identically."""
    from lbm_tpu.parallel.sharded import default_mesh_2d

    params = dataclasses.replace(PARAMS, ny=16, nx=64, max_iters=12)
    obstacles = channel_box(params.nx, params.ny, interior_col=33)
    single = Simulator(params, obstacles, kernel="reference").run()
    sharded = ShardedSimulator(
        params, obstacles, mesh=default_mesh_2d(2, 4)
    ).run()
    np.testing.assert_array_equal(sharded.f, single.f)


def test_sharded_fields_readback(eight_devices):
    """Sharded fields readback must agree with the state readback
    PER CELL — a plane swap or spatial permutation in the sharded
    gather would leave av/Reynolds (means) unchanged."""
    from lbm_tpu.io import final_state_columns

    params = dataclasses.replace(PARAMS, max_iters=20)
    obstacles = channel_box(PARAMS.nx, PARAMS.ny, interior_row=31)
    sim = ShardedSimulator(params, obstacles, mesh=default_mesh(4))
    state = sim.run()
    fields = sim.run(readback="fields")
    assert fields.f is None and fields.fields.shape == (4, PARAMS.ny, PARAMS.nx)
    np.testing.assert_array_equal(state.av_vels, fields.av_vels)
    # Spatial per-cell agreement with the fp64 host derivation from the
    # state payload, at fp16-quantization tolerances (same bounds as the
    # single-chip test_fields_readback_matches_state).
    ux, uy, speed, pressure = final_state_columns(params, state.f, obstacles)
    np.testing.assert_allclose(fields.fields[0], ux, rtol=1.1e-3, atol=1e-6)
    np.testing.assert_allclose(fields.fields[1], uy, rtol=1.1e-3, atol=1e-6)
    np.testing.assert_allclose(fields.fields[2], speed, rtol=1.1e-3, atol=1e-6)
    np.testing.assert_allclose(fields.fields[3], pressure, rtol=1e-4)
    assert abs(state.reynolds - fields.reynolds) / abs(state.reynolds) < 2e-4


def test_bench_sharded_smoke(eight_devices, capsys):
    """The weak-scaling harness (BASELINE.json configs[4], scaled down)
    runs end-to-end on the virtual mesh and reports per-chip MLUPS."""
    import json

    from tools.bench_sharded import main

    rc = main(
        [
            "--shards", "8",
            "--ny", "128",
            "--nx", "128",
            "--max-iters", "20",
            "--kernel", "reference",
            "--repeats", "1",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["unit"] == "MLUPS/chip"
    assert payload["shards"] == 8
    assert payload["value"] > 0
    assert np.isfinite(payload["av_last"])


@pytest.mark.medium
def test_bench_sharded_2d_mesh_smoke(eight_devices, capsys):
    """The harness's 2-D mesh mode (--mesh PYxPX with an explicit
    temporal split) — the BASELINE weak-scaling drive surface — runs on
    the virtual mesh (interpret mode auto-selected off-TPU), reports the
    split's chunk and the two-ring ICI byte accounting."""
    import json

    from tools.bench_sharded import main

    rc = main(
        [
            "--mesh", "2x2",
            "--ny", "64",
            "--nx", "256",
            "--max-iters", "12",
            "--kernel", "temporal",
            "--temporal-split", "8x2",
            "--repeats", "1",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["shards"] == 4
    assert payload["kernel"] == "temporal"
    assert payload["chunk"] == 2
    # both rings cross devices on a 2x2 mesh -> nonzero y AND x bytes
    assert payload["ici_bytes_per_step_per_shard"] > 0
    assert np.isfinite(payload["av_last"])

    # 2-D mesh mode with an explicit temporal split (interpret-free jnp
    # path would be the CPU route, so force the split through temporal
    # validation only — kernel='reference' ignores it).
    rc = main(
        [
            "--mesh", "4x2",
            "--ny", "128",
            "--nx", "128",
            "--max-iters", "20",
            "--kernel", "reference",
            "--repeats", "1",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["shards"] == 8
    assert "4x2 mesh" in payload["metric"]
    assert np.isfinite(payload["av_last"])


def test_rejects_unknown_kernel(eight_devices):
    obstacles = channel_box(PARAMS.nx, PARAMS.ny)
    with pytest.raises(ValueError, match="unknown sharded kernel"):
        ShardedSimulator(PARAMS, obstacles, mesh=default_mesh(2), kernel="mega")
    with pytest.raises(ValueError, match="unknown sharded kernel"):
        ShardedSimulator(PARAMS, obstacles, mesh=default_mesh(2), kernel="fuesd")


def test_temporal_split_requires_temporal_capable_kernel(eight_devices):
    """An explicit (BY, K) must never be silently dropped: only the
    fused/temporal routes consume it ('auto' resolves to 'reference' on
    CPU, which would ignore it)."""
    obstacles = channel_box(PARAMS.nx, PARAMS.ny)
    with pytest.raises(ValueError, match="temporal_split"):
        ShardedSimulator(
            PARAMS,
            obstacles,
            mesh=default_mesh(2),
            kernel="reference",
            temporal_split=(8, 2),
        )
    with pytest.raises(ValueError, match="temporal_split"):
        ShardedSimulator(
            PARAMS, obstacles, mesh=default_mesh(2), temporal_split=(8, 2)
        )  # auto -> reference on the CPU backend


@pytest.mark.parametrize(
    "py,px",
    [
        pytest.param(2, 4, marks=pytest.mark.medium),
        pytest.param(4, 2, marks=pytest.mark.medium),
        (2, 2),
        pytest.param(1, 4, marks=pytest.mark.medium),
    ],
)
def test_sharded_temporal_2d_matches_single_device(eight_devices, py, px):
    """Temporal blocking on a 2-D mesh (K-row slabs over the y ring,
    K-lane column strips over the x ring, both every K steps) must
    reproduce the per-step single-device path exactly — including an
    interior wall near the body-force row and one crossing the x-shard
    boundary."""
    from lbm_tpu.ops.reference import init_cells
    from lbm_tpu.parallel.sharded import (
        default_mesh_2d,
        make_sharded_temporal_2d_run,
    )

    from lbm_tpu.ops.fused import build_temporal_program

    params = dataclasses.replace(PARAMS, ny=64, nx=64, max_iters=12)
    obstacles = channel_box(
        params.nx, params.ny, interior_row=params.ny - 3, interior_col=33
    )
    single = Simulator(params, obstacles, kernel="reference").run()
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    run = make_sharded_temporal_2d_run(
        params,
        obstacles,
        fcinv,
        default_mesh_2d(py, px),
        by=8,
        ksteps=2,
        interpret=True,
    )
    assert run is not None and run.chunk == 2
    f_fin, avs = run(init_cells(params))
    # vs the jnp reference: same fp-ordering gap the single-chip temporal
    # kernel has; the av series additionally regroups a positive fp32 sum
    # across shards (cancellation in the small momenta amplifies lane-
    # grouping rounding), hence the looser rtol there.
    np.testing.assert_allclose(
        np.asarray(f_fin), single.f, rtol=1e-5, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(avs), single.av_vels, rtol=5e-4)
    # vs the single-chip TEMPORAL program with the same (BY, K): the
    # decomposition must be exact — f BITWISE equal (identical per-cell op
    # sequences; only the reduction regroups).
    prog = build_temporal_program(
        params, obstacles, fcinv, by=8, ksteps=2, interpret=True
    )
    carry = prog.init(init_cells(params))
    avs_t = []
    for _ in range(params.max_iters // prog.chunk):
        carry, av = prog.step(carry)
        avs_t.append(np.asarray(av))
    np.testing.assert_array_equal(
        np.asarray(f_fin), np.asarray(prog.final(carry))
    )
    # av regroups a positive fp32 sum across shards; soak measurements
    # put the regrouping noise floor near 3e-5 at small av magnitudes.
    np.testing.assert_allclose(
        np.asarray(avs), np.concatenate(avs_t), rtol=1e-4
    )


# n_shards=2 is the fast representative (exercises the cross-device slab
# patch); 1 (degenerate self-wrap) and 4 (multi-hop ring) are medium.
@pytest.mark.parametrize(
    "n_shards",
    [
        pytest.param(1, marks=pytest.mark.medium),
        2,
        pytest.param(4, marks=pytest.mark.medium),
    ],
)
def test_sharded_temporal_xt_matches_single_device(eight_devices, n_shards):
    """The x-tiled sharded temporal path (local column strips + K-row
    ghost slab exchange over the y ring): f must be BITWISE equal to the
    single-chip x-tiled program with the same (BY, K, Px) — identical
    per-(strip, block) window contents, only the av reduction regroups —
    and match the jnp reference within fp32 reordering noise.  Walls sit
    on the body-force row and across the strip boundary."""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program
    from lbm_tpu.ops.reference import init_cells
    from lbm_tpu.parallel.sharded import make_sharded_temporal_run

    params = dataclasses.replace(PARAMS, ny=64, nx=64, max_iters=12)
    obstacles = channel_box(
        params.nx, params.ny, interior_row=params.ny - 3, interior_col=33
    )
    single = Simulator(params, obstacles, kernel="reference").run()
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    run = make_sharded_temporal_run(
        params,
        obstacles,
        fcinv,
        default_mesh(n_shards),
        by=8,
        ksteps=2,
        px=2,
        interpret=True,
    )
    assert run is not None and run.chunk == 2
    f_fin, avs = run(init_cells(params))
    np.testing.assert_allclose(
        np.asarray(f_fin), single.f, rtol=1e-5, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(avs), single.av_vels, rtol=5e-4)

    prog = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=8, ksteps=2, px=2, interpret=True
    )
    carry = prog.init(init_cells(params))
    avs_t = []
    for _ in range(params.max_iters // prog.chunk):
        carry, av = prog.step(carry)
        avs_t.append(np.asarray(av))
    np.testing.assert_array_equal(
        np.asarray(f_fin), np.asarray(prog.final(carry))
    )
    np.testing.assert_allclose(
        np.asarray(avs), np.concatenate(avs_t), rtol=1e-4
    )


def test_sharded_temporal_xt_routes_and_validates(eight_devices):
    """Explicit (BY, K, PX) splits route end-to-end through
    ShardedSimulator on 1-D meshes; a 2-D mesh with real x sharding
    rejects the x-tiled split (the strips are LOCAL x tiling); malformed
    split tuples are rejected.  The degenerate-x 2-D mesh variant is the
    medium-tier test below."""
    from lbm_tpu.parallel.sharded import default_mesh_2d

    params = dataclasses.replace(PARAMS, ny=64, nx=64, max_iters=12)
    obstacles = channel_box(params.nx, params.ny, interior_col=33)
    single = Simulator(params, obstacles, kernel="reference").run()
    sim = ShardedSimulator(
        params,
        obstacles,
        mesh=default_mesh(2),
        kernel="temporal",
        interpret=True,
        temporal_split=(8, 2, 2),
    )
    res = sim.run()
    assert sim.variant() == "temporal" and sim.chunk(12) == 2
    np.testing.assert_allclose(res.f, single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(res.av_vels, single.av_vels, rtol=5e-4)
    with pytest.raises(ValueError, match="x shard"):
        ShardedSimulator(
            params,
            obstacles,
            mesh=default_mesh_2d(2, 2),
            kernel="temporal",
            interpret=True,
            temporal_split=(8, 2, 2),
        ).compiled()
    with pytest.raises(ValueError, match="BY, K"):
        ShardedSimulator(
            params,
            obstacles,
            mesh=default_mesh(2),
            kernel="temporal",
            temporal_split=(8,),
        )


@pytest.mark.medium
def test_sharded_temporal_xt_routes_degenerate_2d_mesh(eight_devices):
    """The x-tiled split also routes on a 2-D mesh whose x axis is
    degenerate (Px_mesh=1) — same physics as the 1-D fast-tier test."""
    from lbm_tpu.parallel.sharded import default_mesh_2d

    params = dataclasses.replace(PARAMS, ny=64, nx=64, max_iters=12)
    obstacles = channel_box(params.nx, params.ny, interior_col=33)
    single = Simulator(params, obstacles, kernel="reference").run()
    sim = ShardedSimulator(
        params,
        obstacles,
        mesh=default_mesh_2d(2, 1),
        kernel="temporal",
        interpret=True,
        temporal_split=(8, 2, 2),
    )
    res = sim.run()
    assert sim.variant() == "temporal" and sim.chunk(12) == 2
    np.testing.assert_allclose(res.f, single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(res.av_vels, single.av_vels, rtol=5e-4)


@pytest.mark.medium
def test_sharded_simulator_routes_2d_temporal(eight_devices):
    """ShardedSimulator(kernel='temporal') on a 2-D mesh uses the 2-D
    temporal path end-to-end (no silent fallback); an invalid explicit
    split still raises.  (Medium: tests/test_cli.py's
    test_run_mesh_2d_temporal_split drives the same route through the
    CLI in the fast tier.)"""
    from lbm_tpu.parallel.sharded import default_mesh_2d

    params = dataclasses.replace(PARAMS, ny=64, nx=64, max_iters=12)
    obstacles = channel_box(params.nx, params.ny)
    single = Simulator(params, obstacles, kernel="reference").run()
    sim = ShardedSimulator(
        params,
        obstacles,
        mesh=default_mesh_2d(2, 2),
        kernel="temporal",
        interpret=True,
        temporal_split=(8, 2),
    )
    res = sim.run()
    assert sim.chunk(12) == 2  # the temporal path actually ran
    np.testing.assert_allclose(res.f, single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(res.av_vels, single.av_vels, rtol=5e-4)
    # An invalid explicit split propagates (no silent fallback).
    bad = ShardedSimulator(
        params,
        obstacles,
        mesh=default_mesh_2d(2, 2),
        kernel="temporal",
        interpret=True,
        temporal_split=(12, 2),
    )
    with pytest.raises(ValueError, match="does not divide"):
        bad.compiled()


def test_temporal_rejects_bad_explicit_split(eight_devices):
    from lbm_tpu.parallel.sharded import make_sharded_temporal_run

    obstacles = channel_box(PARAMS.nx, 64)
    params = dataclasses.replace(PARAMS, ny=64, max_iters=12)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    with pytest.raises(ValueError, match="does not divide"):
        make_sharded_temporal_run(
            params, obstacles, fcinv, default_mesh(2), by=12, ksteps=2
        )
    with pytest.raises(ValueError, match="K"):
        make_sharded_temporal_run(
            params, obstacles, fcinv, default_mesh(2), by=8, ksteps=7
        )
    # Sub-8 row blocks cannot lower on TPU (Mosaic tiling); without
    # interpret=True that must be a clear ValueError, not a Mosaic error.
    with pytest.raises(ValueError, match="divisible by 8"):
        make_sharded_temporal_run(
            params, obstacles, fcinv, default_mesh(2), by=4, ksteps=2
        )


def test_default_mesh_rejects_oversubscription(eight_devices):
    """Requesting more shards than devices must raise, not silently clamp
    to a smaller mesh (the run would report the wrong topology)."""
    from lbm_tpu.parallel.sharded import default_mesh, default_mesh_2d

    with pytest.raises(ValueError, match="only 8 devices"):
        default_mesh(16)
    with pytest.raises(ValueError, match="only 8 devices"):
        default_mesh_2d(4, 4)
    assert default_mesh(8).shape["y"] == 8


def test_compile_fallback_chain(eight_devices, monkeypatch):
    """A routed kernel variant that fails to COMPILE (the real-TPU VMEM
    overflow case) must fall back temporal -> fused -> jnp and still run
    correctly; an explicitly-requested variant must propagate the error."""
    import jax

    from lbm_tpu.parallel import sharded as sh

    params = dataclasses.replace(PARAMS, ny=32, nx=128, max_iters=8)
    obstacles = channel_box(params.nx, params.ny)
    single = Simulator(params, obstacles, kernel="reference").run()

    class Unlowerable:
        chunk = 4

        def lower(self, *a, **k):
            raise jax.errors.JaxRuntimeError("synthetic VMEM overflow")

    monkeypatch.setattr(
        sh, "make_sharded_temporal_run", lambda *a, **k: Unlowerable()
    )
    monkeypatch.setattr(
        sh, "make_sharded_fused_run", lambda *a, **k: Unlowerable()
    )
    sim = sh.ShardedSimulator(
        params, obstacles, mesh=default_mesh(4), kernel="fused"
    )
    res = sim.run()
    assert sim.chunk(8) == 1  # landed on the jnp per-step path
    np.testing.assert_allclose(res.f, single.f, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(res.av_vels, single.av_vels, rtol=1e-4)

    strict = sh.ShardedSimulator(
        params, obstacles, mesh=default_mesh(4), kernel="temporal"
    )
    with pytest.raises(jax.errors.JaxRuntimeError, match="synthetic"):
        strict.compiled()


def test_rejects_indivisible_grid(eight_devices):
    params = dataclasses.replace(PARAMS, ny=36)
    obstacles = channel_box(params.nx, params.ny)
    with pytest.raises(ValueError, match="not divisible"):
        ShardedSimulator(params, obstacles, mesh=default_mesh(8)).compiled()


def test_rejects_too_thin_shards(eight_devices):
    params = dataclasses.replace(PARAMS, ny=16)
    obstacles = channel_box(params.nx, params.ny)
    with pytest.raises(ValueError, match="3 rows"):
        ShardedSimulator(params, obstacles, mesh=default_mesh(8)).compiled()


def test_no_factory_embeds_the_mask_as_an_hlo_literal(eight_devices):
    """Every sharded factory must pass the fluid/extended mask as a
    runtime operand (_LoweredWithConsts): an embedded dense literal blows
    the remote compile service's request limit at giant grids (HTTP 413
    at 8192^2 — the round-2 mask-as-operand fix, here locked in for ALL
    six paths, not just the temporal ones)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lbm_tpu.parallel.sharded import (
        AXIS,
        AXIS_X,
        default_mesh_2d,
        make_sharded_2d_run,
        make_sharded_fused_2d_run,
        make_sharded_fused_run,
        make_sharded_run,
        make_sharded_temporal_2d_run,
        make_sharded_temporal_run,
    )

    params = dataclasses.replace(PARAMS, ny=64, nx=128, max_iters=4)
    obstacles = channel_box(params.nx, params.ny, interior_row=31)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    mesh, mesh2 = default_mesh(4), default_mesh_2d(2, 2)
    kw = dict(interpret=True)
    cases = [
        (make_sharded_run(params, obstacles, fcinv, mesh), mesh,
         P(None, AXIS, None)),
        (make_sharded_2d_run(params, obstacles, fcinv, mesh2), mesh2,
         P(None, AXIS, AXIS_X)),
        (make_sharded_fused_run(params, obstacles, fcinv, mesh, **kw),
         mesh, P(None, AXIS, None)),
        (make_sharded_fused_2d_run(params, obstacles, fcinv, mesh2, **kw),
         mesh2, P(None, AXIS, AXIS_X)),
        (make_sharded_temporal_run(
            params, obstacles, fcinv, mesh, by=8, ksteps=2, **kw),
         mesh, P(None, AXIS, None)),
        (make_sharded_temporal_2d_run(
            params, obstacles, fcinv, mesh2, by=8, ksteps=2, **kw),
         mesh2, P(None, AXIS, AXIS_X)),
        (make_sharded_temporal_run(
            params, obstacles, fcinv, mesh, by=8, ksteps=2, px=2, **kw),
         mesh, P(None, AXIS, None)),
    ]
    for run, m, spec in cases:
        s = jax.ShapeDtypeStruct(
            (9, params.ny, params.nx), jnp.float32,
            sharding=NamedSharding(m, spec),
        )
        lowered = run.lower(s)
        assert hasattr(lowered, "_consts"), "factory must route consts"
        text = lowered._lowered.as_text()
        # MLIR hex-prints int8/bool literals at ~2 chars per element, so
        # the threshold must be far below elements*chars: an embedded
        # 64x128 int8 mask prints as a ~16k-char dense<"0x..."> line.
        # Legit constants here are splats or tiny index vectors (< 1k).
        big = [ln for ln in text.splitlines()
               if "dense" in ln and len(ln) > 4096]
        assert not big, f"dense mask literal leaked: {big[0][:120]}"


# -- chooser-transfer branch of the degenerate-x 2-D temporal factory -------
# (make_sharded_temporal_2d_run with px == 1: the route decision ranks row
# vs x-tiled at the TRUE slab width (nyl, nx); a row winner transfers to
# the W = nx + 128 padded tile only when its window fits the W-width VMEM
# budget AND no measured cache entry exists for the exact padded shape.)


@pytest.fixture
def routing_cache(tmp_path, monkeypatch):
    """Empty tuning cache in a tmp file so routing tests fully control
    which measured entries exist (the shipped cache has only TPU kinds,
    but keep the tests hermetic against future CPU entries)."""
    path = tmp_path / "cache.json"
    monkeypatch.setenv("LBM_TUNING_CACHE", str(path))
    return path


@pytest.fixture
def kernel_recorder(monkeypatch):
    """Wrap fused.build_temporal_kernel to record (nyl, w, by, ksteps).

    The factory imports it at call time (function-scope import), so
    patching the module attribute intercepts the factory's build."""
    import lbm_tpu.ops.fused as fused

    calls = []
    real = fused.build_temporal_kernel

    def recording(nyl, w, by, ksteps, *args, **kwargs):
        calls.append((nyl, w, by, ksteps))
        return real(nyl, w, by, ksteps, *args, **kwargs)

    monkeypatch.setattr(fused, "build_temporal_kernel", recording)
    return calls


def test_2d_px1_row_winner_transfers_to_padded_tile(
    eight_devices, routing_cache, kernel_recorder
):
    """A measured Px=1 route winner at the true slab width (nyl, nx)
    whose window fits the padded-width budget is adopted verbatim for
    the W = nx + 128 tile (sharded.py chooser-transfer branch)."""
    from lbm_tpu import tuning
    from lbm_tpu.ops.reference import init_cells
    from lbm_tpu.parallel.sharded import (
        default_mesh_2d,
        make_sharded_temporal_2d_run,
    )

    params = dataclasses.replace(PARAMS, ny=64, nx=128, max_iters=8)
    obstacles = channel_box(params.nx, params.ny)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    mesh = default_mesh_2d(2, 1)
    kind = mesh.devices.flat[0].device_kind
    nyl, w = 32, params.nx + 128
    # Without a cache entry neither chooser admits this tiny slab
    # (by_max == nyl kills choose_temporal), so adoption of (16, 2) is
    # unambiguously the transfer branch.
    assert make_sharded_temporal_2d_run(
        params, obstacles, fcinv, mesh, interpret=True
    ) is None and kernel_recorder == []
    tuning.record(kind, nyl, params.nx, [(16, 2, 1.0)])
    run = make_sharded_temporal_2d_run(
        params, obstacles, fcinv, mesh, interpret=True
    )
    assert run is not None and run.chunk == 2
    assert kernel_recorder == [(nyl, w, 16, 2)]
    # The adopted schedule must still reproduce the physics.
    single = Simulator(params, obstacles, kernel="reference").run()
    f_fin, avs = run(init_cells(params))
    np.testing.assert_allclose(
        np.asarray(f_fin), single.f, rtol=1e-5, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(avs), single.av_vels, rtol=1e-4)


def test_2d_px1_overflowing_winner_falls_through_to_padded_chooser(
    eight_devices, routing_cache, kernel_recorder
):
    """A route winner whose window does NOT fit the padded-width VMEM
    budget is rejected; the factory re-chooses via choose_temporal on the
    padded shape (nyl, W) instead of silently keeping the oversized pick."""
    from lbm_tpu import tuning
    from lbm_tpu.ops.fused import _temporal_tuning, choose_temporal
    from lbm_tpu.parallel.sharded import (
        default_mesh_2d,
        make_sharded_temporal_2d_run,
    )

    params = dataclasses.replace(PARAMS, ny=4096, nx=128, max_iters=16)
    obstacles = channel_box(params.nx, params.ny)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    mesh = default_mesh_2d(2, 1)
    kind = mesh.devices.flat[0].device_kind
    nyl, w = 2048, params.nx + 128
    # (1024, 2) is structurally valid at (2048, 128) but its padded-tile
    # window overflows the W-width budget.
    _, window_budget, _ = _temporal_tuning(w)
    assert (1024 + 2 * 2) * w > window_budget
    tuning.record(kind, nyl, params.nx, [(1024, 2, 1.0)])
    expected = choose_temporal(
        nyl, w, params.max_iters, device_kind=kind
    )
    assert expected is not None and expected != (1024, 2)
    run = make_sharded_temporal_2d_run(
        params, obstacles, fcinv, mesh, interpret=True
    )
    assert run is not None and run.chunk == expected[1]
    assert kernel_recorder == [(nyl, w) + expected]


def test_2d_px1_measured_padded_entry_outranks_transfer(
    eight_devices, routing_cache, kernel_recorder
):
    """A measured cache entry for the EXACT padded shape (nyl, W) — e.g.
    from an autotune sweep of the padded tile — outranks the transferred
    route pick (round-4 advisor finding: the transfer must not shadow a
    real measurement of the shape actually built)."""
    from lbm_tpu import tuning
    from lbm_tpu.parallel.sharded import (
        default_mesh_2d,
        make_sharded_temporal_2d_run,
    )

    params = dataclasses.replace(PARAMS, ny=64, nx=128, max_iters=8)
    obstacles = channel_box(params.nx, params.ny)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    mesh = default_mesh_2d(2, 1)
    kind = mesh.devices.flat[0].device_kind
    nyl, w = 32, params.nx + 128
    tuning.record(kind, nyl, params.nx, [(16, 2, 1.0)])  # route winner
    tuning.record(kind, nyl, w, [(8, 4, 0.5)])  # padded-shape measurement
    run = make_sharded_temporal_2d_run(
        params, obstacles, fcinv, mesh, interpret=True
    )
    assert run is not None and run.chunk == 4
    assert kernel_recorder == [(nyl, w, 8, 4)]
