"""Fused Pallas kernel vs the jnp reference path (interpret mode on CPU).

The two paths compute structurally identical math; they may differ only by
compiler FMA-contraction choices, so agreement is asserted to ~1 ulp
(rtol 1e-6), far inside the checker's 1% physics tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import LBMParams
from lbm_tpu.geometry import channel_box, free_cells_of
from lbm_tpu.ops.fused import (
    build_fused_program,
    choose_block_rows,
    make_fused_step_fn,
)
from lbm_tpu.ops.reference import init_cells, make_step_fn


def _compare(params, obstacles, by, steps=5):
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_fused_program(params, obstacles, fcinv, by, interpret=True)
    fus = jax.jit(program.single())

    f = g = init_cells(params)
    for _ in range(steps):
        f, av_ref = ref(f)
        g, av_fus = fus(g)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(g), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(float(av_ref), float(av_fus), rtol=1e-5)


def test_single_block_variant():
    """Grid fits in one program (P=1): in-block periodic wrap path."""
    params = LBMParams(128, 16, 5, 10, 0.1, 0.005, 1.85)
    _compare(params, channel_box(128, 16), by=16)


def test_row_blocked_variant():
    """Multi-program path with pre-gathered ghost rows; the body-force row
    ny-2 sits in the last block and is read across the block boundary."""
    params = LBMParams(128, 16, 5, 10, 0.1, 0.01, 1.85)
    _compare(params, channel_box(128, 16), by=4)


def test_blocked_with_interior_wall():
    """Obstacles spanning block boundaries bounce back correctly."""
    params = LBMParams(128, 16, 4, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 16, interior_row=7)
    _compare(params, obstacles, by=4, steps=4)


def test_ghost_roundtrip_carry():
    """The blocked kernel emits next-step ghost rows as outputs routed to
    neighbor slots; thread the carry across steps (as the scan driver does)
    and compare against the jnp path."""
    params = LBMParams(128, 16, 6, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(128, 16, interior_row=5)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_fused_program(params, obstacles, fcinv, 4, interpret=True)
    step = jax.jit(program.step)

    f = init_cells(params)
    carry = program.init(f)
    for _ in range(6):
        f, av_ref = ref(f)
        carry, av_fus = step(carry)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(program.final(carry)), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(float(av_ref), float(av_fus), rtol=1e-5)


def test_multi_step_kernel():
    """Whole-grid multi-step kernel (time loop inside the kernel) matches
    the per-step jnp path, including the per-step av series."""
    from lbm_tpu.ops.fused import build_multi_step_program

    params = LBMParams(128, 16, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_multi_step_program(params, obstacles, fcinv, 4, interpret=True)
    assert program.chunk == 4
    step = jax.jit(program.step)

    f_ref = init_cells(params)
    avs_ref = []
    for _ in range(8):
        f_ref, av = ref(f_ref)
        avs_ref.append(float(av))
    carry = program.init(init_cells(params))
    carry, avs1 = step(carry)
    carry, avs2 = step(carry)
    avs = np.concatenate([np.asarray(avs1), np.asarray(avs2)])
    np.testing.assert_allclose(
        np.asarray(f_ref), np.asarray(program.final(carry)), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(avs, np.asarray(avs_ref), rtol=1e-5)


def test_temporal_blocking():
    """Trapezoidal K-steps-per-launch blocked kernel vs the jnp path,
    including av series, body-force rows in both gated windows, and an
    interior wall crossing block boundaries."""
    from lbm_tpu.ops.fused import build_temporal_program

    params = LBMParams(128, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(128, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_temporal_program(
        params, obstacles, fcinv, by=4, ksteps=2, interpret=True
    )
    assert program.chunk == 2
    step = jax.jit(program.step)

    f_ref = init_cells(params)
    carry = program.init(f_ref)
    avs_ref, avs_fus = [], []
    for _ in range(4):
        carry, avs = step(carry)
        avs_fus.append(np.asarray(avs))
    for _ in range(8):
        f_ref, av = ref(f_ref)
        avs_ref.append(float(av))
    np.testing.assert_allclose(
        np.asarray(f_ref),
        np.asarray(program.final(carry)),
        rtol=1e-5,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.concatenate(avs_fus), np.asarray(avs_ref), rtol=1e-5
    )


@pytest.mark.medium
def test_temporal_fp16_storage():
    """16-bit HBM residency for the temporal carry (fp32 in-kernel
    compute): the short-horizon trajectory must track the fp32 path
    within fp16 quantization (~1e-3 relative per store, compounding
    slowly), the carry leaves must actually BE 16-bit, and the fp32
    default must be bit-identical to the pre-storage-parameter kernel
    (covered by test_temporal_blocking).  Long-horizon drift is a
    hardware experiment (docs/PERF.md round 4)."""
    from lbm_tpu.ops.fused import build_temporal_program

    params = LBMParams(128, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(128, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_temporal_program(
        params, obstacles, fcinv, by=4, ksteps=2, interpret=True,
        storage=jnp.float16,
    )
    step = jax.jit(program.step)
    f_ref = init_cells(params)
    carry = program.init(f_ref)
    assert carry[0].dtype == jnp.float16
    assert carry[1].dtype == jnp.float16 and carry[2].dtype == jnp.float16
    avs_ref, avs_16 = [], []
    for _ in range(4):
        carry, avs = step(carry)
        avs_16.append(np.asarray(avs))
    for _ in range(8):
        f_ref, av = ref(f_ref)
        avs_ref.append(float(av))
    f16 = np.asarray(program.final(carry))
    assert f16.dtype == np.float32  # final() widens for the readback path
    np.testing.assert_allclose(
        np.asarray(f_ref), f16, rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.concatenate(avs_16), np.asarray(avs_ref), rtol=2e-2, atol=1e-6
    )


@pytest.mark.medium
def test_temporal_blocking_k4():
    """Deeper time blocks (K=4 on BY=8) still match.  (Medium:
    test_temporal_blocking is the fast-tier representative; random
    (BY, K) splits are swept in tests/test_randomized.py.)"""
    from lbm_tpu.ops.fused import build_temporal_program

    params = LBMParams(128, 16, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 16)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_temporal_program(
        params, obstacles, fcinv, by=8, ksteps=4, interpret=True
    )
    step = jax.jit(program.step)
    f_ref = init_cells(params)
    carry = program.init(f_ref)
    for _ in range(2):
        carry, _ = step(carry)
    for _ in range(8):
        f_ref, _ = ref(f_ref)
    np.testing.assert_allclose(
        np.asarray(f_ref),
        np.asarray(program.final(carry)),
        rtol=1e-5,
        atol=1e-9,
    )


def test_temporal_xtiled():
    """Single-chip x-tiled temporal schedule (column strips + row blocks,
    K steps per pass) vs the jnp path: interior wall crossing row-block
    boundaries, kick row in the gated windows, several passes so the
    jnp x-halo patch executes repeatedly."""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program

    params = LBMParams(64, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(64, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=4, ksteps=2, px=4, interpret=True
    )
    assert program.chunk == 2
    step = jax.jit(program.step)

    f_ref = init_cells(params)
    carry = program.init(f_ref)
    avs_fus = []
    for _ in range(4):
        carry, avs = step(carry)
        avs_fus.append(np.asarray(avs))
    avs_ref = []
    for _ in range(8):
        f_ref, av = ref(f_ref)
        avs_ref.append(float(av))
    np.testing.assert_allclose(
        np.asarray(f_ref),
        np.asarray(program.final(carry)),
        rtol=1e-5,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.concatenate(avs_fus), np.asarray(avs_ref), rtol=1e-5
    )


@pytest.mark.medium
def test_temporal_xtiled_k4_random_geometry():
    """Deeper K with randomized obstacles spanning strip boundaries; the
    consts path (maskext as runtime argument) is exercised too.
    (Medium: test_temporal_xtiled and the x-tiled golden prefix cover
    the schedule in the fast tier.)"""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program

    rng = np.random.default_rng(7)
    params = LBMParams(96, 24, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(96, 24)
    interior = rng.random((24, 96)) < 0.1
    interior[0, :] = interior[-1, :] = False
    interior[22, :] = False  # keep the kick row itself clear
    obstacles = obstacles | interior
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    program = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=6, ksteps=4, px=2, interpret=True
    )
    assert len(program.consts) == 1
    step = jax.jit(program.step)
    f_ref = init_cells(params)
    carry = program.init(f_ref, jnp.asarray(program.consts[0]))
    for _ in range(2):
        carry, _ = step(carry)
    for _ in range(8):
        f_ref, _ = ref(f_ref)
    np.testing.assert_allclose(
        np.asarray(f_ref),
        np.asarray(program.final(carry)),
        rtol=1e-5,
        atol=1e-9,
    )


def test_temporal_xtiled_final_fields_matches_raw_fields():
    """``final_fields`` (the per-strip fields payload that keeps 16384²
    fields readback inside HBM) must equal composing the generic
    ``raw_fields_fn`` on the un-tiled ``final(carry)`` — same math, the
    carry's strip-major layout, the carried maskext as the fluid mask."""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program
    from lbm_tpu.runtime import raw_fields_fn

    params = LBMParams(64, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(64, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    program = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=4, ksteps=2, px=4, interpret=True
    )
    assert program.final_fields is not None
    step = jax.jit(program.step)
    carry = program.init(init_cells(params))
    for _ in range(3):
        carry, _ = step(carry)
    via_f = raw_fields_fn(params, obstacles)(program.final(carry))
    direct = program.final_fields(carry)
    assert direct.dtype == jnp.float16 and direct.shape == (3, 16, 64)
    np.testing.assert_array_equal(np.asarray(via_f), np.asarray(direct))


def test_temporal_xtiled_init0_matches_init():
    """``init0`` (the no-f0-argument uniform-carry builder that unlocks
    giant grids) must produce the same owned state and av stream as
    ``init(init_cells(...))`` — dead/pad lanes are the only permitted
    difference (weights vs zeros; never read by owned outputs)."""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program

    params = LBMParams(64, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(64, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    program = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=4, ksteps=2, px=4, interpret=True
    )
    assert program.init0 is not None
    step = jax.jit(program.step)

    carry_a = program.init(init_cells(params))
    carry_b = program.init0()
    avs_a, avs_b = [], []
    for _ in range(4):
        carry_a, av_a = step(carry_a)
        carry_b, av_b = step(carry_b)
        avs_a.append(np.asarray(av_a))
        avs_b.append(np.asarray(av_b))
    np.testing.assert_array_equal(
        np.asarray(program.final(carry_a)),
        np.asarray(program.final(carry_b)),
    )
    np.testing.assert_array_equal(
        np.concatenate(avs_a), np.concatenate(avs_b)
    )


def test_temporal_xtiled_init0_leaves_are_distinct_buffers():
    """Every leaf of the eager ``init0()`` carry must own a distinct
    device buffer.  The original ``(fs, ghost, ghost, xedge, xedge, m)``
    returned the SAME array object in two slots; a caller that donates
    the carry (the autotuner's timing scan, ``tuning.py``) then donates
    one buffer twice, which the TPU runtime rejects at dispatch with an
    opaque INVALID_ARGUMENT — this failed on hardware at every grid size
    and was misdiagnosed as a giant-grid capacity ceiling."""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program

    params = LBMParams(64, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(64, 16)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    program = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=4, ksteps=2, px=4, interpret=True
    )
    leaves = jax.tree.leaves(program.init0())
    ptrs = [x.unsafe_buffer_pointer() for x in leaves]
    assert len(set(ptrs)) == len(ptrs), (
        "init0 carry leaves share device buffers (double-donation hazard)"
    )


def test_temporal_xtiled_validation():
    from lbm_tpu.ops.fused import build_temporal_xtiled_program

    params = LBMParams(64, 16, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(64, 16)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    with pytest.raises(ValueError, match="px"):
        build_temporal_xtiled_program(
            params, obstacles, fcinv, by=4, ksteps=2, px=3, interpret=True
        )
    with pytest.raises(ValueError, match="px >= 2"):
        build_temporal_xtiled_program(
            params, obstacles, fcinv, by=4, ksteps=2, px=1, interpret=True
        )
    with pytest.raises(ValueError, match="lane-aligned"):
        build_temporal_xtiled_program(
            params, obstacles, fcinv, by=4, ksteps=2, px=2
        )


def test_choose_temporal_xtiled():
    from lbm_tpu.ops.fused import choose_temporal_xtiled

    # 8192^2: strips restore (BY=128, K=4) vs row-only (32, 4)
    assert choose_temporal_xtiled(8192, 8192, 20000) == (128, 4, 4)
    # narrower grids keep the plain row-blocked schedule
    assert choose_temporal_xtiled(4096, 4096, 2000) is None
    assert choose_temporal_xtiled(1024, 1024, 20000) is None
    # Non-power-of-two divisor lattice (VERDICT r3 weak 3): 10240 picks
    # Px=5 (BX=2048, BY=128); 12800 picks Px=10 (BX=1280) because the
    # wider BX=2560 strip caps BY at 64 under the VMEM window budget —
    # the window-waste score model, hardware-confirmed at 19.0 vs 18.3
    # GLUPS (docs/PERF.md round-4 spot checks).
    by, k, px = choose_temporal_xtiled(10240, 10240, 20000)
    assert px == 5 and 10240 % px == 0 and (10240 // px) % 128 == 0
    assert 2 <= k <= by - 2 and 10240 % by == 0
    by, k, px = choose_temporal_xtiled(12800, 12800, 20000)
    assert (by, px) == (128, 10) and (12800 // px) == 1280
    # A width with no lane-aligned strip divisor declines.
    assert choose_temporal_xtiled(8192, 8200, 20000) is None


@pytest.mark.medium
def test_megakernel():
    """Manual-DMA megakernel (T K-passes per pallas_call, interpret mode):
    must reproduce the jnp reference step across call boundaries, incl.
    the in-place HBM aliasing across passes and the parity-buffered ghost
    state.  (Medium: the megakernel is a study variant;
    test_megakernel_body_force_wrap + test_make_program_mega_routing are
    the fast-tier representatives, and its golden prefix runs in the
    medium tier.)"""
    from lbm_tpu.ops.fused import build_mega_program

    params = LBMParams(128, 32, 24, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 32, interior_row=13)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    f = init_cells(params)
    ref_avs = []
    for _ in range(24):
        f, av = ref(f)
        ref_avs.append(float(av))

    for tpasses in (1, 3):
        prog = build_mega_program(
            params, obstacles, fcinv, by=8, ksteps=4, tpasses=tpasses,
            interpret=True,
        )
        carry = prog.init(jnp.asarray(init_cells(params)))
        avs = []
        for _ in range(24 // prog.chunk):
            carry, av = prog.step(carry)
            avs.append(np.asarray(av))
        # temporal-window algebra reorders FMA chains vs the plain step
        np.testing.assert_allclose(
            np.asarray(prog.final(carry)), np.asarray(f), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.concatenate(avs), np.asarray(ref_avs), rtol=1e-4
        )


def test_megakernel_body_force_wrap():
    """Kick row at the wrap boundary (block 0's south halo) with the
    accel=0.01 physics of the 1024^2 case."""
    from lbm_tpu.ops.fused import build_mega_program

    params = LBMParams(128, 24, 12, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(128, 24)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    f = init_cells(params)
    for _ in range(12):
        f, _ = ref(f)
    prog = build_mega_program(
        params, obstacles, fcinv, by=4, ksteps=2, tpasses=2, interpret=True
    )
    carry = prog.init(jnp.asarray(init_cells(params)))
    for _ in range(12 // prog.chunk):
        carry, _ = prog.step(carry)
    np.testing.assert_allclose(
        np.asarray(prog.final(carry)), np.asarray(f), rtol=1e-5, atol=1e-7
    )


def test_make_program_mega_routing():
    """kernel='mega' picks a (BY, K, T) split with chunk | max_iters and
    falls back to fused without max_iters."""
    from lbm_tpu.runtime import make_program

    params = LBMParams(1024, 1024, 20000, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(1024, 1024)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    prog = make_program(params, obstacles, fcinv, "mega", max_iters=20000)
    assert prog.chunk % 8 == 0 and 20000 % prog.chunk == 0
    assert prog.chunk > 8  # a multi-pass megakernel, not plain temporal
    fallback = make_program(params, obstacles, fcinv, "mega")
    assert fallback.chunk == 1  # fused single-step path


def test_pick_chunk():
    from lbm_tpu.ops.fused import pick_chunk

    # multiples of 8 preferred: the multi-step kernel unrolls gcd(chunk, 8)
    assert pick_chunk(40000) == 200
    assert pick_chunk(20000) == 200
    assert pick_chunk(80000) == 200
    assert pick_chunk(2048) == 256
    assert pick_chunk(250) == 250  # no multiple-of-8 divisor: largest wins
    assert pick_chunk(7) == 7
    assert pick_chunk(1) == 1
    assert pick_chunk(997) == 1  # prime > limit


def test_choose_block_rows():
    assert choose_block_rows(1024, 1024) == 128
    assert choose_block_rows(256, 256) == 256  # whole grid in one program
    assert choose_block_rows(128, 128) == 128
    assert choose_block_rows(256, 128) == 256
    assert choose_block_rows(7, 96) is None  # no power-of-two split


def test_choose_temporal():
    from lbm_tpu.ops.fused import choose_temporal

    assert choose_temporal(1024, 1024, 20000) == (128, 8)
    # wide grids: bigger window + shallow K (measured 19.8 vs 13.4 GLUPS
    # for the old (32, 8) pick at 4096^2)
    assert choose_temporal(4096, 4096, 2000) == (64, 4)
    assert choose_temporal(512, 4096, 2000) == (64, 4)  # 8-shard local slab
    assert choose_temporal(2048, 2048, 2000) == (128, 4)
    assert choose_temporal(256, 256, 1000) is None  # whole grid -> multi-step


def test_temporal_program_validates_explicit_split():
    """Explicit (BY, K) must be rejected with clear errors: sub-8 row
    blocks can't lower on TPU (Mosaic tiling; allowed only under
    interpret=True for tests), and a BY that doesn't divide ny would
    leave trailing rows un-advanced."""
    from lbm_tpu.ops.fused import build_temporal_program

    params = LBMParams(128, 32, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 32)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    with pytest.raises(ValueError, match="divisible by 8"):
        build_temporal_program(params, obstacles, fcinv, by=4, ksteps=2)
    with pytest.raises(ValueError, match="does not divide"):
        build_temporal_program(
            params, obstacles, fcinv, by=12, ksteps=2, interpret=True
        )
    # The same (BY=4, K=2) split IS allowed in interpret mode.
    prog = build_temporal_program(
        params, obstacles, fcinv, by=4, ksteps=2, interpret=True
    )
    assert prog.chunk == 2


def test_fallback_on_odd_grid():
    """Non-power-of-two ny must transparently use the jnp path — and
    actually COMPUTE the physics (not just return something finite)."""
    params = LBMParams(96, 7, 3, 10, 0.1, 0.005, 1.85)
    obstacles = np.zeros((7, 96), dtype=bool)
    fcinv = np.float32(1.0 / obstacles.size)
    step = make_fused_step_fn(params, obstacles, fcinv, interpret=True)
    f = init_cells(params)
    f2, av = jax.jit(step)(f)
    ref_step = make_step_fn(params, obstacles, fcinv)
    f2_ref, av_ref = jax.jit(ref_step)(init_cells(params))
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f2_ref))
    np.testing.assert_array_equal(np.asarray(av), np.asarray(av_ref))


def test_simulator_fields_readback_uses_final_fields(monkeypatch):
    """The runtime's fields-readback branch must route through
    final_fields when the program provides it (the giant-grid path is
    exercised here end-to-end on an interpret miniature: Simulator.run
    -> _build emit -> per-strip payload -> expand_fields)."""
    import dataclasses

    from lbm_tpu import runtime
    from lbm_tpu.ops.fused import build_temporal_xtiled_program
    from lbm_tpu.runtime import Simulator

    params = LBMParams(64, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(64, 16, interior_row=9)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    # The genuinely-jnp reference run happens BEFORE the monkeypatch —
    # with it active, the "reference" Simulator would route through the
    # same x-tiled program and the comparison would be vacuous.
    ref = Simulator(params, obstacles, kernel="reference").run(
        readback="fields"
    )
    prog = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=4, ksteps=2, px=4, interpret=True
    )
    calls = []
    orig = prog.final_fields

    def spy(carry):
        calls.append(1)
        return orig(carry)

    object.__setattr__(prog, "final_fields", spy)  # frozen dataclass
    monkeypatch.setattr(runtime, "make_program", lambda *a, **k: prog)
    sim = Simulator(params, obstacles, kernel="fused")
    res = sim.run(readback="fields")
    assert calls, "final_fields was not routed by the fields readback"
    assert res.fields is not None and res.f is None
    np.testing.assert_allclose(res.fields, ref.fields, rtol=2e-3, atol=1e-6)


def test_xtiled_checkpoint_io_roundtrip_random():
    """from_f_host -> to_f_host must be a bitwise identity on arbitrary
    f (pure relayout, no arithmetic) — the property the portable
    f-format snapshots rely on."""
    from lbm_tpu.ops.fused import build_temporal_xtiled_program

    rng = np.random.default_rng(3)
    params = LBMParams(64, 16, 8, 10, 0.1, 0.01, 1.85)
    obstacles = channel_box(64, 16)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    prog = build_temporal_xtiled_program(
        params, obstacles, fcinv, by=4, ksteps=2, px=4, interpret=True
    )
    f = rng.standard_normal((9, 16, 64)).astype(np.float32)
    io = prog.checkpoint_io
    np.testing.assert_array_equal(io.to_f_host(io.from_f_host(f)), f)


def _big_dense_lines(text, threshold=4096):
    # MLIR hex-prints int8/bool literals at ~2 chars/element; legit
    # constants (splats, index vectors) stay far under the threshold.
    return [
        ln for ln in text.splitlines() if "dense" in ln and len(ln) > threshold
    ]


def test_single_chip_run_program_routes_masks_as_operands():
    """The full single-chip run program (every fallback level, both
    readback modes) must not embed any [ny, nx]-sized mask as an HLO
    literal — the fields payload's fluid mask and the jnp reference
    path's obstacle mask included (the mask-literal rule: an embedded
    literal blows the remote compile service's request limit at giant
    grids, HTTP 413 at 8192²)."""
    from lbm_tpu.runtime import Simulator

    params = LBMParams(128, 64, 4, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 64, interior_row=31)
    sim = Simulator(params, obstacles, kernel="reference")
    f_spec = jax.ShapeDtypeStruct((9, 64, 128), jnp.float32)
    for readback in ("state", "fields"):
        for level in (0, 2):
            fn = sim._build(4, fallback_level=level, readback=readback)
            cspecs = [
                jax.ShapeDtypeStruct(np.asarray(c).shape, np.asarray(c).dtype)
                for c in fn.consts
            ]
            text = fn.lower(f_spec, *cspecs).as_text()
            big = _big_dense_lines(text)
            assert not big, (
                f"{readback}/level{level} leaked a dense mask literal: "
                f"{big[0][:120]}"
            )


def test_multi_step_program_routes_mask_as_const():
    """The multi-step program routes its fluid mask through
    StepProgram.consts (runtime operand) like every sibling schedule —
    no dense mask literal in the lowered HLO — and the const-fed carry
    agrees with the embed-default path."""
    from lbm_tpu.ops.fused import build_multi_step_program

    params = LBMParams(128, 32, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 32, interior_row=13)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    prog = build_multi_step_program(params, obstacles, fcinv, 4, interpret=True)
    assert prog.consts, "multi-step program must expose its mask as a const"
    mask = prog.consts[0]
    f0 = init_cells(params)

    def run1(f, m):
        carry, av = prog.step(prog.init(f, m))
        return prog.final(carry), av

    m_spec = jax.ShapeDtypeStruct(mask.shape, mask.dtype)
    f_spec = jax.ShapeDtypeStruct(f0.shape, f0.dtype)
    text = jax.jit(run1).lower(f_spec, m_spec).as_text()
    big = _big_dense_lines(text)
    assert not big, f"multi-step leaked a dense mask literal: {big[0][:120]}"

    f_const, av_const = jax.jit(run1)(f0, jnp.asarray(mask))
    carry, av_embed = prog.step(prog.init(init_cells(params)))
    np.testing.assert_array_equal(
        np.asarray(f_const), np.asarray(prog.final(carry))
    )
    np.testing.assert_array_equal(np.asarray(av_const), np.asarray(av_embed))


@pytest.mark.medium
def test_mega_program_routes_mask_as_const():
    """The megakernel program must route its extended mask through
    StepProgram.consts (runtime operand), and the const-fed carry must
    agree with the embed-default path.  (Medium: the HLO-literal
    invariant for every PRODUCTION path stays fast-tier in
    test_no_factory_embeds_the_mask_as_an_hlo_literal.)"""
    from lbm_tpu.ops.fused import build_mega_program

    params = LBMParams(128, 32, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 32, interior_row=13)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    prog = build_mega_program(
        params, obstacles, fcinv, by=8, ksteps=4, tpasses=1, interpret=True
    )
    assert prog.consts, "mega program must expose its mask as a const"
    maskext = prog.consts[0]
    f0 = init_cells(params)

    def run1(f, m):
        carry, av = prog.step(prog.init(f, m))
        return prog.final(carry), av

    m_spec = jax.ShapeDtypeStruct(maskext.shape, maskext.dtype)
    f_spec = jax.ShapeDtypeStruct(f0.shape, f0.dtype)
    text = jax.jit(run1).lower(f_spec, m_spec).as_text()
    big = _big_dense_lines(text)
    assert not big, f"mega leaked a dense mask literal: {big[0][:120]}"

    f_const, av_const = jax.jit(run1)(f0, jnp.asarray(maskext))
    carry = prog.init(init_cells(params))  # embed-default path
    carry, av_embed = prog.step(carry)
    np.testing.assert_array_equal(np.asarray(f_const), np.asarray(prog.final(carry)))
    np.testing.assert_array_equal(np.asarray(av_const), np.asarray(av_embed))


@pytest.mark.medium
def test_megakernel_two_blocks_ring2():
    """grid_p == 2 forces the 2-slot staging ring (the 3-slot ring's
    in-place disjointness proof needs P >= ring); must still match the
    reference step."""
    from lbm_tpu.ops.fused import build_mega_program

    params = LBMParams(128, 32, 8, 10, 0.1, 0.005, 1.85)
    obstacles = channel_box(128, 32, interior_row=13)
    fcinv = np.float32(1.0 / free_cells_of(obstacles))
    ref = jax.jit(make_step_fn(params, obstacles, fcinv))
    f = init_cells(params)
    for _ in range(8):
        f, _ = ref(f)
    prog = build_mega_program(
        params, obstacles, fcinv, by=16, ksteps=4, tpasses=2, interpret=True
    )
    carry = prog.init(jnp.asarray(init_cells(params)))
    for _ in range(8 // prog.chunk):
        carry, _ = prog.step(carry)
    np.testing.assert_allclose(
        np.asarray(prog.final(carry)), np.asarray(f), rtol=1e-5, atol=1e-7
    )
