"""Obstacle geometry: loader behavior + generator parity with reference."""

import numpy as np
import pytest

from lbm_tpu.geometry import (
    canonical_obstacles,
    free_cells_of,
    load_obstacle_file,
    write_obstacle_file,
)

CASES = {
    "128x128": (128, 128, 15876),
    "128x256": (128, 256, 32130),
    "256x256": (256, 256, 64516),
    "1024x1024": (1024, 1024, 1043462),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_generator_matches_reference(case, reference_dir):
    nx, ny, free = CASES[case]
    ref_mask, ref_free = load_obstacle_file(
        reference_dir / f"obstacles_{case}.dat", nx, ny
    )
    gen = canonical_obstacles(case)
    assert (ref_mask == gen).all()
    assert ref_free == free == free_cells_of(gen)


def test_duplicates_counted_once(tmp_path):
    """The reference guards duplicate triplets (d2q9-bgk.c:583-585)."""
    path = tmp_path / "obs.dat"
    path.write_text("0 0 1\n0 0 1\n1 1 1\n")
    mask, free = load_obstacle_file(path, 4, 4)
    assert mask.sum() == 2
    assert free == 14


def test_loader_validation(tmp_path):
    path = tmp_path / "obs.dat"
    path.write_text("9 0 1\n")
    with pytest.raises(ValueError, match="x-coord"):
        load_obstacle_file(path, 4, 4)
    path.write_text("0 9 1\n")
    with pytest.raises(ValueError, match="y-coord"):
        load_obstacle_file(path, 4, 4)
    path.write_text("0 0 2\n")
    with pytest.raises(ValueError, match="blocked"):
        load_obstacle_file(path, 4, 4)
    # Malformed line structure must error in BOTH parsers (the native
    # fscanf version used to silently re-group values across lines).
    path.write_text("0 0\n1 1 1 1\n")
    with pytest.raises(ValueError, match="3 values"):
        load_obstacle_file(path, 4, 4)


def test_native_python_parser_parity(tmp_path):
    """When the native extension is built, it must accept/reject exactly
    what the pure-Python fallback does and produce the same mask."""
    from lbm_tpu import geometry

    if geometry._lbmio is None:
        pytest.skip("native extension not built")

    def python_parse(path, nx, ny):
        saved = geometry._lbmio
        geometry._lbmio = None
        try:
            return load_obstacle_file(path, nx, ny)
        finally:
            geometry._lbmio = saved

    cases = [
        "0 0 1\n1 1 1\n\n  \n2 3 1\n",   # valid with blank lines
        "0 0 1\n0 0 1\n",                 # duplicates
        "0 0\n1 1 1 1\n",                 # malformed split
        "1 1 1 9\n",                      # extra token
        "0 0 2\n",                        # bad blocked value
        # Lines longer than the native parser's initial 256-byte read
        # buffer (it grows to the full line): wide column formatting must
        # parse identically in both parsers — including a token that lies
        # entirely past the initial buffer — and the native parser must
        # never split a long line into fragments.
        "0 0 1" + " " * 400 + "\n1 1 1\n",
        "0 0" + " " * 400 + "1\n",
        "1 1 1" + " " * 400 + "9\n",
        "1 1 " + "1" * 400 + "\n",
        "1 1" + " " * 400 + "2\n",
    ]
    for text in cases:
        path = tmp_path / "obs.dat"
        path.write_text(text)
        try:
            native = load_obstacle_file(path, 4, 4)
        except ValueError:
            native = "error"
        try:
            fallback = python_parse(path, 4, 4)
        except ValueError:
            fallback = "error"
        if native == "error" or fallback == "error":
            assert native == fallback, (text, native, fallback)
        else:
            np.testing.assert_array_equal(native[0], fallback[0])
            assert native[1] == fallback[1]


def test_write_roundtrip(tmp_path):
    mask = canonical_obstacles("128x128")
    path = tmp_path / "obs.dat"
    write_obstacle_file(path, mask)
    again, _ = load_obstacle_file(path, 128, 128)
    assert (mask == again).all()
