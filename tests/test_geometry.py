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


def test_write_roundtrip(tmp_path):
    mask = canonical_obstacles("128x128")
    path = tmp_path / "obs.dat"
    write_obstacle_file(path, mask)
    again, _ = load_obstacle_file(path, 128, 128)
    assert (mask == again).all()
