"""Config layer: .params parsing round-trip + parity with reference inputs."""

import pathlib

import pytest

from lbm_tpu.config import CANONICAL_PARAMS, LBMParams


def test_roundtrip(tmp_path):
    p = LBMParams(128, 256, 40000, 10, 0.1, 0.005, 1.85)
    path = tmp_path / "x.params"
    p.to_file(path)
    assert LBMParams.from_file(path) == p


def test_viscosity():
    p = CANONICAL_PARAMS["128x128"]
    # nu = (2/1.85 - 1)/6
    assert abs(p.viscosity - (2.0 / 1.85 - 1.0) / 6.0) < 1e-12


def test_validation():
    with pytest.raises(ValueError):
        LBMParams(0, 128, 1, 10, 0.1, 0.005, 1.85)
    with pytest.raises(ValueError):
        LBMParams(128, 128, -1, 10, 0.1, 0.005, 1.85)
    # omega outside the BGK stability bound would also divide-by-zero
    # the Reynolds epilogue (nu = 0 at omega = 2)
    with pytest.raises(ValueError, match="omega"):
        LBMParams(128, 128, 1, 10, 0.1, 0.005, 2.0)
    with pytest.raises(ValueError, match="omega"):
        LBMParams(128, 128, 1, 10, 0.1, 0.005, 0.0)
    with pytest.raises(ValueError, match="density"):
        LBMParams(128, 128, 1, 10, 0.0, 0.005, 1.85)


def test_from_file_rejects_extra_values(tmp_path):
    path = tmp_path / "bad.params"
    path.write_text("128\n128\n100\n10\n0.1\n0.005\n1.85\n42\n")
    with pytest.raises(ValueError, match="exactly 7"):
        LBMParams.from_file(path)


@pytest.mark.parametrize("case", sorted(CANONICAL_PARAMS))
def test_matches_reference_inputs(case, reference_dir):
    """CANONICAL_PARAMS must equal the shipped input_*.params files."""
    got = LBMParams.from_file(reference_dir / f"input_{case}.params")
    assert got == CANONICAL_PARAMS[case]


def test_canonical_values():
    p = CANONICAL_PARAMS["1024x1024"]
    assert (p.nx, p.ny, p.max_iters) == (1024, 1024, 20000)
    assert (p.density, p.accel, p.omega) == (0.1, 0.01, 1.85)
