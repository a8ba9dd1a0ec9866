"""Checkpoint / resume (aux subsystem the reference lacks — SURVEY §5.4).

A reference run is atomic: init → N steps → write once; a crashed 80k-step
run restarts from zero.  Here a run can snapshot the full resumable state —
the distribution array ``f`` (which *is* the complete physical state), the
step index, and the av_vels collected so far — and continue from it.

Format: a single ``.npz`` (portable, no framework dependency) plus a JSON
header with the params and an obstacle-mask digest so a resume against the
wrong case fails loudly.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import pathlib

import numpy as np

from lbm_tpu.config import LBMParams

FILENAME = "lbm_checkpoint.npz"


def _mask_digest(obstacles: np.ndarray) -> str:
    return hashlib.sha256(np.packbits(np.asarray(obstacles, bool))).hexdigest()


@dataclasses.dataclass(frozen=True)
class Checkpoint:
    params: LBMParams
    step: int  # timesteps already completed
    f: np.ndarray  # [9, ny, nx] float32
    av_vels: np.ndarray  # [step] float32
    mask_digest: str

    def validate(self, params: LBMParams, obstacles: np.ndarray) -> None:
        if (params.nx, params.ny) != (self.params.nx, self.params.ny):
            raise ValueError(
                f"checkpoint grid {self.params.shape} != run grid {params.shape}"
            )
        # Physics must match too, or a resume silently splices two different
        # simulations into one trajectory (max_iters/reynolds_dim may differ:
        # they don't enter the dynamics).
        for field in ("density", "accel", "omega"):
            stored, now = getattr(self.params, field), getattr(params, field)
            if stored != now:
                raise ValueError(
                    f"checkpoint {field}={stored} != this run's {field}={now}"
                )
        if _mask_digest(obstacles) != self.mask_digest:
            raise ValueError("checkpoint obstacle mask differs from this run's")


def save(
    directory: str | pathlib.Path,
    params: LBMParams,
    obstacles: np.ndarray,
    step: int,
    f: np.ndarray,
    av_vels: np.ndarray,
) -> pathlib.Path:
    """Atomically write a checkpoint into ``directory``."""
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / FILENAME
    tmp = path.with_suffix(".tmp.npz")
    header = json.dumps(
        {
            "params": dataclasses.asdict(params),
            "step": int(step),
            "mask_digest": _mask_digest(obstacles),
            "version": 1,
        }
    )
    with open(tmp, "wb") as fp:
        np.savez(
            fp,
            header=np.frombuffer(header.encode(), dtype=np.uint8),
            f=np.asarray(f, np.float32),
            av_vels=np.asarray(av_vels[: int(step)], np.float32),
        )
    tmp.replace(path)
    return path


def load(directory: str | pathlib.Path) -> Checkpoint | None:
    """Load the checkpoint in ``directory``, or None if absent."""
    path = pathlib.Path(directory) / FILENAME
    if not path.exists():
        return None
    with np.load(path) as data:
        header = json.loads(bytes(data["header"]).decode())
        if header.get("version") != 1:
            raise ValueError(f"unsupported checkpoint version in {path}")
        return Checkpoint(
            params=LBMParams(**header["params"]),
            step=int(header["step"]),
            f=data["f"],
            av_vels=data["av_vels"],
            mask_digest=header["mask_digest"],
        )
