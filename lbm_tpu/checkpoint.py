"""Checkpoint / resume (aux subsystem the reference lacks — SURVEY §5.4).

A reference run is atomic: init → N steps → write once; a crashed 80k-step
run restarts from zero.  Here a run can snapshot the full resumable state —
the distribution array ``f`` (which *is* the complete physical state), the
step index, and the av_vels collected so far — and continue from it.

Two on-disk layouts:

* **v1 (single-chip)**: one ``.npz`` (portable, no framework dependency)
  with a JSON header carrying the params and an obstacle-mask digest so a
  resume against the wrong case fails loudly.
* **v2 (sharded)**: one ``.npz`` per device shard — written straight from
  ``jax.Array.addressable_shards``, never materializing the gathered
  global array — plus ``lbm_checkpoint.av.npz`` and a meta JSON written
  LAST as the commit point.  Shard files are step-stamped, so a crash
  mid-snapshot leaves the previous complete set referenced by the old
  meta; stale-step files are pruned after the meta commits.  On a
  multi-host (multi-process) mesh each process writes ONLY its local
  shards (the reason per-shard beats a global gather at 8192², where the
  gathered snapshot is 2.4 GB); shard filenames are keyed by global
  (y0, x0) offset so they are process-collision-free, and process 0
  commits a meta whose shard list is derived from the GLOBAL sharding
  layout (no cross-host data motion) after a barrier — validated
  end-to-end by ``tools/multihost_smoke.py`` on a real 2-process CPU
  mesh.  Resume reassembles the global array on host (every process
  reads the shared directory) and re-shards to whatever mesh the
  resuming run uses (cross-mesh resume).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import pathlib

import numpy as np

from lbm_tpu.config import LBMParams

FILENAME = "lbm_checkpoint.npz"
META_FILENAME = "lbm_checkpoint.meta.json"
AV_FILENAME = "lbm_checkpoint.av.npz"


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


def _av_prefix(av_vels, step: int) -> np.ndarray:
    """The av entries the snapshot commits.  Every step up to the
    committed one must have its entry — writing a shorter stream would
    make a later resume concatenate a short prefix and silently shift
    av rows off their timestep."""
    av = np.asarray(av_vels, np.float32)
    if av.shape[0] < step:
        raise ValueError(
            f"av_vels has {av.shape[0]} entries but the checkpoint "
            f"commits step {step} — refusing to write an inconsistent "
            "snapshot"
        )
    return av[:step]


def _prune_stale(directory: pathlib.Path, keep: set[str]) -> None:
    """Remove every ``lbm_checkpoint*`` file not in the committed set.

    Runs strictly AFTER the commit rename, so a crash anywhere in here
    only leaves extra files, never an inconsistent snapshot.  Matching
    the whole prefix (not just ``*.npz``) also collects orphaned
    ``*.tmp`` staging files from an earlier crashed save — shard tmps
    are step-stamped and multi-hundred-MB at giant grids, so without
    this they would accumulate unboundedly across crash/resume cycles.

    Writer discipline: a RUN owns its checkpoint directory (two
    unrelated runs saving into one directory are not supported), but on
    a multi-host mesh every process of that run writes shard files into
    the shared directory (``save_sharded``).  There the prune is safe
    ONLY because of barrier placement: process 0 calls it after the
    pre-commit barrier (all ranks' renames done, no staging tmp can be
    live) and before the post-commit barrier (no rank has started the
    next segment's writes).  Do not move it relative to those barriers.
    """
    for p in directory.glob("lbm_checkpoint*"):
        if p.name not in keep and p.is_file():
            p.unlink(missing_ok=True)


def save(
    directory: str | pathlib.Path,
    params: LBMParams,
    obstacles: np.ndarray,
    step: int,
    f: np.ndarray,
    av_vels: np.ndarray,
) -> pathlib.Path:
    """Atomically write a checkpoint into ``directory``."""
    av = _av_prefix(av_vels, int(step))
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
            av_vels=av,
        )
    tmp.replace(path)
    # A v2 set alongside is now stale (load() resolves v1-vs-v2 by
    # committed step, so even if this prune never runs — crash right
    # here — the newer v1 wins on the next resume).
    _prune_stale(directory, keep={FILENAME})
    return path


def _slice_start_len(idx, dim: int, full: int) -> tuple[int, int]:
    """(start, length) of one dim of a shard index tuple (slices with
    None endpoints mean the whole dim)."""
    if dim >= len(idx):
        return 0, full
    s = idx[dim]
    start = s.start or 0
    stop = s.stop if s.stop is not None else full
    return int(start), int(stop - start)


def _shard_filename(step: int, y0: int, x0: int) -> str:
    """Coordinate-keyed shard filename: globally unique across the
    PROCESSES of a multi-host mesh (a per-process counter would collide —
    every process numbers its own local shards from zero)."""
    return f"lbm_checkpoint.step{step}.shard.y{y0}.x{x0}.npz"


def save_sharded(
    directory: str | pathlib.Path,
    params: LBMParams,
    obstacles: np.ndarray,
    step: int,
    f,  # jax.Array [9, ny, nx], possibly sharded over a (multi-host) mesh
    av_vels: np.ndarray,
) -> pathlib.Path:
    """Snapshot a (sharded) device array per shard — no global gather.

    Each addressable shard's slab goes to its own step-stamped,
    coordinate-keyed ``.npz`` (written tmp-then-rename); the meta JSON
    referencing the exact file set is renamed into place last, making it
    the commit point.  Bytes moved per shard = ``9 * nyl * nxl * 4``
    (reported in the meta for observability).  Works for a single-device
    array too (one shard).

    Multi-host (``jax.process_count() > 1``; every process calls this —
    SPMD): each process writes ONLY its addressable shards' slabs; a
    cross-process barrier then lets process 0 write the av stream and the
    meta.  The meta's shard list is derived from the GLOBAL sharding
    layout (``sharding.devices_indices_map`` — pure metadata, no
    cross-host data motion), which the deterministic coordinate-keyed
    filenames make enumerable without gathering anything.  A second
    barrier after the commit keeps a racing process from starting the
    NEXT segment's save while process 0's stale-prune (which removes
    every ``lbm_checkpoint*`` file outside the committed set) is still
    running.  Validated on a real 2-process CPU mesh by
    ``tools/multihost_smoke.py``.
    """
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    step = int(step)
    av = _av_prefix(av_vels, step)  # validate before any file is written
    # Dedupe replicated shards by their global offset (a fully-replicated
    # dim yields the same slab on every device of that mesh axis).  The
    # membership check comes FIRST: np.asarray(s.data) is a device fetch,
    # and evaluating it for a duplicate key would pull the replicated
    # copy over the ~30 MB/s host link just to discard it.
    slabs: dict[tuple[int, int], np.ndarray] = {}
    for s in f.addressable_shards:
        idx = s.index  # (speeds, y, x) slices into the global array
        y0, _ = _slice_start_len(idx, 1, f.shape[1])
        x0, _ = _slice_start_len(idx, 2, f.shape[2])
        if (y0, x0) not in slabs:
            slabs[(y0, x0)] = np.asarray(s.data, dtype=np.float32)
    import jax

    n_proc = jax.process_count()
    proc = jax.process_index()
    for (y0, x0), slab in sorted(slabs.items()):
        name = _shard_filename(step, y0, x0)
        # Process-unique tmp name: a dim replicated ACROSS processes makes
        # two processes write the same (identical-content) final file —
        # benign last-rename-wins, but a shared tmp name would race.
        tmp = directory / (name + f".tmp{proc}")
        with open(tmp, "wb") as fp:
            np.savez(fp, f_local=slab)
        tmp.replace(directory / name)
    # Global shard list from the sharding LAYOUT (covers non-addressable
    # shards too — process 0 must commit a meta referencing every
    # process's files).
    entries = []
    seen: set[tuple[int, int]] = set()
    index_map = f.sharding.devices_indices_map(f.shape)
    for idx in index_map.values():
        y0, ylen = _slice_start_len(idx, 1, f.shape[1])
        x0, xlen = _slice_start_len(idx, 2, f.shape[2])
        if (y0, x0) in seen:
            continue
        seen.add((y0, x0))
        _, d0len = _slice_start_len(idx, 0, f.shape[0])
        shape = [d0len, ylen, xlen]
        entries.append(
            {
                "file": _shard_filename(step, y0, x0),
                "y0": y0,
                "x0": x0,
                "shape": shape,
                "mbytes": round(d0len * ylen * xlen * 4 / 1e6, 3),
            }
        )
    entries.sort(key=lambda e: (e["y0"], e["x0"]))
    meta_path = directory / META_FILENAME
    if n_proc > 1:
        from jax.experimental import multihost_utils

        # Every process's shard files must be durable before the meta
        # references them.
        multihost_utils.sync_global_devices(f"lbm_ckpt_pre_{step}")
    if proc == 0:
        av_tmp = directory / (AV_FILENAME + ".tmp")
        with open(av_tmp, "wb") as fp:
            np.savez(fp, av_vels=av)
        av_tmp.replace(directory / AV_FILENAME)
        meta = {
            "version": 2,
            "params": dataclasses.asdict(params),
            "step": step,
            "mask_digest": _mask_digest(obstacles),
            "shards": entries,
        }
        meta_tmp = directory / (META_FILENAME + ".tmp")
        meta_tmp.write_text(json.dumps(meta, indent=1) + "\n")
        meta_tmp.replace(meta_path)
        # Committed: prune shard files from other steps, any (now stale)
        # v1 snapshot, and tmp orphans from earlier crashed saves.
        keep = {e["file"] for e in entries} | {AV_FILENAME, META_FILENAME}
        _prune_stale(directory, keep=keep)
    if n_proc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"lbm_ckpt_post_{step}")
    return meta_path


def _load_sharded(directory: pathlib.Path) -> Checkpoint | None:
    meta_path = directory / META_FILENAME
    if not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text())
    if meta.get("version") != 2:
        raise ValueError(f"unsupported checkpoint version in {meta_path}")
    params = LBMParams(**meta["params"])
    f = np.empty((9, params.ny, params.nx), dtype=np.float32)
    # Coverage is tracked with an explicit mask, NOT a NaN sentinel in f:
    # a diverged-but-structurally-valid run legitimately has NaN in its
    # state, and its snapshot must load (so the user can inspect it)
    # rather than be rejected as "missing shard files".
    covered = np.zeros((params.ny, params.nx), dtype=bool)
    for e in meta["shards"]:
        with np.load(directory / e["file"]) as data:
            slab = data["f_local"]
        if list(slab.shape) != e["shape"]:
            raise ValueError(
                f"shard {e['file']}: shape {slab.shape} != meta {e['shape']}"
            )
        ys = slice(e["y0"], e["y0"] + slab.shape[1])
        xs = slice(e["x0"], e["x0"] + slab.shape[2])
        f[:, ys, xs] = slab
        covered[ys, xs] = True
    if not covered.all():
        raise ValueError(
            f"sharded checkpoint in {directory} does not tile the full "
            f"{params.ny}x{params.nx} grid (missing/corrupt shard files)"
        )
    step = int(meta["step"])
    with np.load(directory / AV_FILENAME) as data:
        av = data["av_vels"]
    # The av file is written BEFORE the meta commit point (it is not
    # step-stamped like the shard files), so a crash between the two
    # renames leaves a NEWER av alongside the older committed meta.
    # Truncating to the meta step restores consistency; a SHORTER av can
    # only mean a corrupt/foreign file — fail loudly.
    if av.shape[0] < step:
        raise ValueError(
            f"sharded checkpoint av stream has {av.shape[0]} entries but "
            f"meta commits step {step} ({directory / AV_FILENAME} is "
            "corrupt or from another run)"
        )
    return Checkpoint(
        params=params,
        step=step,
        f=f,
        av_vels=av[:step],
        mask_digest=meta["mask_digest"],
    )


def load(directory: str | pathlib.Path) -> Checkpoint | None:
    """Load the checkpoint in ``directory``, or None if absent.

    When BOTH layouts are present the one with the higher committed step
    wins (ties: v2).  Both-present happens only in one crash window —
    the stale-layout prune at the end of a save that switched layouts
    never ran — and resolving by step means neither save order can
    shadow a newer committed snapshot with an older one (e.g. a v1
    ``save`` that crashed right after its rename, before pruning the
    older v2 set, must resume from the newer v1).
    """
    directory = pathlib.Path(directory)
    sharded = _load_sharded(directory)
    single = _load_v1(directory)
    if sharded is not None and single is not None:
        return single if single.step > sharded.step else sharded
    if sharded is not None:
        return sharded
    return single


def _load_v1(directory: pathlib.Path) -> Checkpoint | None:
    path = directory / FILENAME
    if not path.exists():
        return None
    with np.load(path) as data:
        header = json.loads(bytes(data["header"]).decode())
        if header.get("version") != 1:
            raise ValueError(f"unsupported checkpoint version in {path}")
        step = int(header["step"])
        av = data["av_vels"]
        # Same contract as the v2 loader: every step up to the committed
        # one must have its av entry, or a resume would concatenate a
        # short prefix and silently shift later rows off their timestep.
        if av.shape[0] < step:
            raise ValueError(
                f"checkpoint av stream has {av.shape[0]} entries but "
                f"commits step {step} ({path} is corrupt or from "
                "another run)"
            )
        return Checkpoint(
            params=LBMParams(**header["params"]),
            step=step,
            f=data["f"],
            av_vels=av[:step],
            mask_digest=header["mask_digest"],
        )
