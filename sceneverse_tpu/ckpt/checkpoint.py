"""Native checkpointing via orbax (replaces HF Accelerate save_state/
load_state, reference trainer/build.py:160-172).

Saves are ASYNC: ``StandardCheckpointer`` copies arrays to host synchronously
(so later donating train steps can't clobber them) and commits the write in a
background thread — the per-epoch latest/best/ckpt_N saves of the reference
trainer loop (reference trainer/default_trainer.py:47-53) overlap the next
epoch's compute instead of stalling it. A new save first drains the previous
one (orbax requires it; by the next epoch it long finished), and restores /
process exit drain everything.
"""

from __future__ import annotations

import os
from pathlib import Path

import orbax.checkpoint as ocp


META_KEYS = ("tracker", "global_step")

_CKPTR = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        import atexit

        _CKPTR = ocp.StandardCheckpointer()
        # Drain in-flight commits before the interpreter tears down thread
        # pools — an async save racing process exit dies with "cannot schedule
        # new futures after shutdown" and leaves only an orbax tmp dir (the
        # checkpoint is lost). atexit handlers run before threading's own
        # shutdown hooks, so the commit thread can still finish here.
        atexit.register(wait_for_checkpoints)
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every dispatched async save is durable on disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(path, state: dict, block: bool = False) -> None:
    """Arrays go to orbax; plain-python metadata (tracker dict, step counters,
    strings) goes to a JSON sidecar NEXT TO the checkpoint dir — orbax
    finalizes ``path`` by renaming a tmp dir, so a file written inside before
    the async commit would be lost."""
    import json

    path = Path(path).absolute()
    arrays = {k: v for k, v in state.items() if k not in META_KEYS}
    meta = {k: state[k] for k in META_KEYS if k in state}
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # drain any in-flight save before re-dispatch
    path.parent.mkdir(parents=True, exist_ok=True)
    with (path.parent / (path.name + ".meta.json")).open("w") as f:
        json.dump(meta, f, default=str)
    ckptr.save(path, arrays, force=True)
    if block:
        ckptr.wait_until_finished()


def load_checkpoint(path, target: dict) -> dict:
    import json

    wait_for_checkpoints()
    path = Path(path).absolute()
    arrays_target = {k: v for k, v in target.items() if k not in META_KEYS}
    ckptr = _checkpointer()
    out = dict(ckptr.restore(path, target=arrays_target))
    meta_path = path.parent / (path.name + ".meta.json")
    if not meta_path.exists():  # pre-sidecar layout (meta inside the dir)
        meta_path = path / "meta.json"
    if meta_path.exists():
        meta = json.load(meta_path.open())
        for k, v in meta.items():
            if k == "tracker":
                v = dict(v)
                if "best_result" in v:
                    v["best_result"] = float(v["best_result"])
            out[k] = v
    return out


def is_checkpoint(path) -> bool:
    """A finalized orbax checkpoint dir (tmp dirs from an aborted async
    commit don't count)."""
    path = Path(path)
    return path.is_dir() and (
        (path / "_CHECKPOINT_METADATA").exists()
        or (path / "manifest.ocdbt").exists()
    )


def latest_checkpoint(ckpt_dir) -> Path | None:
    wait_for_checkpoints()
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    candidates = [p for p in ckpt_dir.iterdir() if is_checkpoint(p)]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)
