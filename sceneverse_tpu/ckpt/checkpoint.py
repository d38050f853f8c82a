"""Native checkpointing via orbax (replaces HF Accelerate save_state/
load_state, reference trainer/build.py:160-172)."""

from __future__ import annotations

import os
from pathlib import Path

import orbax.checkpoint as ocp


META_KEYS = ("tracker", "global_step")


def save_checkpoint(path, state: dict) -> None:
    """Arrays go to orbax; plain-python metadata (tracker dict, step counters,
    strings) goes to a JSON sidecar inside the checkpoint dir."""
    import json

    path = Path(path).absolute()
    arrays = {k: v for k, v in state.items() if k not in META_KEYS}
    meta = {k: state[k] for k in META_KEYS if k in state}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, arrays, force=True)
    ckptr.wait_until_finished()
    with (path / "meta.json").open("w") as f:
        json.dump(meta, f, default=str)


def load_checkpoint(path, target: dict) -> dict:
    import json

    path = Path(path).absolute()
    arrays_target = {k: v for k, v in target.items() if k not in META_KEYS}
    ckptr = ocp.StandardCheckpointer()
    out = dict(ckptr.restore(path, target=arrays_target))
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


def latest_checkpoint(ckpt_dir) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    candidates = [p for p in ckpt_dir.iterdir() if p.is_dir()]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)
