"""Experiment entry point (reference run.py:12-57, Hydra-style surface).

Usage:
    python run.py --config-path configs/final --config-name all_pretrain \
        [key.sub=value ...]

Handles resume (reload the saved config.yaml), experiment-dir naming from
``naming_keywords``, config snapshotting, and trainer dispatch — the same
surface as the reference without the hydra dependency (not in this image).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime
from pathlib import Path


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="sceneverse_tpu runner")
    parser.add_argument("--config-path", default="configs")
    parser.add_argument("--config-name", default="default")
    parser.add_argument("overrides", nargs="*", help="key.sub=value overrides")
    return parser.parse_args(argv)


def compose_exp_name(cfg) -> str:
    """reference run.py:25-42: experiment name from naming_keywords."""
    parts = [str(cfg.get("name", "exp"))]
    for kw in cfg.get("naming_keywords", []) or []:
        if kw == "time":
            parts.append(datetime.now().strftime("%Y%m%d-%H%M%S"))
        elif kw == "task":
            parts.append(str(cfg.get("task", "")))
        else:
            val = cfg.select(kw)
            if val is not None:
                parts.append(f"{kw.split('.')[-1]}{val}")
    return "_".join(p for p in parts if p)


def main(argv=None):
    from sceneverse_tpu.config import load_config, save_config
    from sceneverse_tpu.utils.prng import configure_default_prng

    # before any key creation: rbg on TPU (+15.7% train step, BASELINE.md);
    # override with SCENEVERSE_PRNG_IMPL
    configure_default_prng()

    args = parse_args(argv)
    name = args.config_name
    if not name.endswith((".yaml", ".yml")):
        name += ".yaml"
    cfg_file = Path(args.config_path) / name
    if not cfg_file.exists():
        raise FileNotFoundError(
            f"{cfg_file} not found — pass --config-path/--config-name "
            "(the reference likewise ships no configs/default.yaml)"
        )
    cfg = load_config(str(cfg_file), args.overrides)

    # resume: reload the snapshotted config (reference run.py:14-18)
    if cfg.get("resume", False) and cfg.get("exp_dir"):
        saved = Path(cfg.exp_dir) / "config.yaml"
        if saved.exists():
            cfg = load_config(str(saved), args.overrides)
            cfg.resume = True

    if not cfg.get("exp_dir"):
        base = cfg.get("base_dir") or "outputs"
        cfg.exp_dir = str(Path(base) / compose_exp_name(cfg))
    os.makedirs(cfg.exp_dir, exist_ok=True)
    save_config(cfg, str(Path(cfg.exp_dir) / "config.yaml"))

    import sceneverse_tpu.data  # noqa: F401 — populate registries
    import sceneverse_tpu.evaluator  # noqa: F401
    import sceneverse_tpu.model  # noqa: F401
    import sceneverse_tpu.trainer  # noqa: F401
    from sceneverse_tpu.trainer import build_trainer

    trainer = build_trainer(cfg)
    try:
        return trainer.run()
    finally:
        trainer.close()  # clear the process-global ambient mesh


if __name__ == "__main__":
    main()
