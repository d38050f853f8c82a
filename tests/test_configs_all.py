"""Every reference experiment YAML must wire end-to-model.

The reference ships 37 experiment configs (TRAIN.md / configs tree); ours
mirror them by name under ``configs/final``. Loading checks the `_base_`
inheritance + override machinery (`sceneverse_tpu/config.py`); the build
checks registry wiring: model tree (abstract init — no weight allocation),
optimizer param groups, loss names, evaluator names, trainer, datasets,
wrappers. Data loading itself needs real dataset trees and is covered by
the fixture-based e2e tests instead.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from flax import nnx

CONFIG_ROOT = Path(__file__).resolve().parent.parent / "configs" / "final"
ALL_YAMLS = sorted(
    p for p in CONFIG_ROOT.rglob("*.yaml") if not p.name.startswith("_")
)


def _cfg(path):
    from sceneverse_tpu.config import load_config

    return load_config(str(path), [])


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: p.stem)
def test_config_wires_end_to_model(path):
    from sceneverse_tpu.data.build import DATASET_REGISTRY
    from sceneverse_tpu.data.datasets.dataset_wrapper import (
        DATASETWRAPPER_REGISTRY,
    )
    from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY
    from sceneverse_tpu.model.build import MODEL_REGISTRY, build_model
    from sceneverse_tpu.optim.loss.loss import LOSS_REGISTRY
    from sceneverse_tpu.trainer.build import TRAINER_REGISTRY

    cfg = _cfg(path)

    assert cfg.trainer in TRAINER_REGISTRY, cfg.trainer
    assert cfg.model.name in MODEL_REGISTRY, cfg.model.name

    for split in ("train", "val", "test"):
        for ds in cfg.data.get(split) or []:
            assert ds in DATASET_REGISTRY, f"{split}: {ds}"
        wrapper = cfg.data_wrapper.get(split)
        if wrapper:
            assert wrapper in DATASETWRAPPER_REGISTRY, f"{split}: {wrapper}"

    from sceneverse_tpu.optim.loss import contra_loss  # noqa: F401 (registers)
    from sceneverse_tpu.optim.loss.loss import _FUNCTIONAL

    for key in ("loss_list", "vis_loss_list"):
        for loss in cfg.model.get(key) or []:
            assert loss in _FUNCTIONAL or loss in LOSS_REGISTRY, \
                f"{key}: {loss}"

    for split, spec in (cfg.get("eval") or {}).items():
        if isinstance(spec, dict) and "name" in spec:
            assert spec["name"] in EVALUATOR_REGISTRY, f"{split}: {spec['name']}"

    # abstract model init: full tree construction + shape propagation without
    # allocating the ~150M params per config
    model = nnx.eval_shape(lambda: build_model(cfg, rngs=nnx.Rngs(0)))
    groups = model.get_opt_params()
    assert groups, "get_opt_params returned no optimizer groups"
    for g in groups:
        assert "lr" in g and float(g["lr"]) > 0


def test_all_reference_confignames_present():
    """The reference's experiment YAML names must all exist here (SURVEY §2
    A4: 37 experiment configs + finetune subdir)."""
    names = {p.stem for p in ALL_YAMLS}
    assert len(ALL_YAMLS) >= 37, sorted(names)
    # spot anchors: one per family
    for anchor in ("all_pretrain", "scanrefer_finetune", "sqa3d_finetune",
                   "multiscan_finetune", "synthetic_pretrain"):
        assert anchor in names, anchor
