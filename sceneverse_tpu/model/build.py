"""Model registry + base (reference model/build.py:5-18)."""

from __future__ import annotations

from flax import nnx

from sceneverse_tpu.registry import Registry

MODEL_REGISTRY = Registry("model")


class BaseModel(nnx.Module):
    """Base for task models.

    ``get_opt_params()`` returns per-submodule optimizer group specs
    (reference model/build.py:13-14 requires it): a list of
    ``{"prefix": (attr, ...), "lr": float}`` entries. The optim builder
    expands each into decay/no-decay AdamW groups
    (reference optim/utils.py:1-18 semantics) and freezes anything not
    covered that is marked frozen.
    """

    def __init__(self, cfg):
        pass

    def get_opt_params(self):
        raise NotImplementedError(
            "Function to obtain all default parameters for optimization"
        )

    def frozen_prefixes(self):
        """Param path prefixes excluded from optimization entirely
        (reference: requires_grad=False params are skipped,
        optim/utils.py:6-7)."""
        return []


def build_model(cfg, *, rngs: nnx.Rngs):
    return MODEL_REGISTRY.get(cfg.model.name)(cfg, rngs=rngs)
