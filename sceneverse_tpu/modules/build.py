"""Module registries + factory (reference modules/build.py:6-31)."""

from __future__ import annotations

from sceneverse_tpu.registry import Registry

VISION_REGISTRY = Registry("vision")
LANGUAGE_REGISTRY = Registry("language")
GROUNDING_REGISTRY = Registry("grounding")
HEADS_REGISTRY = Registry("heads")

_REGISTRIES = {
    "vision": VISION_REGISTRY,
    "language": LANGUAGE_REGISTRY,
    "grounding": GROUNDING_REGISTRY,
    "heads": HEADS_REGISTRY,
}


def _cfg2dict(cfg):
    if cfg is None:
        return {}
    if isinstance(cfg, dict):
        return dict(cfg)
    try:  # OmegaConf
        from omegaconf import OmegaConf

        return OmegaConf.to_container(cfg, resolve=True)
    except Exception:
        return dict(cfg)


def build_module(module_type: str, cfg, *, rngs):
    """Instantiate ``cfg.name`` with ``**cfg.args`` from the typed registry
    (reference modules/build.py:12-22), plus the NNX rng streams."""
    if module_type not in _REGISTRIES:
        raise NotImplementedError(f"module type {module_type} not implemented")
    args = _cfg2dict(getattr(cfg, "args", None) or (cfg.get("args") if hasattr(cfg, "get") else None))
    name = cfg["name"] if isinstance(cfg, dict) else cfg.name
    return _REGISTRIES[module_type].get(name)(cfg, **args, rngs=rngs)


def build_module_by_name(cfg, *, rngs):
    """Search all module registries for ``cfg.name``
    (reference modules/build.py:24-31)."""
    name = cfg["name"] if isinstance(cfg, dict) else cfg.name
    for registry in _REGISTRIES.values():
        if name in registry:
            args = _cfg2dict(getattr(cfg, "args", None))
            return registry.get(name)(cfg, **args, rngs=rngs)
    raise NotImplementedError(f"Unknown module: {name}")
