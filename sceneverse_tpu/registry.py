"""Lightweight registry — the framework's universal extension mechanism.

Mirrors the role of fvcore's Registry in the reference (12 registries across
model/trainer/dataset/module/loss/optim/evaluator/preprocessor layers, see
reference model/build.py:5, trainer/build.py:26, data/build.py:7,
modules/build.py:6-9) without the fvcore dependency.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator


class Registry:
    """Name -> class/callable mapping with decorator-based registration."""

    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def register(self, obj: Any = None, *, name: str | None = None) -> Callable:
        if obj is None:
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._map:
            raise KeyError(f"'{key}' already registered in registry '{self._name}'")
        self._map[key] = obj
        return obj

    def get(self, key: str) -> Any:
        if key not in self._map:
            raise KeyError(
                f"'{key}' not found in registry '{self._name}'. "
                f"Available: {sorted(self._map)}"
            )
        return self._map[key]

    def __contains__(self, key: str) -> bool:
        return key in self._map

    def __iter__(self) -> Iterator[str]:
        return iter(self._map)

    def keys(self):
        return self._map.keys()
