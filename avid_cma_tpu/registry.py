"""Named component registries.

The reference wires components by module-`__dict__` lookup
(reference: utils/main_utils.py:74-77,231-237). We make that explicit:
each component family (models, criterions, datasets, optimizers) has a
registry, populated by the `@register` decorator, looked up by the YAML
`name`/`arch` strings so reference configs resolve unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str | None = None) -> Callable:
        def deco(obj):
            key = name or obj.__name__
            if key in self._entries:
                raise KeyError(f"{self.kind} '{key}' already registered")
            self._entries[key] = obj
            return obj

        return deco

    def get(self, name: str) -> Any:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} '{name}'. Available: {sorted(self._entries)}"
            )
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def keys(self):
        return self._entries.keys()


MODELS = Registry("model")
CRITERIONS = Registry("criterion")
DATASETS = Registry("dataset")
