"""Config system: YAML -> attribute-accessible nested dict with dotted
CLI overrides and schema-free merging.

The reference loads raw YAML dicts with no schema or CLI overrides
(reference: main-avid.py:50, eval-action-recg.py:32). We keep the exact
YAML schema of the reference configs so they run verbatim, and add:
  * attribute access (cfg.dataset.batch_size)
  * deep merge of defaults
  * dotted-path CLI overrides (--set optimizer.lr.base_lr=1e-4)
"""

from __future__ import annotations

import copy
import re
from typing import Any, Mapping

import yaml


class Config(dict):
    """Nested dict with attribute access. Missing keys raise AttributeError."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Mapping):
                node[part] = Config()
            node = node[part]
        # _wrap: a mapping-valued override ('{name: strong}') must become
        # a Config like file-loaded mappings, or attribute access breaks
        node[parts[-1]] = _wrap(value)

    def to_dict(self) -> dict:
        return {
            k: v.to_dict() if isinstance(v, Config) else v for k, v in self.items()
        }


def _wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def from_dict(d: Mapping) -> Config:
    return _wrap(dict(d))


# the one YAML 1.1 numeric gap worth fixing: exponent-form floats.
# PyYAML's 1.1 resolver needs BOTH a dot and a signed exponent, so '1e-4'
# and '1.5e3' parse as STRINGS — `--set optimizer.lr.base_lr=1e-4` would
# silently set a str. Everything else ('nan', 'infinity', ...) keeps YAML
# semantics so literal strings stay strings.
_SCI_FLOAT = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+")


def _coerce(raw: str) -> Any:
    """Override-value coercion: YAML, plus exponent-form floats."""
    s = raw.strip()
    if _SCI_FLOAT.fullmatch(s):
        return float(s)
    return yaml.safe_load(s)


def load(path: str, overrides: list[str] | None = None) -> Config:
    """Load a YAML config file, optionally applying `key.path=value` overrides."""
    with open(path) as f:
        cfg = from_dict(yaml.safe_load(f))
    for ov in overrides or []:
        key, eq, raw = ov.partition("=")
        if not eq:
            raise ValueError(
                f"override {ov!r} has no '=': expected key.path=value "
                "(a bare key would silently set None)"
            )
        cfg.set_path(key.strip(), _coerce(raw))
    return cfg


def merge(base: Mapping, update: Mapping) -> Config:
    """Deep merge `update` into `base` (returns a new Config)."""
    out = from_dict(base)
    for k, v in update.items():
        if isinstance(v, Mapping) and isinstance(out.get(k), Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = _wrap(v)
    return out
