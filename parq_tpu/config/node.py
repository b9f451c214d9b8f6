"""Minimal yacs-compatible config node.

Supports the subset the reference relies on (ref: config/default.py:120-126):
typed defaults declared in code, ``merge_from_file`` (YAML),
``merge_from_list`` (CLI ``KEY VALUE`` pairs with dotted keys), ``freeze``.
Implemented from scratch — yacs is not available in this environment.
"""
from __future__ import annotations

import ast
import copy
from typing import Any, List

import yaml


class CfgNode(dict):
    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        if init_dict:
            for k, v in init_dict.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # attribute access --------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no key: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(f"Config is frozen; cannot set {name}")
        self[name] = value

    # freeze -------------------------------------------------------------
    def freeze(self):
        self._set_immutable(True)

    def defrost(self):
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, value: bool):
        self.__dict__[CfgNode.IMMUTABLE] = value
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(value)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    # merging ------------------------------------------------------------
    def merge_from_file(self, path: str):
        with open(path) as f:
            loaded = yaml.safe_load(f)
        if loaded:
            self._merge_dict(loaded)

    def merge_from_other_cfg(self, other: "CfgNode"):
        self._merge_dict(other)

    def merge_from_list(self, opts: List[str]):
        assert len(opts) % 2 == 0, f"Override list must be KEY VALUE pairs: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Unknown config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Unknown config key: {key}")
            dict.__setitem__(node, leaf,
                             _coerce(value, node[leaf]))

    def _merge_dict(self, other: dict):
        for k, v in other.items():
            if k not in self:
                # Tolerate new keys from files (yacs would raise; we allow to
                # keep shipped reference YAMLs loadable with extra TPU keys).
                dict.__setitem__(self, k,
                                 CfgNode(v) if isinstance(v, dict) else _parse_scalar(v))
                continue
            cur = self[k]
            if isinstance(cur, CfgNode) and isinstance(v, dict):
                cur._merge_dict(v)
            else:
                dict.__setitem__(self, k, _coerce_loaded(v, cur))

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, CfgNode) else v)
                for k, v in self.items()}

    def __str__(self):
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _parse_scalar(v):
    if isinstance(v, str) and v in ("None", "~", "null"):
        return None
    return v


def _coerce_loaded(value, old):
    """Coerce a YAML-loaded value to the default's type where sensible."""
    value = _parse_scalar(value)
    if value is None or old is None:
        return value
    if isinstance(old, bool):
        return bool(value)
    if isinstance(old, float) and isinstance(value, (int, float, str)):
        return float(value)
    if isinstance(old, int) and isinstance(value, (int, float)) and not isinstance(value, bool):
        return int(value)
    return value


def _coerce(value: str, old):
    """Coerce a CLI string to the default's type (yacs-style literal eval)."""
    if value in ("None", "~", "null"):
        return None
    try:
        lit = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        lit = value
    return _coerce_loaded(lit, old)
