"""YAML config tree with hydra-compatible semantics (subset).

The reference drives lid/spec_pred via hydra 1.0 (`lid/main.py:23`,
`lid/conf/*.yaml`) with: a defaults list, ``${a.b}`` interpolation, and
``key=value`` / ``key.sub=value`` CLI overrides. hydra isn't available in
this image, and a full dependency isn't needed — this module implements the
subset the reference configs actually use so the same YAML schema
(trainer / model / module / data / logger / stage groups) works unchanged.

Features:
- ``defaults: [{group: name}, ...]`` merged from ``<config_dir>/<group>/<name>.yaml``
- ``${path.to.key}`` string interpolation (recursive, cycles detected)
- dotted CLI overrides with YAML-typed values (``trainer.total_epoch=10``)
- attribute-style access via :class:`ConfigDict`
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


class ConfigDict(dict):
    """dict with attribute access and recursive wrapping."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigDict.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(o: Any) -> Any:
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _deep_merge(base: Dict, extra: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _lookup(tree: Dict, dotted: str) -> Any:
    node: Any = tree
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            raise KeyError(f"interpolation key not found: {dotted}")
        node = node[part]
    return node


def _interpolate(tree: Dict) -> Dict:
    def resolve(value: Any, stack: tuple) -> Any:
        if isinstance(value, dict):
            return {k: resolve(v, stack) for k, v in value.items()}
        if isinstance(value, list):
            return [resolve(v, stack) for v in value]
        if isinstance(value, str):
            full = _INTERP_RE.fullmatch(value)
            if full:  # whole-string interpolation keeps the referent's type
                key = full.group(1)
                if key in stack:
                    raise ValueError(f"interpolation cycle at {key}")
                return resolve(_lookup(tree, key), stack + (key,))

            def sub(m: "re.Match[str]") -> str:
                key = m.group(1)
                if key in stack:
                    raise ValueError(f"interpolation cycle at {key}")
                return str(resolve(_lookup(tree, key), stack + (key,)))

            return _INTERP_RE.sub(sub, value)
        return value

    return resolve(tree, ())


_SCI_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _apply_override(tree: Dict, dotted: str, raw_value: str) -> None:
    value = yaml.safe_load(raw_value)
    # YAML 1.1 parses "2e-3" (no dot) as a string — coerce scientific
    # notation to float like hydra does
    if isinstance(value, str) and _SCI_FLOAT_RE.match(value):
        value = float(value)
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def load_config(
    config_dir: str,
    config_name: str,
    overrides: Optional[List[str]] = None,
) -> ConfigDict:
    """Load ``<config_dir>/<config_name>.yaml`` with defaults + overrides."""
    path = os.path.join(config_dir, config_name + ".yaml")
    with open(path) as f:
        tree: Dict[str, Any] = yaml.safe_load(f) or {}

    merged: Dict[str, Any] = {}
    for entry in tree.pop("defaults", []) or []:
        if isinstance(entry, str):
            if entry == "_self_":
                merged = _deep_merge(merged, tree)
                tree = {}
                continue
            group_path = os.path.join(config_dir, entry + ".yaml")
            group_key = None
        else:
            (group_key, name), = entry.items()
            group_path = os.path.join(config_dir, str(group_key), f"{name}.yaml")
        with open(group_path) as f:
            sub = yaml.safe_load(f) or {}
        merged = _deep_merge(merged, {group_key: sub} if group_key else sub)
    merged = _deep_merge(merged, tree)

    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got: {ov}")
        key, _, val = ov.partition("=")
        _apply_override(merged, key.strip(), val.strip())

    return ConfigDict.wrap(_interpolate(merged))
