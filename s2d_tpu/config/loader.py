"""YAML config loading with `_BASE_` inheritance and dot-path overrides.

Reproduces the reference's config ergonomics (yacs CfgNode stack with
`_BASE_` chaining and CLI `opts` key-value overrides — `/root/reference/
model_training/train_net_video.py:325-350`, detectron2 `CfgNode`) on top of
the typed dataclass tree in `defaults.py`. Reference YAML files load as-is:
keys are matched case-insensitively against dataclass field names, tuples are
parsed from python-literal strings (yacs allows e.g. `("ytvis_2021_valid",)`).
"""
from __future__ import annotations

import ast
import dataclasses
import os
import warnings
from typing import Any, List, Mapping, Sequence

import yaml

from .defaults import Config


def _coerce(value: Any, target: Any, path: str) -> Any:
    """Coerce a YAML value to the type of the default field value."""
    if dataclasses.is_dataclass(target):
        if not isinstance(value, Mapping):
            raise TypeError(f"{path}: expected mapping, got {type(value).__name__}")
        return _merge_dataclass(target, value, path)
    if isinstance(value, str) and isinstance(target, (tuple, list)):
        # yacs-style literal strings: '("a",)' / '(1, 2)'
        value = ast.literal_eval(value)
    if isinstance(target, bool):
        if isinstance(value, bool):
            return value
        raise TypeError(f"{path}: expected bool, got {value!r}")
    if isinstance(target, int) and not isinstance(target, bool):
        if isinstance(value, float) and value.is_integer():
            return int(value)
        if isinstance(value, int):
            return value
        raise TypeError(f"{path}: expected int, got {value!r}")
    if isinstance(target, float):
        if isinstance(value, (int, float)):
            return float(value)
        # the reference CLI casts WEIGHT->float strings (train_net_video.py:338)
        if isinstance(value, str):
            return float(value)
        raise TypeError(f"{path}: expected float, got {value!r}")
    if isinstance(target, tuple):
        if isinstance(value, (list, tuple)):
            return tuple(value)
        raise TypeError(f"{path}: expected sequence, got {value!r}")
    if isinstance(target, str) or target is None:
        return value
    return value


def _merge_dataclass(obj: Any, updates: Mapping[str, Any], path: str = "") -> Any:
    fields = {f.name.lower(): f.name for f in dataclasses.fields(obj)}
    kwargs = {}
    for key, value in updates.items():
        lk = key.lower()
        if lk == "_base_":
            continue
        if lk not in fields:
            # Reference configs carry keys we deliberately don't model
            # (e.g. RESNETS.STEM_TYPE marked "not used"); yacs allowed them
            # via set_new_allowed(True). Warn and skip rather than fail.
            warnings.warn(f"Ignoring unknown config key {path + key!r}")
            continue
        name = fields[lk]
        kwargs[name] = _coerce(value, getattr(obj, name), path + key + ".")
    return dataclasses.replace(obj, **kwargs)


def _load_yaml_with_base(filename: str) -> dict:
    with open(filename) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop("_BASE_", None) or data.pop("_base_", None)
    if base:
        base_path = base if os.path.isabs(base) else os.path.join(
            os.path.dirname(filename), base
        )
        merged = _load_yaml_with_base(base_path)
        _deep_update(merged, data)
        return merged
    return data


def _deep_update(dst: dict, src: Mapping) -> None:
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


def _apply_opts(cfg: Config, opts: Sequence[str]) -> Config:
    """Apply ['KEY.SUBKEY', 'value', ...] pairs (detectron2 opts style)."""
    if len(opts) % 2 != 0:
        raise ValueError(f"opts must be key/value pairs, got {opts}")
    for key, raw in zip(opts[::2], opts[1::2]):
        parts = key.split(".")
        # walk to the leaf's parent, collecting (obj, field_name) path
        chain = []
        node: Any = cfg
        for part in parts[:-1]:
            fields = {f.name.lower(): f.name for f in dataclasses.fields(node)}
            if part.lower() not in fields:
                raise KeyError(f"Unknown config key {key!r} (at {part!r})")
            name = fields[part.lower()]
            chain.append((node, name))
            node = getattr(node, name)
        fields = {f.name.lower(): f.name for f in dataclasses.fields(node)}
        leaf = parts[-1].lower()
        if leaf not in fields:
            raise KeyError(f"Unknown config key {key!r} (at {parts[-1]!r})")
        leaf_name = fields[leaf]
        current = getattr(node, leaf_name)
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = dataclasses.replace(node, **{leaf_name: _coerce(value, current, key)})
        # rebuild the immutable chain bottom-up
        for parent, name in reversed(chain):
            node = dataclasses.replace(parent, **{name: node})
        cfg = node
    return cfg


def load_config(
    filename: str | None = None, opts: Sequence[str] = ()
) -> Config:
    """Build a Config from defaults, an optional YAML file, and CLI opts."""
    cfg = Config()
    if filename:
        cfg = _merge_dataclass(cfg, _load_yaml_with_base(filename))
    if opts:
        cfg = _apply_opts(cfg, list(opts))
    return cfg
