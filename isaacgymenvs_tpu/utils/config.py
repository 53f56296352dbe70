"""YAML config loading (reference cfg/ tree, Hydra-less).

The reference uses Hydra + OmegaConf with custom resolvers
(`cfg/config.yaml`, `__init__.py:8-11`). Here: plain YAML per task under
isaacgymenvs_tpu/cfg/{task,train}/, with `key=value` dotted CLI overrides
(mirroring Hydra's syntax for the common cases).
"""

from __future__ import annotations

import os
from typing import Optional

import yaml

_CFG_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cfg")


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _deep_merge(base: dict, over: dict) -> dict:
    """Recursive dict merge: `over` wins (Hydra defaults-list semantics)."""
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_with_defaults(group: str, name: str) -> dict:
    """Load `<group>/<name>.yaml`, composing a Hydra-style `defaults:` list.

    Mirrors the reference's variant configs (e.g. cfg/task/AntSAC.yaml,
    cfg/train/ShadowHandOpenAIPPO.yaml) which inherit a base config via
    `defaults: [Base, _self_]`.
    """
    path = os.path.join(_CFG_ROOT, group, f"{name}.yaml")
    if not os.path.exists(path):
        return {}
    cfg = load_yaml(path)
    bases = cfg.pop("defaults", None)
    if not bases:
        return cfg
    merged: dict = {}
    for b in bases:
        if b == "_self_":
            merged = _deep_merge(merged, cfg)
        else:
            merged = _deep_merge(merged, _load_with_defaults(group, str(b)))
    if "_self_" not in bases:
        merged = _deep_merge(merged, cfg)
    return merged


def load_task_config(task: str) -> dict:
    return _load_with_defaults("task", task)


def load_train_config(name: str) -> dict:
    return _load_with_defaults("train", name)


def apply_overrides(cfg: dict, overrides) -> dict:
    """Apply `a.b.c=value` dotted overrides (Hydra CLI style)."""
    import copy
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            continue
        key, val = ov.split("=", 1)
        val = yaml.safe_load(val)
        node = cfg
        parts = key.lstrip("+").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return cfg


def omegaconf_to_dict(cfg):
    """Identity for plain dicts (reference utils/reformat.py:32)."""
    return dict(cfg)


def print_dict(d, prefix=""):
    for k, v in d.items():
        if isinstance(v, dict):
            print(f"{prefix}{k}:")
            print_dict(v, prefix + "  ")
        else:
            print(f"{prefix}{k}: {v}")
