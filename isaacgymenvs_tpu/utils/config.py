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


def load_task_config(task: str) -> dict:
    path = os.path.join(_CFG_ROOT, "task", f"{task}.yaml")
    return load_yaml(path) if os.path.exists(path) else {}


def load_train_config(name: str) -> dict:
    path = os.path.join(_CFG_ROOT, "train", f"{name}.yaml")
    return load_yaml(path) if os.path.exists(path) else {}


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
