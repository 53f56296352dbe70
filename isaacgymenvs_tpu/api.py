"""Public factory — mirrors `isaacgymenvs.make` (reference __init__.py:14-55).

Returns the functional task object; composes the YAML config for the task
when none is given (the reference composes Hydra config, __init__.py:35-38).
"""

from __future__ import annotations

from typing import Optional


def make(seed: int = 0, task: str = "Ant", num_envs: Optional[int] = None,
         cfg: Optional[dict] = None, **_ignored):
    from .envs import isaacgym_task_map
    from .utils.config import load_task_config

    if task not in isaacgym_task_map:
        raise ValueError(
            f"unknown task {task!r}; available: {sorted(isaacgym_task_map)}")
    if cfg is None:
        cfg = load_task_config(task)
    n = num_envs or cfg.get("env", {}).get("numEnvs", 4096)
    return isaacgym_task_map[task](cfg=cfg, num_envs=n)
