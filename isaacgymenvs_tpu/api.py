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

    if cfg is None:
        cfg = load_task_config(task)
    # variant configs (AntSAC, ShadowHandTest, HumanoidAMPHands, ...) select
    # their env class via the config's `name:` field, like the reference's
    # cfg.task.name lookup (reference train.py:103, cfg/task/ShadowHandTest.yaml:2)
    cls_name = task if task in isaacgym_task_map else cfg.get("name", task)
    if cls_name not in isaacgym_task_map:
        raise ValueError(
            f"unknown task {task!r}; available: {sorted(isaacgym_task_map)}")
    n = num_envs or cfg.get("env", {}).get("numEnvs", 4096)
    env = isaacgym_task_map[cls_name](cfg=cfg, num_envs=n)

    # generic sim-parameter passthrough: any SimParams field named in the
    # task config's sim: block overrides the env's construction-time
    # value (the reference's __parse_sim_params consumes the whole physx
    # block the same way, vec_task.py:442-490). Lets YAML/CLI reach
    # solver knobs the envs don't explicitly plumb (contact_timeconst,
    # power_iterations, ...).
    import dataclasses as _dc
    sim_cfg = cfg.get("sim", {}) or {}
    # whitelist: advanced solver knobs only — dt/substeps/gravity/
    # solver_iterations are consumed (and sometimes transformed, e.g.
    # factory disable_gravity) by env constructors themselves
    passthrough = ("contact_beta", "contact_timeconst",
                   "contact_dampratio", "friction_timeconst",
                   "limit_timeconst", "limit_dampratio",
                   "warmstart_solver", "solver_matvec_bf16",
                   "power_iterations", "bounce_threshold",
                   "max_contact_points", "contact_margin",
                   "max_depenetration_velocity", "freeze_mass_matrix",
                   "max_angular_velocity", "max_linear_velocity",
                   "friction_regularization")
    overrides = {k: sim_cfg[k] for k in passthrough if k in sim_cfg}
    if overrides:
        env.sim = _dc.replace(env.sim, **overrides)
    return env
