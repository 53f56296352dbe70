#!/usr/bin/env python
"""Train/test CLI — the reference's `python train.py task=X train=XPPO k=v`
surface (reference train.py, Hydra) without Hydra: dotted key=value
overrides, task/train config groups, seed control, test mode, checkpoint
restore, multi-host init.

Examples:
    python train.py task=Cartpole
    python train.py task=Ant num_envs=4096 max_iterations=500
    python train.py task=Ant test=True checkpoint=runs/Ant/nn/best.ckpt
"""

from __future__ import annotations

import sys


def parse_cli(argv):
    cfg = {}
    for a in argv:
        if "=" not in a:
            continue
        k, v = a.split("=", 1)
        import yaml
        cfg[k.lstrip("+")] = yaml.safe_load(v)
    return cfg


def main():
    cli = parse_cli(sys.argv[1:])
    task = cli.pop("task", "Ant")
    train_name = cli.pop("train", f"{task}PPO")
    seed = int(cli.pop("seed", 42))
    test = bool(cli.pop("test", False))
    checkpoint = cli.pop("checkpoint", None) or None
    num_envs = cli.pop("num_envs", None)
    max_iterations = cli.pop("max_iterations",
                             cli.pop("max_epochs", None))
    experiment = cli.pop("experiment", None) or task
    multi_host = bool(cli.pop("multi_gpu", False))  # name kept for parity

    if multi_host:
        import jax
        jax.distributed.initialize()

    import jax
    # NOTE: do NOT enable jax_compilation_cache_dir here — with the
    # tunneled axon TPU platform, deserializing a cached executable hangs
    # the client (observed: runs wedge forever on the cache READ path).
    # deterministic seeding incl. process index (reference utils/utils.py:43)
    rank = jax.process_index()
    seed = seed + rank

    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.utils.config import (apply_overrides,
                                               load_task_config,
                                               load_train_config)
    task_cfg = load_task_config(task)
    task_overrides = {k[5:]: v for k, v in cli.items() if k.startswith("task.")}
    task_cfg = apply_overrides(task_cfg, [f"{k}={v}" for k, v in
                                          task_overrides.items()])
    train_cfg = load_train_config(train_name)
    if not train_cfg and task_cfg.get("name") and train_name == f"{task}PPO":
        # task variants (HumanoidAMPHands, ShadowHandTest, ...) fall back to
        # their base task's train config via the config's `name:` field
        train_name = f"{task_cfg['name']}PPO"
        train_cfg = load_train_config(train_name)
    train_overrides = [f"{k[6:]}={v}" for k, v in cli.items()
                       if k.startswith("train.")]
    train_cfg = apply_overrides(train_cfg, train_overrides)

    env = isaacgymenvs_tpu.make(task=task, num_envs=num_envs, cfg=task_cfg)

    # optional Weights&Biases, rank 0 only (reference train.py:84-97);
    # JSONL/TensorBoard logging always runs regardless
    if bool(cli.pop("wandb_activate", False)) and rank == 0:
        try:
            import wandb
            wandb.init(
                project=cli.pop("wandb_project", "isaacgymenvs_tpu"),
                entity=cli.pop("wandb_entity", None),
                group=cli.pop("wandb_group", ""),
                name=experiment, config={"task": task_cfg},
                sync_tensorboard=True)
        except ImportError:
            print("wandb not installed; continuing with JSONL/TB logging")

    from isaacgymenvs_tpu.learn.runner import Runner
    runner = Runner(env, train_cfg, seed=seed,
                    logdir=f"runs/{experiment}",
                    max_epochs=int(max_iterations) if max_iterations else None)

    # dump resolved config next to checkpoints (reference train.py:151-154)
    import os
    import yaml
    os.makedirs(f"runs/{experiment}", exist_ok=True)
    with open(f"runs/{experiment}/config.yaml", "w") as f:
        yaml.safe_dump({"task": task_cfg, "train": train_cfg, "seed": seed}, f)

    if test:
        runner.play(checkpoint=checkpoint,
                    capture_trajectory=bool(cli.pop("capture_video",
                                                    False)))
    else:
        runner.train(checkpoint=checkpoint)


if __name__ == "__main__":
    main()
