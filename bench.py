#!/usr/bin/env python
"""Headline benchmark: Ant-4096 + Humanoid-4096 env-steps/s on the
available device (BASELINE.md primary metric names both).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Baselines: Isaac Gym paper (arXiv:2108.10470) on 1×A100 —
Ant-4096 ≈ 700K env-steps/s, Humanoid-4096 ≈ 200K env-steps/s.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE = {"Ant": 700_000.0, "Humanoid": 200_000.0}


def bench_task(task: str, num_envs: int = 4096, chunk: int = 20,
               iters: int = 15) -> float:
    import isaacgymenvs_tpu

    env = isaacgymenvs_tpu.make(task=task, num_envs=num_envs)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))

    def roll(state, key):
        def body(carry, _):
            st, k, acc = carry
            k, ka = jax.random.split(k)
            actions = jax.random.uniform(ka, (num_envs, env.num_acts),
                                         minval=-1.0, maxval=1.0)
            st, ts = env.step(st, actions)
            # consume EVERYTHING a training loop consumes — obs, reward,
            # done, asymmetric states. Summing only ts.reward[0] let XLA
            # dead-code-eliminate the obs/info pipeline (final FK,
            # contact-force extraction): the round-3 "stepping" numbers
            # were up to 3x the throughput any consumer could see, and
            # train_vs_step_ratio 0.62 was mostly that artifact.
            acc = acc + jnp.sum(ts.obs) + jnp.sum(ts.reward) \
                + jnp.sum(ts.done) \
                + (jnp.sum(ts.states) if ts.states is not None else 0.0)
            return (st, k, acc), None
        (state, key, acc), _ = jax.lax.scan(body, (state, key, 0.0), None,
                                            length=chunk)
        return state, key, acc

    roll = jax.jit(roll)
    key = jax.random.PRNGKey(1)
    state, key, _ = roll(state, key)  # compile
    jax.block_until_ready(state.art.q)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, key, r = roll(state, key)
    jax.block_until_ready(state.art.q)
    dt = time.perf_counter() - t0
    return iters * chunk * num_envs / dt


def bench_train_epoch(task: str, num_envs: int = 4096,
                      iters: int = 10) -> float:
    """Full PPO rollout+update fps — the number a `train.py task=Ant`
    user actually gets (reference fps_total, common_agent.py:147-152),
    vs bench_task's pure random-action stepping fps."""
    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.utils.config import (load_task_config,
                                               load_train_config)
    from isaacgymenvs_tpu.learn.runner import Runner

    env = isaacgymenvs_tpu.make(task=task, num_envs=num_envs,
                                cfg=load_task_config(task))
    runner = Runner(env, load_train_config(f"{task}PPO"),
                    logdir="/tmp/bench_train")
    agent = runner.agent
    ts = agent.init()
    ts, m = agent.epoch_fn(ts)  # compile
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, m = agent.epoch_fn(ts)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return iters * agent.cfg.horizon_length * num_envs / dt


def main():
    ant = bench_task("Ant")
    hum = bench_task("Humanoid")
    try:
        ant_train = bench_train_epoch("Ant")
    except Exception as e:  # train-mode bench must never mask the headline
        print(f"train-epoch bench failed: {e}", file=sys.stderr)
        ant_train = 0.0
    # manipulation tier (round-3 Weak #3/#10: the hand hot path was
    # invisible to the driver artifact): ShadowHandOpenAI_FF at the
    # reference 16384-env config, full train-epoch fps — the number that
    # gates whether the 5000-epoch reference recipe is reachable.
    try:
        sh_train = bench_train_epoch("ShadowHandOpenAI_FF",
                                     num_envs=16384, iters=4)
    except Exception as e:
        print(f"shadowhand train bench failed: {e}", file=sys.stderr)
        sh_train = 0.0
    # slowest tier (round-4 Weak #11: Trifinger/Factory fps invisible to
    # BENCH_r*.json while being the binding constraint on VERDICT items
    # 1-3): reference configs — Trifinger 16384 envs, Factory Pick at the
    # 512-env training config used by queue_r5.
    try:
        tf_train = bench_train_epoch("Trifinger", num_envs=16384, iters=2)
    except Exception as e:
        print(f"trifinger train bench failed: {e}", file=sys.stderr)
        tf_train = 0.0
    try:
        # 256, not 512: the 512-env factory graph exceeds the tunneled
        # remote-compile service's limits (round-5 postmortem)
        fp_train = bench_train_epoch("FactoryTaskNutBoltPick",
                                     num_envs=256, iters=2)
    except Exception as e:
        print(f"factory pick train bench failed: {e}", file=sys.stderr)
        fp_train = 0.0
    print(json.dumps({
        "metric": "ant4096_env_steps_per_sec",
        "value": round(ant),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(ant / BASELINE["Ant"], 3),
        "humanoid4096_env_steps_per_sec": round(hum),
        "humanoid_vs_baseline": round(hum / BASELINE["Humanoid"], 3),
        "ant4096_train_epoch_fps": round(ant_train),
        "train_vs_step_ratio": round(ant_train / ant, 3) if ant else 0.0,
        "shadowhand16384_train_epoch_fps": round(sh_train),
        "trifinger16384_train_epoch_fps": round(tf_train),
        "factory_pick256_train_epoch_fps": round(fp_train),
    }))


if __name__ == "__main__":
    main()
