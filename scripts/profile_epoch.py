#!/usr/bin/env python
"""Learner-vs-stepper profile for train_vs_step_ratio (round-5, VERDICT
item 9). Decomposes the Ant-4096 train epoch into:

  step      — pure env stepping, random actions (bench_task measure)
  rollout   — policy forward (+ obs-normalizer) + env step, scanned over
              horizon: what the rollout phase of the epoch costs
  epoch     — full PPO epoch (rollout + GAE + mini-epoch SGD + host sync)

so the BENCH train_vs_step_ratio can be attributed: update share =
(epoch - rollout)/epoch, policy-forward share = (rollout - step)/rollout.

Run on the TPU (single process): python scripts/profile_epoch.py
Writes runs/profile_epoch_r5.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *a, iters=10):
    import jax
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / iters, r


def main():
    import jax
    import jax.numpy as jnp
    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.utils.config import (load_task_config,
                                               load_train_config)
    from isaacgymenvs_tpu.learn.runner import Runner

    task, n = "Ant", 4096
    env = isaacgymenvs_tpu.make(task=task, num_envs=n,
                                cfg=load_task_config(task))
    runner = Runner(env, load_train_config(f"{task}PPO"),
                    logdir="/tmp/profile_epoch")
    agent = runner.agent
    ts = agent.init()
    H = agent.cfg.horizon_length

    # --- full epoch ------------------------------------------------------
    def ep(ts):
        ts2, m = agent.epoch_fn(ts)
        return ts2
    dt_epoch, ts = timeit(ep, ts)

    # --- rollout-only: policy forward + env step over horizon -----------
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))

    def rollout(state, obs):
        def body(carry, _):
            st, ob = carry
            act = agent.act_deterministic(ts, ob)
            st, t = env.step(st, act)
            return (st, t.obs), t.reward
        (state, obs), rews = jax.lax.scan(body, (state, obs), None,
                                          length=H)
        return state, obs, jnp.sum(rews)
    rollout = jax.jit(rollout)
    dt_roll, _ = timeit(lambda: rollout(state, obs))

    # --- pure stepping, random actions ----------------------------------
    def steponly(state, key):
        def body(carry, _):
            st, k, acc = carry
            k, ka = jax.random.split(k)
            act = jax.random.uniform(ka, (n, env.num_acts),
                                     minval=-1.0, maxval=1.0)
            st, t = env.step(st, act)
            acc = acc + jnp.sum(t.obs) + jnp.sum(t.reward) + jnp.sum(t.done)
            return (st, k, acc), None
        (state, key, acc), _ = jax.lax.scan(body, (state, key, 0.0), None,
                                            length=H)
        return state, acc
    steponly = jax.jit(steponly)
    key = jax.random.PRNGKey(1)
    dt_step, _ = timeit(lambda: steponly(state, key))

    out = {
        "task": task, "num_envs": n, "horizon": H,
        "epoch_ms": round(dt_epoch * 1e3, 2),
        "rollout_ms": round(dt_roll * 1e3, 2),
        "step_ms": round(dt_step * 1e3, 2),
        "epoch_fps": round(H * n / dt_epoch),
        "rollout_fps": round(H * n / dt_roll),
        "step_fps": round(H * n / dt_step),
        "update_share_of_epoch": round(1 - dt_roll / dt_epoch, 3),
        "policy_fwd_share_of_rollout": round(1 - dt_step / dt_roll, 3),
        "train_vs_step_ratio": round(dt_step / dt_epoch, 3),
    }
    print(json.dumps(out))
    json.dump(out, open("runs/profile_epoch_r5.json", "w"), indent=1)


if __name__ == "__main__":
    main()
