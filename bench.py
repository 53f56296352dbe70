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
            st, k = carry
            k, ka = jax.random.split(k)
            actions = jax.random.uniform(ka, (num_envs, env.num_acts),
                                         minval=-1.0, maxval=1.0)
            st, ts = env.step(st, actions)
            return (st, k), ts.reward[0]
        (state, key), r = jax.lax.scan(body, (state, key), None, length=chunk)
        return state, key, r

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


def main():
    ant = bench_task("Ant")
    hum = bench_task("Humanoid")
    print(json.dumps({
        "metric": "ant4096_env_steps_per_sec",
        "value": round(ant),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(ant / BASELINE["Ant"], 3),
        "humanoid4096_env_steps_per_sec": round(hum),
        "humanoid_vs_baseline": round(hum / BASELINE["Humanoid"], 3),
    }))


if __name__ == "__main__":
    main()
