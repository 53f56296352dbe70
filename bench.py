#!/usr/bin/env python
"""Headline benchmark: Ant-4096 env-steps/s on the available device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: Isaac Gym paper (arXiv:2108.10470) Ant-4096 ≈ 700K env-steps/s
on 1×A100 (BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_ANT_STEPS_PER_SEC = 700_000.0


def main():
    num_envs = 4096
    import isaacgymenvs_tpu

    env = isaacgymenvs_tpu.make(task="Ant", num_envs=num_envs)
    state, obs = env.reset(jax.random.PRNGKey(0))

    chunk = 20  # steps fused per device call

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

    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, key, r = roll(state, key)
    jax.block_until_ready(state.art.q)
    dt = time.perf_counter() - t0

    steps = iters * chunk * num_envs
    sps = steps / dt
    print(json.dumps({
        "metric": "ant4096_env_steps_per_sec",
        "value": round(sps),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / BASELINE_ANT_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
