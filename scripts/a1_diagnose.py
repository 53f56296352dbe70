#!/usr/bin/env python
"""A1Terrain violence isolation (round-5, VERDICT item 4).

Three experiments, CPU-runnable at small batch:
  (i)  zero-action settle: reset N envs, run 2 s (1000 steps @ 500 Hz)
       with zero torques. A freshly reset A1 must settle to a stand
       (base z ~ 0.3 m, |qd| -> 0, no blown envs). Reports height/qd
       stats every 100 steps + blown count.
  (ii) single-env energy audit over the first 50 steps post-reset:
       kinetic energy per step; a healthy settle dissipates, a solver
       injection shows KE spikes.
  (iii) solver sweep at dt=0.002: iterations x warmstart x
       max_depenetration_velocity, scored by settle violence.

Usage: JAX_PLATFORMS=cpu python scripts/a1_diagnose.py [--envs 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def settle_stats(env, n_envs, steps=1000, report_every=100, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    zero = jnp.zeros((n_envs, env.num_acts))
    step = jax.jit(env.step)
    rows = []
    blown_total = 0
    for i in range(steps):
        state, t = step(state, zero)
        if (i + 1) % report_every == 0 or i < 5:
            q = np.asarray(state.art.q)
            qd = np.asarray(state.art.qd)
            done = float(np.asarray(t.done).sum())
            blown = float(np.asarray(
                t.info.get("safety_blown", 0.0)).sum()) \
                if t.info else 0.0
            blown_total += blown
            rows.append(dict(
                step=i + 1,
                z_mean=float(q[:, 2].mean()), z_min=float(q[:, 2].min()),
                z_max=float(q[:, 2].max()),
                qd_max=float(np.abs(qd).max()),
                qd_rms=float(np.sqrt((qd ** 2).mean())),
                done=done, blown=blown))
    return rows, blown_total


def energy_audit(env, steps=50, seed=0):
    """Per-step kinetic energy of env 0 (mass-weighted qd, crude but
    monotone): healthy settle decays; solver injection spikes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    zero = jnp.zeros((env.num_envs, env.num_acts))
    step = jax.jit(env.step)
    ke = []
    for i in range(steps):
        state, t = step(state, zero)
        qd = np.asarray(state.art.qd[0])
        # crude KE proxy: 0.5*(m_total*|v_lin|^2 + |w|^2 + |qd_j|^2)
        ke.append(0.5 * float((qd ** 2).sum()))
    return ke


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--sweep", action="store_true")
    a = ap.parse_args()

    import json

    import isaacgymenvs_tpu

    def make(sim_over=None):
        cfg = {"env": {}, "sim": dict(sim_over or {})}
        return isaacgymenvs_tpu.make(task="A1Terrain", num_envs=a.envs,
                                     cfg=cfg)

    print("=== (i) zero-action settle, default solver config ===")
    env = make()
    rows, blown = settle_stats(env, a.envs, a.steps)
    for r in rows:
        print(json.dumps(r))
    print(f"total blown env-steps: {blown}")

    print("=== (ii) env-0 energy audit, first 50 steps ===")
    ke = energy_audit(env)
    print(json.dumps([round(k, 4) for k in ke]))

    if a.sweep:
        print("=== (iii) solver sweep ===")
        for it in (16, 32):
            for ws in (False, True):
                for dep in (0.5, 0.1):
                    env = make({"num_solver_iterations": it,
                                "warmstart_solver": ws,
                                "max_depenetration_velocity": dep})
                    rows, blown = settle_stats(env, a.envs, 300,
                                               report_every=100)
                    last = rows[-1]
                    print(json.dumps(dict(iters=it, warm=ws, depen=dep,
                                          **last, blown_total=blown)))


if __name__ == "__main__":
    main()
