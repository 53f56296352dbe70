#!/usr/bin/env python
"""Deterministic evaluation of a finished run:

    python scripts/eval_run.py runs/<name> [--envs 16] [--steps 1000]
        [--traj] [--json out.json]

Loads the run's dumped config.yaml (task + train), rebuilds the env at a
small batch, restores nn/best.ckpt, rolls the deterministic policy, and
reports mean episode reward + the task-metric channel (consecutive
successes, lift success, ...). CPU-friendly (use PALLAS_AXON_POOL_IPS=
JAX_PLATFORMS=cpu for evals while the TPU trains)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run")
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--ckpt", default="best.ckpt")
    ap.add_argument("--traj", action="store_true")
    ap.add_argument("--json", default="")
    a = ap.parse_args()

    import yaml
    import numpy as np
    import jax
    import jax.numpy as jnp
    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.learn.runner import Runner, load_checkpoint

    blob = yaml.safe_load(open(os.path.join(a.run, "config.yaml")))
    task_cfg, train_cfg = blob["task"], blob["train"]
    task = task_cfg.get("name", "Ant")
    task_cfg.setdefault("env", {})["numEnvs"] = a.envs
    env = isaacgymenvs_tpu.make(task=task, num_envs=a.envs, cfg=task_cfg)
    runner = Runner(env, train_cfg, seed=0, logdir=a.run)
    ckpt = os.path.join(a.run, "nn", a.ckpt)
    ts, meta = load_checkpoint(ckpt)
    print(f"ckpt {ckpt} meta={meta}")

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(123))
    step = jax.jit(env.step)
    rnn = getattr(runner.agent, "rnn", False)
    if rnn:
        carry = runner.agent.net.initial_carry(a.envs)
        first = jnp.ones(a.envs)
    total_r = np.zeros(a.envs)
    finished_r, finished_l, cur_l = [], [], np.zeros(a.envs)
    traj = [] if a.traj else None
    info_last = {}
    final_acc = {}
    for i in range(a.steps):
        if rnn:
            act, carry = runner.agent.act_deterministic_rnn(ts, obs, carry,
                                                            first)
        else:
            act = runner.agent.act_deterministic(ts, obs)
        state, t = step(state, act)
        obs = t.obs
        if rnn:
            first = t.done.astype(jnp.float32)
        if traj is not None:
            traj.append(np.asarray(state.art.q[0]))
        total_r += np.asarray(t.reward)
        cur_l += 1
        d = np.asarray(t.done)
        if d.any():
            finished_r.extend(total_r[d].tolist())
            finished_l.extend(cur_l[d].tolist())
            total_r[d] = 0.0
            cur_l[d] = 0
        for k, v in (t.info or {}).items():
            arr = np.asarray(v)
            if arr.ndim > 1:
                continue
            if k.startswith("final/") and arr.shape == d.shape:
                # done-gated accumulation over the whole rollout — the
                # direct average over envs at episode end, mirroring the
                # learner's aggregation (learn/ppo.py) and the reference
                # ShadowHandTest protocol (docs/rl_examples.md:166-168).
                # Averaging over ALL envs at the last step mis-states
                # success rates (round-4 advisor finding).
                s, c = final_acc.get(k, (0.0, 0.0))
                final_acc[k] = (s + float(np.sum(arr * d)),
                                c + float(np.sum(d)))
            else:
                info_last[k] = float(np.mean(arr))
    out = {
        "run": a.run, "ckpt": a.ckpt, "meta": {k: float(v) if
                                               isinstance(v, (int, float))
                                               else str(v)
                                               for k, v in meta.items()},
        "episodes": len(finished_r),
        "mean_episode_reward": float(np.mean(finished_r)) if finished_r
        else None,
        "mean_episode_length": float(np.mean(finished_l)) if finished_l
        else None,
        "task_metrics_final": {
            **info_last,
            **{k: (s / c if c else None)
               for k, (s, c) in final_acc.items()},
        },
        "final_episode_counts": {k: c for k, (s, c) in final_acc.items()},
    }
    print(json.dumps(out, indent=1))
    if traj:
        np.savez(os.path.join(a.run, "trajectory.npz"), q=np.stack(traj),
                 body_names=np.asarray(env.model.body_names))
        print("trajectory dumped")
    if a.json:
        json.dump(out, open(a.json, "w"), indent=1)


if __name__ == "__main__":
    main()
