"""Policy export for deployment — the fork's network extractor.

Replaces `network_extractor/extract_network.py` (the RPL-CS-UCL fork's
tool that turns an rl_games checkpoint into a traced TorchScript module
embedding obs normalization, `:35-72`): here a checkpoint becomes
  * a flat `.npz` of policy weights + obs-normalizer stats (portable to
    any runtime), and
  * a jittable pure function `obs → action` with the running-mean-std
    baked in (exportable further via jax2tf / StableHLO if needed).

Includes the reference's retry-with-backoff filesystem wrapper
(`safe_filesystem_op`, `extract_network.py:13-28`) for flaky NFS.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def safe_filesystem_op(func, *args, num_attempts: int = 5, **kwargs):
    """Retry-with-backoff for NFS flakiness (extract_network.py:13-28)."""
    for attempt in range(num_attempts):
        try:
            return func(*args, **kwargs)
        except Exception as exc:
            if attempt + 1 >= num_attempts:
                raise RuntimeError(
                    f"filesystem op failed after {num_attempts} attempts"
                ) from exc
            time.sleep(2 ** attempt)


def extract_policy(checkpoint_path: str, env_task: str = "Ant",
                   num_envs: int = 1):
    """(policy_fn, flat_weights dict): deterministic obs→action closure
    with normalization baked in, plus exportable flat weights."""
    from ..learn.runner import load_checkpoint
    from ..learn.ppo import PPO, PPOConfig
    from ..api import make

    ts, meta = safe_filesystem_op(load_checkpoint, checkpoint_path)
    env = make(task=env_task, num_envs=num_envs)
    agent = PPO(env, PPOConfig(), seed=0)

    mean = ts.obs_rms.mean
    var = ts.obs_rms.var
    params = ts.params

    def policy_fn(obs):
        o = jnp.clip((obs - mean) / jnp.sqrt(var + 1e-5), -5.0, 5.0)
        mu, _, _ = agent.net.apply(params, o)
        return jnp.clip(mu, -1.0, 1.0)

    flat = {"obs_mean": np.asarray(mean), "obs_var": np.asarray(var)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[name] = np.asarray(leaf)
    return jax.jit(policy_fn), flat


def export_npz(checkpoint_path: str, out_path: str, env_task: str = "Ant"):
    """CLI-facing export: checkpoint → portable .npz."""
    _, flat = extract_policy(checkpoint_path, env_task)
    safe_filesystem_op(np.savez, out_path, **flat)
    return out_path


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--task", default="Ant")
    a = ap.parse_args()
    export_npz(a.checkpoint, a.out, a.task)
    print(f"exported {a.checkpoint} -> {a.out}")
