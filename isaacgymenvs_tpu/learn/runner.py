"""Training runner: epoch loop, checkpointing, metrics, eval player.

Functional analogue of rl_games Runner + the reference CommonAgent.train
epoch loop (`learning/common_agent.py:113-183`): per-epoch fps telemetry,
checkpoint cadence (save_frequency / save_best_after), TensorBoard-or-JSONL
scalars, and a deterministic eval player (`learning/common_player.py:37`).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ppo import PPO, PPOConfig, TrainState


class MetricsWriter:
    """TensorBoard if torch is importable, always JSONL alongside.
    Host-0 only in multi-host runs (reference rank-0 gating,
    `train.py:84-97`, `common_agent.py:140`)."""

    def __init__(self, logdir, enabled: bool = True):
        self.enabled = enabled
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(logdir)
        except Exception:
            pass

    def write(self, step: int, scalars: dict):
        if not self.enabled:
            return
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)


def save_checkpoint(path: str, ts: TrainState, meta: Optional[dict] = None):
    """Orbax-free checkpoint: the TrainState pytree + meta, pickled with
    numpy leaves (reference: rl_games .pth with model/optimizer/RMS stats,
    `common_agent.py:160-183`).

    Multi-host: sharded leaves that span processes are gathered with
    process_allgather so host 0 writes a complete state (np.asarray on a
    non-fully-addressable array raises). process_allgather is a
    COLLECTIVE — every process must call save_checkpoint (the write
    itself is host-0-gated inside); gating the call on host 0 deadlocks
    the shutdown barrier (caught by tests/test_multihost.py)."""

    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    # AMP replay/demo rings are reconstructible sampling state, not model
    # state — dropping them keeps checkpoints ~MBs instead of ~GBs
    # (reference .pth checkpoints likewise exclude the replay buffer)
    import dataclasses as _dc
    for f in ("demo_buf", "demo_n", "replay_buf", "replay_n"):
        if hasattr(ts, f) and getattr(ts, f) is not None:
            ts = _dc.replace(ts, **{f: None})
    host = jax.tree_util.tree_map(to_host, ts)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"train_state": host, "meta": meta or {}}, f)
    os.replace(tmp, path)  # atomic, NFS-retry analogue of safe_filesystem_op


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    ts = jax.tree_util.tree_map(jnp.asarray, blob["train_state"])
    return ts, blob.get("meta", {})


class Runner:
    """runner.run({'train': …, 'play': …, 'checkpoint': …}) equivalent
    (reference train.py:156-161)."""

    def __init__(self, env, train_params: dict, *, seed: int = 0,
                 logdir: str = "runs/default", max_epochs: Optional[int] = None):
        params = train_params.get("params", train_params)
        algo = params.get("algo", {}).get("name", "a2c_continuous")
        if algo == "sac":
            from .sac import SAC, SACConfig
            cfg = SACConfig.from_rlgames(params)
            if max_epochs is not None:
                import dataclasses
                cfg = dataclasses.replace(cfg, max_epochs=max_epochs)
            self.agent = SAC(env, cfg, seed=seed)
        elif algo == "amp_continuous":
            from .amp import AMP, AMPConfig
            cfg = AMPConfig.from_rlgames(params)
            if max_epochs is not None:
                import dataclasses
                cfg = dataclasses.replace(cfg, max_epochs=max_epochs)
            self.agent = AMP(env, cfg, seed=seed)
        else:
            cfg = PPOConfig.from_rlgames(params)
            if max_epochs is not None:
                import dataclasses
                cfg = dataclasses.replace(cfg, max_epochs=max_epochs)
            self.agent = PPO(env, cfg, seed=seed)
        self.cfg = cfg
        self.env = env
        self.logdir = logdir
        self.host0 = jax.process_index() == 0
        self.writer = MetricsWriter(logdir, enabled=self.host0)
        self.save_freq = train_params.get("params", {}).get(
            "config", {}).get("save_frequency", 50)
        self.save_best_after = train_params.get("params", {}).get(
            "config", {}).get("save_best_after", 100)

    def train(self, checkpoint: Optional[str] = None) -> TrainState:
        ts = self.agent.init()
        if checkpoint:
            loaded, _ = load_checkpoint(checkpoint)
            # fields stripped at save time (AMP replay/demo rings) come
            # back None — refill them from the fresh init state
            import dataclasses as _dc
            refill = {f.name: getattr(ts, f.name)
                      for f in _dc.fields(loaded)
                      if getattr(loaded, f.name) is None
                      and getattr(ts, f.name) is not None}
            ts = _dc.replace(loaded, **refill)
        # multi-chip: shard the env axis over all local devices (no-op on
        # one); `python train.py task=Ant` then trains on every chip —
        # reference parity with the first-class torchrun multi-GPU path
        # (reference train.py:74-82, README.md:170-177)
        from ..parallel.mesh import auto_shard
        ts, mesh = auto_shard(ts, self.env.num_envs)
        if mesh is not None and self.host0:
            print(f"env axis sharded over {mesh.devices.size} devices")
        best = -np.inf
        # --- NaN/divergence tripwire state -------------------------------
        # (round-3 postmortem: a1terrain_r3 went NaN at ~epoch 115 and
        # burned 550 more epochs of NaN at full TPU budget because nothing
        # checked finiteness. rl_games at minimum *surfaces* the numbers;
        # unattended queued runs need a hard tripwire.) `sane_ts` is an
        # on-device reference to the last epoch whose loss/kl/reward were
        # all finite (pytrees are immutable; epoch_fn does not donate).
        sane_ts, sane_epoch, strikes = ts, int(ts.epoch), 0
        steps_per_epoch = getattr(
            self.cfg, "horizon_length",
            getattr(self.cfg, "num_steps_per_episode", 1)) \
            * self.env.num_envs
        nn_dir = os.path.join(self.logdir, "nn")
        t_start = time.time()
        # rolling ~100-episode reward/length window (rl_games
        # games_to_track deque, a2c_common). The previous per-print-window
        # mean was computed over however many episodes finished in ≤10
        # epochs — for SAC's 8-step epochs that is a handful of episodes,
        # and best-ckpt gating once recorded a +4242 "peak" from a
        # single-epoch fluke (runs/ant_sac_r3 epoch 121) that no later
        # real performance could beat.
        from collections import deque
        ep_window: deque = deque()
        win_r = win_n = win_l = 0.0
        ep_rew = 0.0
        # best-ckpt gating must wait for REAL episode data: ep_rew's 0.0
        # placeholder would otherwise be saved as "best" and, for tasks
        # whose true reward is persistently negative, never beaten
        any_episode = False
        for e in range(int(ts.epoch), self.cfg.max_epochs):
            t0 = time.time()
            ts, m = self.agent.epoch_fn(ts)
            # ONE device->host transfer for all scalars: per-scalar float()
            # calls are each a device sync (round 1 lost ~1s/epoch to this
            # over the tunneled TPU — compute was 0.16s/epoch)
            m = jax.device_get(m)
            dt_epoch = time.time() - t0
            fps = steps_per_epoch / dt_epoch
            # --- tripwire: non-finite training signal → restore + LR cut --
            # check EVERY scalar the agent emits, not a hardcoded PPO key
            # set: SAC emits critic_loss/actor_loss and none of
            # loss/kl/reward_mean_step, so a fixed list can never fire
            # for SAC runs (round-4 advisor finding)
            bad = {k: v for k, v in m.items()
                   if np.isscalar(v) or getattr(v, "ndim", 1) == 0
                   if not np.all(np.isfinite(v))}
            if bad:
                strikes += 1
                if self.host0:
                    print(f"TRIPWIRE epoch {e}: non-finite metrics "
                          f"{ {k: float(v) for k, v in bad.items()} } — "
                          f"strike {strikes}/3, restoring epoch "
                          f"{sane_epoch}, lr cut x0.5", flush=True)
                if strikes >= 3:
                    if self.host0:
                        print("TRIPWIRE: 3 strikes — aborting run "
                              "(state rolled back to last finite epoch)",
                              flush=True)
                    ts = sane_ts
                    break
                import dataclasses as _dc
                # halve the LR on sane_ts itself so successive strikes
                # compound (0.5x, 0.25x, …) instead of re-running each
                # retry at the same 0.5x (round-4 advisor finding)
                if hasattr(sane_ts, "lr"):
                    sane_ts = _dc.replace(sane_ts, lr=sane_ts.lr * 0.5)
                ts = sane_ts
                continue
            sane_ts, sane_epoch = ts, e
            if strikes and self.host0:
                print(f"tripwire: recovered at epoch {e}", flush=True)
            strikes = 0
            blown = m.get("episode/safety_blown", 0.0)
            if blown and self.host0 and e % 10 == 0:
                print(f"safety guard: {blown:.1f} envs/step blown at "
                      f"epoch {e}", flush=True)
            n_new = float(m["episode_count"])
            if n_new > 0:
                ep_window.append((float(m["episode_reward_sum"]),
                                  float(m["episode_length_sum"]), n_new))
                win_r += ep_window[-1][0]
                win_l += ep_window[-1][1]
                win_n += n_new
                # drop oldest epochs while ≥100 episodes remain without them
                while len(ep_window) > 1 and win_n - ep_window[0][2] >= 100:
                    r0, l0, n0 = ep_window.popleft()
                    win_r -= r0; win_l -= l0; win_n -= n0
                ep_rew = win_r / win_n
                any_episode = True
            scalars = {f"train/{k}": v for k, v in m.items()
                       if not k.startswith("episode_")}
            scalars.update({
                "rewards/episode": ep_rew,
                "episode_lengths/mean": win_l / max(win_n, 1),
                "performance/step_fps": fps,
            })
            self.writer.write(e, scalars)
            if e % 10 == 0 or e == self.cfg.max_epochs - 1:
                kl = float(m.get("kl", 0.0))
                if self.host0:
                    print(f"epoch {e:5d} | ep_rew {ep_rew:10.2f} | "
                          f"fps {fps:9.0f} | kl {kl:.4f}", flush=True)
            # save_checkpoint must run on EVERY process (its
            # process_allgather is a collective; host 0 does the write) —
            # the triggering predicates (epoch, ep_rew from globally
            # reduced metrics) are identical across hosts
            if self.save_freq and e and e % self.save_freq == 0:
                save_checkpoint(os.path.join(nn_dir, "last.ckpt"), ts,
                                {"epoch": e, "reward": ep_rew})
            if any_episode and e >= self.save_best_after and ep_rew > best:
                best = ep_rew
                save_checkpoint(os.path.join(nn_dir, "best.ckpt"), ts,
                                {"epoch": e, "reward": ep_rew})
        save_checkpoint(os.path.join(nn_dir, "final.ckpt"), ts,
                        {"epoch": self.cfg.max_epochs})
        if self.host0:
            print(f"train done in {time.time()-t_start:.1f}s")
        return ts

    def play(self, checkpoint: Optional[str] = None, games: int = 8,
             max_steps: int = 1000, capture_trajectory: bool = False):
        """Deterministic eval (CommonPlayer.run equivalent).

        capture_trajectory: dump env 0's generalized coordinates per
        step to <logdir>/trajectory.npz for offline re-rendering — the
        headless analogue of the reference's RecordVideo wrapper
        (train.py:114-121; no rasterizer on TPU hosts)."""
        ts = self.agent.init()
        if checkpoint:
            ts, _ = load_checkpoint(checkpoint)
        env = self.env
        key = jax.random.PRNGKey(1234)
        env_state, obs = jax.jit(env.reset)(key)
        step = jax.jit(env.step)
        total_r = np.zeros(env.num_envs)
        finished_r, finished = [], 0
        traj = [] if capture_trajectory else None
        rnn = getattr(self.agent, "rnn", False)
        if rnn:  # recurrent player: thread carry, zero on done
            carry = self.agent.net.initial_carry(env.num_envs)
            first = jnp.ones(env.num_envs)
        for _ in range(max_steps):
            if rnn:
                act, carry = self.agent.act_deterministic_rnn(
                    ts, obs, carry, first)
            else:
                act = self.agent.act_deterministic(ts, obs)
            env_state, t = step(env_state, act)
            if rnn:
                first = t.done.astype(jnp.float32)
            obs = t.obs
            if traj is not None:
                traj.append(np.asarray(env_state.art.q[0]))
            total_r += np.asarray(t.reward)
            d = np.asarray(t.done)
            if d.any():
                finished_r.extend(total_r[d].tolist())
                finished += int(d.sum())
                total_r[d] = 0.0
            if finished >= games:
                break
        if traj:
            path = os.path.join(self.logdir, "trajectory.npz")
            np.savez(path, q=np.stack(traj),
                     body_names=np.asarray(self.env.model.body_names))
            print(f"trajectory dumped to {path}")
        mean_r = float(np.mean(finished_r)) if finished_r else float("nan")
        print(f"play: {finished} episodes, mean reward {mean_r:.2f}")
        # task-metric channel (reference ShadowHandTest eval prints
        # consecutive-success averages, docs/rl_examples.md:161-173)
        for k, v in (t.info or {}).items():
            arr = np.asarray(v)
            if arr.ndim <= 1:
                print(f"play: {k} = {float(np.mean(arr)):.3f}")
        return mean_r
