"""AMP: PPO + adversarial motion prior discriminator.

Parity with the reference custom agent stack (`learning/amp_continuous.py`
561 LoC, `learning/amp_models.py`, `learning/amp_network_builder.py`,
`learning/replay_buffer.py`):
  * rollout collects per-step `amp_obs` from env extras
    (`play_steps` `:91-162`);
  * reward mix `task_reward_w·r + disc_reward_w·(−log(1−σ(D)))·scale`
    (`_combine_rewards` `:500-504`, `_calc_disc_rewards` `:513-520`);
  * disc BCE (agent→0, demo→1)/2 + logit-weight L2 `disc_logit_reg` +
    demo gradient penalty `disc_grad_penalty` + `disc_weight_decay`
    (`_disc_loss` `:399-434`), combined with the PPO losses at `disc_coef`
    (`calc_gradients` `:255-330`);
  * demo buffer + replay buffer of agent amp-obs with keep-prob
    (`_build_amp_buffers` `:462-477`, `_store_replay_amp_obs` `:522-531`);
  * amp-input running mean/std normalization shared by policy batches,
    replay and demo (`:79-89`).

TPU-first: demo/replay buffers are fixed on-device rings; the whole epoch
(rollout scan → GAE → minibatch SGD incl. disc) is one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .networks import MLP
from .ppo import PPO, PPOConfig, TrainState, _gauss_kl, _gauss_logp
from .running_stats import RunningMeanStd


@dataclasses.dataclass(frozen=True)
class AMPConfig(PPOConfig):
    amp_obs_demo_buffer_size: int = 200_000
    amp_replay_buffer_size: int = 1_000_000
    amp_replay_keep_prob: float = 0.01
    amp_batch_size: int = 512
    amp_minibatch_size: int = 4096
    disc_coef: float = 5.0
    disc_logit_reg: float = 0.05
    disc_grad_penalty: float = 5.0
    disc_reward_scale: float = 2.0
    disc_weight_decay: float = 1e-4
    normalize_amp_input: bool = True
    task_reward_w: float = 0.0
    disc_reward_w: float = 1.0
    disc_units: tuple = (1024, 512)

    @staticmethod
    def from_rlgames(params: dict) -> "AMPConfig":
        base = PPOConfig.from_rlgames(params)
        cfg = params.get("config", {})
        net = params.get("network", {})
        disc = net.get("disc", {})
        return AMPConfig(
            **dataclasses.asdict(base),
            amp_obs_demo_buffer_size=cfg.get("amp_obs_demo_buffer_size",
                                             200_000),
            amp_replay_buffer_size=cfg.get("amp_replay_buffer_size",
                                           1_000_000),
            amp_replay_keep_prob=cfg.get("amp_replay_keep_prob", 0.01),
            amp_batch_size=cfg.get("amp_batch_size", 512),
            amp_minibatch_size=cfg.get("amp_minibatch_size", 4096),
            disc_coef=cfg.get("disc_coef", 5.0),
            disc_logit_reg=cfg.get("disc_logit_reg", 0.05),
            disc_grad_penalty=cfg.get("disc_grad_penalty", 5.0),
            disc_reward_scale=cfg.get("disc_reward_scale", 2.0),
            disc_weight_decay=cfg.get("disc_weight_decay", 1e-4),
            normalize_amp_input=cfg.get("normalize_amp_input", True),
            task_reward_w=cfg.get("task_reward_w", 0.0),
            disc_reward_w=cfg.get("disc_reward_w", 1.0),
            disc_units=tuple(disc.get("units", (1024, 512))),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMPTrainState(TrainState):
    disc_params: Any = None
    amp_rms: RunningMeanStd = None
    demo_buf: Any = None       # (D, namp)
    demo_n: Any = None         # () int32
    replay_buf: Any = None     # (R, namp)
    replay_n: Any = None


class AMP(PPO):
    """AMP agent: PPO machinery + discriminator head and buffers."""

    def __init__(self, env, cfg: AMPConfig, seed: int = 0):
        self.namp = env.num_amp_obs
        self.disc = MLP(units=cfg.disc_units, activation="relu", out_dim=1)
        super().__init__(env, cfg, seed=seed)
        n = env.num_envs
        self.demo_cap = max(cfg.amp_obs_demo_buffer_size
                            // cfg.amp_batch_size, 1) * cfg.amp_batch_size
        self.replay_cap = max(cfg.amp_replay_buffer_size
                              // (cfg.horizon_length * n), 1) \
            * cfg.horizon_length * n

    def init(self, key=None) -> AMPTrainState:
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        base = super().init(key)
        kd, kdemo = jax.random.split(jax.random.fold_in(key, 7))
        disc_params = self.disc.init(kd, jnp.zeros((1, self.namp)))
        demo0 = self.env.fetch_amp_obs_demo(kdemo, self.cfg.amp_batch_size)
        demo_buf = jnp.zeros((self.demo_cap, self.namp))
        demo_buf = demo_buf.at[:demo0.shape[0]].set(demo0)
        ts = AMPTrainState(
            **{f.name: getattr(base, f.name)
               for f in dataclasses.fields(TrainState)},
            disc_params=disc_params,
            amp_rms=RunningMeanStd.create((self.namp,)),
            demo_buf=demo_buf,
            demo_n=jnp.asarray(demo0.shape[0], jnp.int32),
            replay_buf=jnp.zeros((self.replay_cap, self.namp)),
            replay_n=jnp.zeros((), jnp.int32),
        )
        # include disc params in the optimizer
        opt_state = self.tx.init((base.params, disc_params))
        return dataclasses.replace(ts, opt_state=opt_state)

    # ----------------------------------------------------------------- disc
    def _disc_logits(self, disc_params, amp_obs):
        return self.disc.apply(disc_params, amp_obs)[..., 0]

    def _norm_amp(self, rms, x):
        return rms.normalize(x) if self.cfg.normalize_amp_input else x

    def _disc_reward(self, disc_params, amp_rms, amp_obs):
        """r = −log(max(1 − σ(D), 1e-4)) · scale (amp_continuous.py:513-520)."""
        logits = self._disc_logits(disc_params,
                                   self._norm_amp(amp_rms, amp_obs))
        prob = jax.nn.sigmoid(logits)
        return -jnp.log(jnp.maximum(1 - prob, 1e-4)) \
            * self.cfg.disc_reward_scale

    # ------------------------------------------------------------- epoch fn
    def _epoch(self, ts: AMPTrainState):
        cfg = self.cfg
        env = self.env
        n = env.num_envs

        # ---------------- rollout ------------------------------------------
        def rollout_step(carry, _):
            env_state, obs, key, cum_r, cum_l = carry
            key, k_act = jax.random.split(key)
            mu, log_sig, v_n = self._forward(ts.params, ts.obs_rms, obs)
            value = ts.value_rms.unnormalize(v_n) if cfg.normalize_value \
                else v_n
            sigma = jnp.exp(log_sig)
            action = mu + sigma * jax.random.normal(k_act, mu.shape)
            logp = _gauss_logp(mu, log_sig, action)
            env_state, step_ts = env.step(env_state, action)
            amp_obs = step_ts.info["amp_obs"]
            task_r = step_ts.reward * cfg.reward_shaper_scale
            cum_r = cum_r + step_ts.reward
            cum_l = cum_l + 1
            d = step_ts.done
            stats = (jnp.sum(jnp.where(d, cum_r, 0.0)),
                     jnp.sum(jnp.where(d, cum_l, 0)), jnp.sum(d))
            cum_r = jnp.where(d, 0.0, cum_r)
            cum_l = jnp.where(d, 0, cum_l)
            data = dict(obs=obs, action=action, logp=logp, value=value,
                        reward=task_r, done=d, mu=mu, amp_obs=amp_obs,
                        timeout=step_ts.timeout)
            return (env_state, step_ts.obs, key, cum_r, cum_l), (data, stats)

        carry0 = (ts.env_state, ts.obs, ts.key, ts.cum_reward, ts.cum_length)
        (env_state, last_obs, key, cum_r, cum_l), (batch, ep_stats) = \
            jax.lax.scan(rollout_step, carry0, None,
                         length=cfg.horizon_length)

        # ---------------- AMP reward mixing --------------------------------
        disc_r = self._disc_reward(ts.disc_params, ts.amp_rms,
                                   batch["amp_obs"])
        reward = cfg.task_reward_w * batch["reward"] \
            + cfg.disc_reward_w * disc_r
        if cfg.value_bootstrap:
            reward = reward + cfg.gamma * batch["value"] * batch["timeout"]
        batch = {**batch, "reward": reward}

        # ---------------- GAE ----------------------------------------------
        _, _, v_last_n = self._forward(ts.params, ts.obs_rms, last_obs)
        v_last = (ts.value_rms.unnormalize(v_last_n) if cfg.normalize_value
                  else v_last_n)

        def gae_step(carry, data_t):
            gae, v_next = carry
            nonterminal = 1.0 - data_t["done"].astype(jnp.float32)
            delta = (data_t["reward"] + cfg.gamma * v_next * nonterminal
                     - data_t["value"])
            gae = delta + cfg.gamma * cfg.tau * nonterminal * gae
            return (gae, data_t["value"]), gae

        (_, _), adv = jax.lax.scan(gae_step, (jnp.zeros_like(v_last), v_last),
                                   batch, reverse=True)
        returns = adv + batch["value"]

        obs_rms = (ts.obs_rms.update(batch["obs"].reshape(-1, env.num_obs))
                   if cfg.normalize_input else ts.obs_rms)
        value_rms = (ts.value_rms.update(returns.reshape(-1))
                     if cfg.normalize_value else ts.value_rms)
        flat_amp = batch["amp_obs"].reshape(-1, self.namp)

        # ---------------- demo + replay buffer updates ---------------------
        key, k_demo, k_keep, k_slot = jax.random.split(key, 4)
        demo_new = env.fetch_amp_obs_demo(k_demo, cfg.amp_batch_size)
        # normalizer sees agent AND demo samples (the reference's torch
        # RunningMeanStd updates on every train-mode _preproc_amp_obs
        # call, amp_continuous.py — demo batches included); an
        # agent-only mean drifts the demo cluster off-center and hands
        # the discriminator a normalization-side separator
        amp_rms = (ts.amp_rms.update(
            jnp.concatenate([flat_amp, demo_new], axis=0))
            if cfg.normalize_amp_input else ts.amp_rms)
        di = ts.demo_n % self.demo_cap
        demo_buf = jax.lax.dynamic_update_slice(
            ts.demo_buf, demo_new, (di, jnp.zeros((), jnp.int32)))
        demo_n = jnp.minimum(ts.demo_n + cfg.amp_batch_size, self.demo_cap)

        keep = jax.random.uniform(k_keep, (flat_amp.shape[0],)) \
            < cfg.amp_replay_keep_prob
        slots = jax.random.randint(k_slot, (flat_amp.shape[0],), 0,
                                   self.replay_cap)
        # not-yet-full: fill sequentially instead
        seq = (ts.replay_n + jnp.cumsum(keep) - 1) % self.replay_cap
        full = ts.replay_n >= self.replay_cap
        write_slots = jnp.where(full, slots, seq)
        write_slots = jnp.where(keep, write_slots, self.replay_cap)  # drop
        replay_buf = ts.replay_buf
        pad = jnp.zeros((1, self.namp))
        replay_ext = jnp.concatenate([replay_buf, pad], 0)
        replay_ext = replay_ext.at[write_slots].set(flat_amp)
        replay_buf = replay_ext[:-1]
        replay_n = jnp.minimum(ts.replay_n + jnp.sum(keep), self.replay_cap)

        # ---------------- minibatch SGD (PPO + disc) -----------------------
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), batch)
        flat_returns = returns.reshape(-1)
        flat_adv = adv.reshape(-1)
        if cfg.normalize_advantage:
            flat_adv = (flat_adv - flat_adv.mean()) / (flat_adv.std() + 1e-8)
        old_values_n = (value_rms.normalize(flat["value"], clip=0.0)
                        if cfg.normalize_value else flat["value"])
        targets_n = (value_rms.normalize(flat_returns, clip=0.0)
                     if cfg.normalize_value else flat_returns)
        total = flat_returns.shape[0]
        namp_mb = min(cfg.amp_minibatch_size, cfg.minibatch_size)

        def loss_fn(both, mb):
            params, disc_params = both
            o = (obs_rms.normalize(mb["obs"]) if cfg.normalize_input
                 else mb["obs"])
            mu, log_sig, v_n = self.net.apply(params, o)
            logp = _gauss_logp(mu, log_sig, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            surr1 = mb["adv"] * ratio
            surr2 = mb["adv"] * jnp.clip(ratio, 1 - cfg.e_clip,
                                         1 + cfg.e_clip)
            a_loss = -jnp.mean(jnp.minimum(surr1, surr2))
            if cfg.clip_value:
                v_clip = mb["old_v"] + jnp.clip(v_n - mb["old_v"],
                                                -cfg.e_clip, cfg.e_clip)
                c_loss = jnp.maximum((v_n - mb["target"]) ** 2,
                                     (v_clip - mb["target"]) ** 2)
            else:
                c_loss = (v_n - mb["target"]) ** 2
            c_loss = jnp.mean(c_loss)
            entropy = jnp.mean(jnp.sum(
                log_sig + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1))
            sb = 1.1
            b_loss = jnp.mean(jnp.sum(
                jnp.maximum(mu - sb, 0.0) ** 2
                + jnp.minimum(mu + sb, 0.0) ** 2, axis=-1))

            # ---- disc loss (amp_continuous.py:399-434) ----
            agent_amp = self._norm_amp(amp_rms, mb["amp_agent"])
            demo_amp = self._norm_amp(amp_rms, mb["amp_demo"])
            agent_logit = self._disc_logits(disc_params, agent_amp)

            def demo_logit_fn(x):
                return jnp.sum(self._disc_logits(disc_params, x))

            demo_logit = self._disc_logits(disc_params, demo_amp)
            bce_agent = jnp.mean(jax.nn.softplus(agent_logit))   # -log σ(-x)
            bce_demo = jnp.mean(jax.nn.softplus(-demo_logit))    # -log σ(x)
            disc_loss = 0.5 * (bce_agent + bce_demo)
            # logit-layer weight L2 (last Dense kernel)
            leaves = jax.tree_util.tree_leaves_with_path(disc_params)
            logit_w = [l for p, l in leaves
                       if l.ndim == 2][-1]
            disc_loss = disc_loss + cfg.disc_logit_reg \
                * jnp.sum(logit_w ** 2)
            # gradient penalty on demo obs
            grad_demo = jax.grad(demo_logit_fn)(demo_amp)
            gp = jnp.mean(jnp.sum(grad_demo ** 2, axis=-1))
            disc_loss = disc_loss + cfg.disc_grad_penalty * gp
            # weight decay over all disc kernels
            wd = sum(jnp.sum(l ** 2) for p, l in leaves if l.ndim == 2)
            disc_loss = disc_loss + cfg.disc_weight_decay * wd

            loss = (a_loss + 0.5 * cfg.critic_coef * c_loss
                    - cfg.entropy_coef * entropy
                    + cfg.bounds_loss_coef * b_loss
                    + cfg.disc_coef * disc_loss)
            kl = jnp.mean(_gauss_kl(mb["mu"], mb["old_log_sig"], mu,
                                    log_sig))
            # disc accuracies for telemetry
            acc_agent = jnp.mean((agent_logit < 0).astype(jnp.float32))
            acc_demo = jnp.mean((demo_logit > 0).astype(jnp.float32))
            aux = dict(a_loss=a_loss, c_loss=c_loss, entropy=entropy,
                       kl=kl, disc_loss=disc_loss, acc_agent=acc_agent,
                       acc_demo=acc_demo)
            return loss, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        old_log_sig = self.net.apply(ts.params, last_obs[:1])[1]

        def mb_update(carry, inp):
            params, disc_params, opt_state, lr, key = carry
            idx, k = inp
            k1, k2, k3 = jax.random.split(k, 3)
            take = lambda x: x[idx]
            # amp minibatches: half replay, half rollout (when replay has
            # data, amp_continuous.py:183-191), demo from demo buffer
            amp_idx = jax.random.randint(k1, (namp_mb,), 0, total)
            n_replay = jnp.maximum(replay_n, 1)
            r_idx = jax.random.randint(k2, (namp_mb,), 0, n_replay)
            use_replay = (jax.random.uniform(k1, (namp_mb,)) < 0.5) \
                & (replay_n > 0)
            amp_agent = jnp.where(use_replay[:, None],
                                  replay_buf[r_idx], flat_amp[amp_idx])
            d_idx = jax.random.randint(k3, (namp_mb,), 0,
                                       jnp.maximum(demo_n, 1))
            mb = dict(obs=take(flat["obs"]), action=take(flat["action"]),
                      logp=take(flat["logp"]), mu=take(flat["mu"]),
                      adv=take(flat_adv), old_v=take(old_values_n),
                      target=take(targets_n), old_log_sig=old_log_sig,
                      amp_agent=amp_agent, amp_demo=demo_buf[d_idx])
            (loss, aux), grads = grad_fn((params, disc_params), mb)
            updates, opt_state = self.tx.update(grads, opt_state,
                                                (params, disc_params))
            params, disc_params = optax.apply_updates(
                (params, disc_params),
                jax.tree_util.tree_map(lambda u: -lr * u, updates))
            if cfg.lr_schedule == "adaptive":
                kl = aux["kl"]
                lr = jnp.where(kl > 2.0 * cfg.kl_threshold,
                               jnp.maximum(lr / 1.5, 1e-6), lr)
                lr = jnp.where(kl < 0.5 * cfg.kl_threshold,
                               jnp.minimum(lr * 1.5, 1e-2), lr)
            return (params, disc_params, opt_state, lr, key), \
                (loss, aux["kl"], aux["disc_loss"], aux["acc_agent"],
                 aux["acc_demo"])

        key, *ekeys = jax.random.split(key, cfg.mini_epochs + 1)
        carry = (ts.params, ts.disc_params, ts.opt_state, ts.lr, key)
        metrics_mb = []
        for ek in ekeys:
            perm = jax.random.permutation(ek, total)
            idxs = perm.reshape(self.num_minibatches, cfg.minibatch_size)
            mbk = jax.random.split(jax.random.fold_in(ek, 1),
                                   self.num_minibatches)
            carry, m = jax.lax.scan(mb_update, carry, (idxs, mbk))
            metrics_mb.append(m)
        params, disc_params, opt_state, lr, key = carry

        metrics = dict(
            loss=jnp.mean(jnp.stack([m[0] for m in metrics_mb])),
            kl=jnp.mean(jnp.stack([m[1] for m in metrics_mb])),
            disc_loss=jnp.mean(jnp.stack([m[2] for m in metrics_mb])),
            disc_acc_agent=jnp.mean(jnp.stack([m[3] for m in metrics_mb])),
            disc_acc_demo=jnp.mean(jnp.stack([m[4] for m in metrics_mb])),
            disc_reward_mean=jnp.mean(disc_r),
            lr=lr,
            episode_reward_sum=jnp.sum(ep_stats[0]),
            episode_length_sum=jnp.sum(ep_stats[1]),
            episode_count=jnp.sum(ep_stats[2]),
        )
        new_ts = dataclasses.replace(
            ts, params=params, opt_state=opt_state, lr=lr, obs_rms=obs_rms,
            value_rms=value_rms, env_state=env_state, obs=last_obs, key=key,
            epoch=ts.epoch + 1, cum_reward=cum_r, cum_length=cum_l,
            disc_params=disc_params, amp_rms=amp_rms,
            demo_buf=demo_buf, demo_n=demo_n,
            replay_buf=replay_buf, replay_n=replay_n)
        return new_ts, metrics
