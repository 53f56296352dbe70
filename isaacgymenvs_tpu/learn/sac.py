"""SAC with rl_games `sac` semantics, whole-epoch-under-jit.

Replicates the rl_games SACAgent consumed by the reference via
`cfg/train/AntSAC.yaml` (algo name `sac`, `train.py` Runner):
  * twin Q critics + target critics with polyak `critic_tau`;
  * squashed-Gaussian actor with `log_std_bounds`;
  * learnable temperature α toward target entropy −dim(A);
  * `num_steps_per_episode` env steps per epoch, one gradient update per
    env step on `batch_size` samples from a `replay_buffer_size` ring
    buffer; `num_seed_steps` random-action epochs before learning;
  * obs normalization (running mean/std), reward_shaper scale.

TPU-first structure: the replay ring buffer is a fixed on-device pytree;
one jit per epoch = rollout scan + update scan; no host sync.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .networks import MLP
from .running_stats import RunningMeanStd


@dataclasses.dataclass(frozen=True)
class SACConfig:
    gamma: float = 0.99
    critic_tau: float = 0.005
    batch_size: int = 4096
    init_alpha: float = 1.0
    alpha_lr: float = 0.005
    actor_lr: float = 5e-4
    critic_lr: float = 5e-4
    learnable_temperature: bool = True
    num_seed_steps: int = 5
    num_steps_per_episode: int = 8
    replay_buffer_size: int = 1_000_000
    normalize_input: bool = True
    reward_shaper_scale: float = 1.0
    max_epochs: int = 20000
    units: tuple = (512, 256)
    activation: str = "relu"
    log_std_bounds: tuple = (-5.0, 2.0)

    @staticmethod
    def from_rlgames(params: dict) -> "SACConfig":
        cfg = params.get("config", {})
        net = params.get("network", {})
        mlp = net.get("mlp", {})
        rs = cfg.get("reward_shaper", {})
        return SACConfig(
            gamma=cfg.get("gamma", 0.99),
            critic_tau=cfg.get("critic_tau", 0.005),
            batch_size=cfg.get("batch_size", 4096),
            init_alpha=cfg.get("init_alpha", 1.0),
            alpha_lr=float(cfg.get("alpha_lr", 0.005)),
            actor_lr=float(cfg.get("actor_lr", 5e-4)),
            critic_lr=float(cfg.get("critic_lr", 5e-4)),
            learnable_temperature=cfg.get("learnable_temperature", True),
            num_seed_steps=cfg.get("num_seed_steps", 5),
            num_steps_per_episode=cfg.get("num_steps_per_episode", 8),
            replay_buffer_size=cfg.get("replay_buffer_size", 1_000_000),
            normalize_input=cfg.get("normalize_input", True),
            reward_shaper_scale=rs.get("scale_value", 1.0),
            max_epochs=cfg.get("max_epochs", 20000),
            units=tuple(mlp.get("units", (512, 256))),
            activation=mlp.get("activation", "relu"),
            log_std_bounds=tuple(net.get("log_std_bounds", (-5.0, 2.0))),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReplayState:
    """Fixed-capacity on-device ring buffer (reference
    learning/replay_buffer.py:56-105 pattern, batched)."""

    obs: Any
    action: Any
    reward: Any
    next_obs: Any
    not_done: Any
    idx: Any       # () int32 next write slot
    full: Any      # () bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SACTrainState:
    actor_params: Any
    critic_params: Any
    critic_target: Any
    log_alpha: Any
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    obs_rms: RunningMeanStd
    replay: ReplayState
    env_state: Any
    obs: Any
    key: Any
    epoch: Any
    cum_reward: Any
    cum_length: Any


class SAC:
    """Trainer binding a task env to the SAC update."""

    def __init__(self, env, cfg: SACConfig, seed: int = 0):
        self.env = env
        self.cfg = cfg
        self.seed = seed
        self.na = env.num_acts
        self.no = env.num_obs
        self.actor = MLP(units=cfg.units, out_dim=2 * self.na,
                         activation=cfg.activation)
        self.critic = MLP(units=cfg.units, out_dim=1,
                          activation=cfg.activation)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)
        self.alpha_tx = optax.adam(cfg.alpha_lr)
        self.target_entropy = -float(self.na)
        # capacity rounded to a multiple of per-epoch inflow
        inflow = env.num_envs * cfg.num_steps_per_episode
        self.capacity = max(cfg.replay_buffer_size // env.num_envs,
                            cfg.num_steps_per_episode) * env.num_envs
        self.cap_slots = self.capacity // env.num_envs
        del inflow
        self.epoch_fn = jax.jit(self._epoch)

    # ---------------------------------------------------------------- policy
    def _dist(self, params, obs):
        out = self.actor.apply(params, obs)
        mu, log_std = jnp.split(out, 2, axis=-1)
        lo, hi = self.cfg.log_std_bounds
        log_std = lo + 0.5 * (hi - lo) * (jnp.tanh(log_std) + 1)
        return mu, log_std

    def _sample(self, params, obs, key):
        mu, log_std = self._dist(params, obs)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mu.shape)
        pre = mu + std * eps
        a = jnp.tanh(pre)
        # squashed-gaussian logp
        logp = jnp.sum(
            -0.5 * eps ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi)
            - jnp.log(jnp.clip(1 - a ** 2, 1e-6)), axis=-1)
        return a, logp

    def _q(self, params, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        q1 = self.critic.apply(params["q1"], x)[..., 0]
        q2 = self.critic.apply(params["q2"], x)[..., 0]
        return q1, q2

    # ------------------------------------------------------------------ init
    def init(self, key=None) -> SACTrainState:
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        k_env, k_a, k_q1, k_q2, key = jax.random.split(key, 5)
        env_state, obs = jax.jit(self.env.reset)(k_env)  # one compile, not 1000s of tunneled dispatches
        n = self.env.num_envs
        actor_params = self.actor.init(k_a, obs[:1])
        x0 = jnp.concatenate([obs[:1], jnp.zeros((1, self.na))], -1)
        critic_params = {"q1": self.critic.init(k_q1, x0),
                         "q2": self.critic.init(k_q2, x0)}
        cap = self.cap_slots
        replay = ReplayState(
            obs=jnp.zeros((cap, n, self.no)),
            action=jnp.zeros((cap, n, self.na)),
            reward=jnp.zeros((cap, n)),
            next_obs=jnp.zeros((cap, n, self.no)),
            not_done=jnp.zeros((cap, n)),
            idx=jnp.zeros((), jnp.int32),
            full=jnp.zeros((), bool),
        )
        return SACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target=jax.tree_util.tree_map(lambda x: x,
                                                 critic_params),
            log_alpha=jnp.log(jnp.asarray(cfg.init_alpha)),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            obs_rms=RunningMeanStd.create((self.no,)),
            replay=replay,
            env_state=env_state, obs=obs, key=key,
            epoch=jnp.asarray(0, jnp.int32),
            cum_reward=jnp.zeros(n), cum_length=jnp.zeros(n, jnp.int32),
        )

    # ------------------------------------------------------------- epoch fn
    def _norm(self, rms, obs):
        return rms.normalize(obs) if self.cfg.normalize_input else obs

    def _epoch(self, ts: SACTrainState):
        cfg = self.cfg
        env = self.env
        n = env.num_envs
        seed_phase = ts.epoch < cfg.num_seed_steps

        # ------- rollout: num_steps_per_episode env steps ------------------
        def roll(carry, _):
            env_state, obs, key, replay, cum_r, cum_l = carry
            key, ka, kr = jax.random.split(key, 3)
            a_pi, _ = self._sample(ts.actor_params,
                                   self._norm(ts.obs_rms, obs), ka)
            a_rand = jax.random.uniform(kr, (n, self.na), minval=-1.0,
                                        maxval=1.0)
            action = jnp.where(seed_phase, a_rand, a_pi)
            env_state, step_ts = env.step(env_state, action)
            reward = step_ts.reward * cfg.reward_shaper_scale
            # timeout bootstrapping: not_done=1 for timeouts
            not_done = (~step_ts.done | step_ts.timeout).astype(jnp.float32)
            slot = replay.idx % self.cap_slots
            replay = dataclasses.replace(
                replay,
                obs=replay.obs.at[slot].set(obs),
                action=replay.action.at[slot].set(action),
                reward=replay.reward.at[slot].set(reward),
                next_obs=replay.next_obs.at[slot].set(step_ts.obs),
                not_done=replay.not_done.at[slot].set(not_done),
                idx=replay.idx + 1,
                full=replay.full | (replay.idx + 1 >= self.cap_slots),
            )
            cum_r = cum_r + step_ts.reward
            cum_l = cum_l + 1
            d = step_ts.done
            stats = (jnp.sum(jnp.where(d, cum_r, 0.0)),
                     jnp.sum(jnp.where(d, cum_l, 0)), jnp.sum(d))
            cum_r = jnp.where(d, 0.0, cum_r)
            cum_l = jnp.where(d, 0, cum_l)
            return (env_state, step_ts.obs, key, replay, cum_r, cum_l), \
                (obs, stats)

        carry0 = (ts.env_state, ts.obs, ts.key, ts.replay, ts.cum_reward,
                  ts.cum_length)
        (env_state, obs, key, replay, cum_r, cum_l), (obs_seen, ep_stats) = \
            jax.lax.scan(roll, carry0, None,
                         length=cfg.num_steps_per_episode)

        obs_rms = (ts.obs_rms.update(obs_seen.reshape(-1, self.no))
                   if cfg.normalize_input else ts.obs_rms)

        # ------- updates: one per env step ---------------------------------
        def update(carry, k):
            actor_params, critic_params, critic_target, log_alpha, \
                a_opt, c_opt, al_opt = carry
            k1, k2, k3, k4 = jax.random.split(k, 4)
            n_slots = jnp.where(replay.full, self.cap_slots, replay.idx)
            slot = jax.random.randint(k1, (cfg.batch_size,), 0,
                                      jnp.maximum(n_slots, 1))
            envi = jax.random.randint(k2, (cfg.batch_size,), 0, n)
            o = self._norm(obs_rms, replay.obs[slot, envi])
            no_ = self._norm(obs_rms, replay.next_obs[slot, envi])
            a = replay.action[slot, envi]
            r = replay.reward[slot, envi]
            nd = replay.not_done[slot, envi]
            alpha = jnp.exp(log_alpha)

            # critic update
            na_, nlogp = self._sample(actor_params, no_, k3)
            tq1, tq2 = self._q(critic_target, no_, na_)
            target_v = jnp.minimum(tq1, tq2) - alpha * nlogp
            target_q = r + nd * cfg.gamma * target_v
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss(cp):
                q1, q2 = self._q(cp, o, a)
                return jnp.mean((q1 - target_q) ** 2
                                + (q2 - target_q) ** 2)

            closs, cgrad = jax.value_and_grad(critic_loss)(critic_params)
            cup, c_opt = self.critic_tx.update(cgrad, c_opt, critic_params)
            critic_params = optax.apply_updates(critic_params, cup)

            # actor update
            def actor_loss(ap):
                a_new, logp = self._sample(ap, o, k4)
                q1, q2 = self._q(critic_params, o, a_new)
                q = jnp.minimum(q1, q2)
                return jnp.mean(alpha * logp - q), jnp.mean(logp)

            (aloss, mean_logp), agrad = jax.value_and_grad(
                actor_loss, has_aux=True)(actor_params)
            aup, a_opt = self.actor_tx.update(agrad, a_opt, actor_params)
            actor_params = optax.apply_updates(actor_params, aup)

            # temperature update
            if cfg.learnable_temperature:
                def alpha_loss(la):
                    return jnp.exp(la) * jnp.mean(
                        -mean_logp - self.target_entropy)

                alloss, algrad = jax.value_and_grad(alpha_loss)(log_alpha)
                alup, al_opt = self.alpha_tx.update(algrad, al_opt,
                                                    log_alpha)
                log_alpha = optax.apply_updates(log_alpha, alup)
            else:
                alloss = jnp.zeros(())

            # polyak target update
            critic_target = jax.tree_util.tree_map(
                lambda t, p: (1 - cfg.critic_tau) * t + cfg.critic_tau * p,
                critic_target, critic_params)
            return (actor_params, critic_params, critic_target, log_alpha,
                    a_opt, c_opt, al_opt), (closs, aloss, alloss)

        key, *ukeys = jax.random.split(key, cfg.num_steps_per_episode + 1)
        carry = (ts.actor_params, ts.critic_params, ts.critic_target,
                 ts.log_alpha, ts.actor_opt, ts.critic_opt, ts.alpha_opt)

        def do_updates(carry):
            return jax.lax.scan(update, carry, jnp.stack(ukeys))

        def skip_updates(carry):
            z = jnp.zeros(cfg.num_steps_per_episode)
            return carry, (z, z, z)

        carry, (closs, aloss, alloss) = jax.lax.cond(
            ~seed_phase, do_updates, skip_updates, carry)
        (actor_params, critic_params, critic_target, log_alpha,
         a_opt, c_opt, al_opt) = carry

        metrics = dict(
            critic_loss=jnp.mean(closs), actor_loss=jnp.mean(aloss),
            alpha_loss=jnp.mean(alloss), alpha=jnp.exp(log_alpha),
            episode_reward_sum=jnp.sum(ep_stats[0]),
            episode_length_sum=jnp.sum(ep_stats[1]),
            episode_count=jnp.sum(ep_stats[2]),
        )
        new_ts = SACTrainState(
            actor_params=actor_params, critic_params=critic_params,
            critic_target=critic_target, log_alpha=log_alpha,
            actor_opt=a_opt, critic_opt=c_opt, alpha_opt=al_opt,
            obs_rms=obs_rms, replay=replay, env_state=env_state, obs=obs,
            key=key, epoch=ts.epoch + 1, cum_reward=cum_r, cum_length=cum_l)
        return new_ts, metrics

    def act_deterministic(self, ts: SACTrainState, obs):
        mu, _ = self._dist(ts.actor_params, self._norm(ts.obs_rms, obs))
        return jnp.tanh(mu)
