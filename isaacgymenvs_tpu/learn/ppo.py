"""PPO with rl_games `a2c_continuous` semantics, whole-epoch-under-jit.

Replicates (for return parity — SURVEY.md §7 key idioms):
  * reward shaping ``scale_value``, obs/value running-mean-std
    normalization, advantage normalization
  * GAE with explicit next-values and termination masking
    (`learning/common_agent.py:413-426`)
  * value bootstrap on timeout using V(s_t)
    (rl_games A2CBase.play_steps, `extras["time_outs"]` contract of
    `vec_task.py:345`)
  * clipped PG + clipped value loss (0.5·critic_coef), entropy, soft
    action-bound loss at ±1.1 (`common_agent.py:427-435`)
  * adaptive-KL learning rate, schedule_type "legacy" (per-minibatch
    update) with bounds [1e-6, 1e-2]
  * hyperparameters read from the same YAML keys (`cfg/train/*PPO.yaml`)

TPU-first structure: one jit per epoch — rollout `lax.scan` over the
horizon (env step fused inside), GAE reverse scan, minibatch SGD as a
`lax.scan` over (mini_epochs × num_minibatches) with the adaptive LR in
the carry. No host sync inside the epoch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .networks import ActorCritic
from .running_stats import RunningMeanStd


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Static hyperparameters (hashable — part of the jit cache key).
    Field names mirror rl_games config keys."""

    horizon_length: int = 16
    minibatch_size: int = 32768
    mini_epochs: int = 4
    gamma: float = 0.99
    tau: float = 0.95           # GAE lambda
    learning_rate: float = 3e-4
    lr_schedule: str = "adaptive"
    schedule_type: str = "legacy"
    kl_threshold: float = 0.008
    e_clip: float = 0.2
    clip_value: bool = True
    critic_coef: float = 2.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.0001
    grad_norm: float = 1.0
    truncate_grads: bool = False
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    value_bootstrap: bool = True
    reward_shaper_scale: float = 0.01
    max_epochs: int = 500
    units: tuple = (256, 128, 64)
    activation: str = "elu"
    separate: bool = False
    mixed_precision: bool = True   # bf16 trunk matmuls on TPU
    # asymmetric critic over privileged states (central_value_config,
    # reference cfg/train/ShadowHandPPOAsymm*.yaml)
    central_value: bool = False
    cv_units: tuple = (512, 256, 128)
    cv_activation: str = "elu"
    # recurrent central value (central_value_config.network.rnn,
    # ShadowHandPPOAsymmLSTM.yaml:87-103); only valid with a recurrent
    # policy (the BPTT chunking is shared)
    cv_rnn_units: int = 0
    cv_rnn_layers: int = 1
    cv_rnn_before_mlp: bool = True
    cv_rnn_layer_norm: bool = True
    # rl_games `rnn: lstm` policy (ShadowHandPPOAsymmLSTM.yaml:33-38):
    # rnn_units=0 disables; BPTT over seq_len chunks with stored-state
    # initialization, hidden zeroed at episode starts.  The asymmetric
    # critic stays an MLP (documented deviation: the reference's
    # central-value net can itself be an LSTM).
    rnn_units: int = 0
    rnn_layers: int = 1
    rnn_before_mlp: bool = True
    rnn_layer_norm: bool = True
    seq_len: int = 4

    @staticmethod
    def from_rlgames(params: dict) -> "PPOConfig":
        """Build from a reference-style train YAML `params` tree."""
        cfg = params.get("config", {})
        net = params.get("network", {})
        mlp = net.get("mlp", {})
        rs = cfg.get("reward_shaper", {})
        cvc = cfg.get("central_value_config")
        cv_kwargs = {}
        if cvc:
            cv_mlp = cvc.get("network", {}).get("mlp", {})
            cv_kwargs = dict(
                central_value=True,
                cv_units=tuple(cv_mlp.get("units", (512, 256, 128))),
                cv_activation=cv_mlp.get("activation", "elu"))
            cv_rnn = cvc.get("network", {}).get("rnn")
            if cv_rnn and cv_rnn.get("name", "lstm") == "lstm":
                cv_kwargs.update(
                    cv_rnn_units=int(cv_rnn.get("units", 1024)),
                    cv_rnn_layers=int(cv_rnn.get("layers", 1)),
                    # default False = rl_games NetworkBuilder default
                    # (matches the policy-rnn parser below)
                    cv_rnn_before_mlp=bool(cv_rnn.get("before_mlp", False)),
                    cv_rnn_layer_norm=bool(cv_rnn.get("layer_norm", True)))
        rnn = net.get("rnn")
        if rnn and rnn.get("name", "lstm") == "lstm":
            cv_kwargs.update(
                rnn_units=int(rnn.get("units", 256)),
                rnn_layers=int(rnn.get("layers", 1)),
                rnn_before_mlp=bool(rnn.get("before_mlp", False)),
                rnn_layer_norm=bool(rnn.get("layer_norm", False)),
                seq_len=int(cfg.get("seq_length", cfg.get("seq_len", 4))))
        return PPOConfig(
            **cv_kwargs,
            horizon_length=cfg.get("horizon_length", 16),
            minibatch_size=cfg.get("minibatch_size", 32768),
            mini_epochs=cfg.get("mini_epochs", 4),
            gamma=cfg.get("gamma", 0.99),
            tau=cfg.get("tau", 0.95),
            learning_rate=float(cfg.get("learning_rate", 3e-4)),
            lr_schedule=cfg.get("lr_schedule", "adaptive"),
            schedule_type=cfg.get("schedule_type", "legacy"),
            kl_threshold=float(cfg.get("kl_threshold", 0.008)),
            e_clip=cfg.get("e_clip", 0.2),
            clip_value=cfg.get("clip_value", True),
            critic_coef=cfg.get("critic_coef", 2.0),
            entropy_coef=cfg.get("entropy_coef", 0.0),
            bounds_loss_coef=cfg.get("bounds_loss_coef", 0.0001) or 0.0,
            grad_norm=cfg.get("grad_norm", 1.0),
            truncate_grads=cfg.get("truncate_grads", False),
            normalize_input=cfg.get("normalize_input", True),
            normalize_value=cfg.get("normalize_value", True),
            normalize_advantage=cfg.get("normalize_advantage", True),
            value_bootstrap=cfg.get("value_bootstrap", False),
            reward_shaper_scale=rs.get("scale_value", 1.0),
            max_epochs=cfg.get("max_epochs", 500),
            units=tuple(mlp.get("units", (256, 128, 64))),
            activation=mlp.get("activation", "elu"),
            separate=net.get("separate", False),
            mixed_precision=cfg.get("mixed_precision", False),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: Any
    opt_state: Any
    lr: Any
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    env_state: Any
    obs: Any
    key: Any
    epoch: Any
    # episode bookkeeping (on-device; RLGPUAlgoObserver equivalent)
    cum_reward: Any     # (N,) raw-reward episode accumulator
    cum_length: Any     # (N,)
    # asymmetric critic (central_value_config) extras
    cv_params: Any = None
    state_rms: Any = None
    states: Any = None  # (N, num_states) privileged states
    # LSTM policy extras (rnn_units > 0)
    rnn_carry: Any = None   # tuple over layers of (c, h), each (N, units)
    first: Any = None       # (N,) 1.0 where obs is an episode start
    cv_rnn_carry: Any = None  # recurrent central-value carry


def _gauss_logp(mu, log_sigma, action):
    v = jnp.exp(2 * log_sigma)
    return jnp.sum(-0.5 * ((action - mu) ** 2) / v - log_sigma
                   - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def _gauss_kl(mu_old, log_sig_old, mu_new, log_sig_new):
    """rl_games kl_dist formula, summed over action dims."""
    sig_old = jnp.exp(log_sig_old)
    sig_new = jnp.exp(log_sig_new)
    kl = (log_sig_new - log_sig_old
          + (sig_old ** 2 + (mu_old - mu_new) ** 2) / (2 * sig_new ** 2)
          - 0.5)
    return jnp.sum(kl, axis=-1)


class PPO:
    """Trainer binding a task env to the PPO update. Mirrors rl_games
    A2CAgent / the reference's CommonAgent structure functionally."""

    def __init__(self, env, cfg: PPOConfig, seed: int = 0):
        self.env = env
        self.cfg = cfg
        self.seed = seed
        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        self.rnn = cfg.rnn_units > 0
        if self.rnn:
            from .networks import ActorCriticLSTM
            assert cfg.horizon_length % cfg.seq_len == 0, \
                "horizon_length must be a multiple of seq_len (BPTT chunks)"
            self.net = ActorCriticLSTM(
                num_actions=env.num_acts, units=cfg.units,
                activation=cfg.activation, rnn_units=cfg.rnn_units,
                rnn_layers=cfg.rnn_layers, before_mlp=cfg.rnn_before_mlp,
                layer_norm=cfg.rnn_layer_norm, dtype=dtype)
        else:
            self.net = ActorCritic(num_actions=env.num_acts,
                                   units=cfg.units,
                                   activation=cfg.activation,
                                   separate=cfg.separate, dtype=dtype)
        self.cv_net = None
        self.cv_rnn = cfg.central_value and cfg.cv_rnn_units > 0
        if cfg.central_value:
            assert getattr(env, "num_states", 0) > 0, \
                "central_value requires env.num_states > 0"
            if self.cv_rnn:
                assert self.rnn, ("recurrent central value requires a "
                                  "recurrent policy (shared BPTT chunks)")
                from .networks import ValueLSTM
                self.cv_net = ValueLSTM(
                    units=cfg.cv_units, activation=cfg.cv_activation,
                    rnn_units=cfg.cv_rnn_units,
                    rnn_layers=cfg.cv_rnn_layers,
                    before_mlp=cfg.cv_rnn_before_mlp,
                    layer_norm=cfg.cv_rnn_layer_norm)
            else:
                from .networks import MLP
                self.cv_net = MLP(units=cfg.cv_units,
                                  activation=cfg.cv_activation, out_dim=1)
        if cfg.truncate_grads:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_norm),
                             optax.scale_by_adam(eps=1e-8))
        else:
            tx = optax.scale_by_adam(eps=1e-8)
        self.tx = tx
        n_total = cfg.horizon_length * env.num_envs
        step = cfg.seq_len if self.rnn else 1
        if cfg.minibatch_size > n_total or n_total % cfg.minibatch_size \
                or cfg.minibatch_size % step:
            # YAMLs assume the default num_envs; smaller runs shrink with
            # it — snap to the largest divisor of the batch <= requested
            # (and a multiple of seq_len for BPTT minibatches)
            mb = min(cfg.minibatch_size // step * step, n_total)
            while mb > step and (n_total % mb or mb % step):
                mb -= step
            cfg = dataclasses.replace(cfg, minibatch_size=max(mb, step))
            self.cfg = cfg
        self.num_minibatches = n_total // cfg.minibatch_size

        self.epoch_fn = jax.jit(self._epoch)

    # ------------------------------------------------------------------ init
    def init(self, key=None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        k_env, k_net, key = jax.random.split(key, 3)
        env_state, obs = jax.jit(self.env.reset)(k_env)  # one compile, not 1000s of tunneled dispatches
        n = self.env.num_envs
        rnn_carry = first = None
        if self.rnn:
            rnn_carry = self.net.initial_carry(n)
            first = jnp.ones(n)
            params = self.net.init(k_net, obs[None, :],
                                   self.net.initial_carry(n), first[None])
        else:
            params = self.net.init(k_net, obs[:1])
        cv_params = state_rms = states = cv_rnn_carry = None
        if self.cfg.central_value:
            ns = self.env.num_states
            if self.cv_rnn:
                cv_rnn_carry = self.cv_net.initial_carry(n)
                cv_params = self.cv_net.init(
                    jax.random.fold_in(k_net, 1), jnp.zeros((1, n, ns)),
                    self.cv_net.initial_carry(n), jnp.ones((1, n)))
            else:
                cv_params = self.cv_net.init(jax.random.fold_in(k_net, 1),
                                             jnp.zeros((1, ns)))
            state_rms = RunningMeanStd.create((ns,))
            states = jnp.zeros((n, ns))
            opt_state = self.tx.init((params, cv_params))
        else:
            opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            lr=jnp.asarray(self.cfg.learning_rate),
            obs_rms=RunningMeanStd.create((self.env.num_obs,)),
            value_rms=RunningMeanStd.create(()),
            env_state=env_state, obs=obs, key=key,
            epoch=jnp.asarray(0, jnp.int32),
            cum_reward=jnp.zeros(n), cum_length=jnp.zeros(n, jnp.int32),
            cv_params=cv_params, state_rms=state_rms, states=states,
            rnn_carry=rnn_carry, first=first, cv_rnn_carry=cv_rnn_carry,
        )

    # ------------------------------------------------------------- epoch fn
    def _forward(self, params, obs_rms, obs):
        o = obs_rms.normalize(obs) if self.cfg.normalize_input else obs
        return self.net.apply(params, o)

    def _epoch(self, ts: TrainState):
        cfg = self.cfg
        env = self.env

        cv = cfg.central_value
        cv_rnn = self.cv_rnn

        def value_of(obs, states, cv_carry=None, first=None):
            """Normalized value estimate: central net on privileged states
            (asymmetric critic) or the policy's value head. Returns
            (value_norm, new_cv_carry)."""
            if cv:
                s = (ts.state_rms.normalize(states)
                     if cfg.normalize_input else states)
                if cv_rnn:
                    v, cv_carry = self.cv_net.apply(
                        ts.cv_params, s[None], cv_carry, first[None])
                    return v[0], cv_carry
                return self.cv_net.apply(ts.cv_params, s)[..., 0], None
            return self._forward(ts.params, ts.obs_rms, obs)[2], None

        rnn = self.rnn

        def forward_step(obs, carry, first):
            """One policy forward: (mu, log_sig, value_norm, new_carry)."""
            if rnn:
                o = (ts.obs_rms.normalize(obs) if cfg.normalize_input
                     else obs)
                mu, log_sig, v_n, carry = self.net.apply(
                    ts.params, o[None], carry, first[None])
                return mu[0], log_sig, v_n[0], carry
            mu, log_sig, v_n = self._forward(ts.params, ts.obs_rms, obs)
            return mu, log_sig, v_n, carry

        # ------- rollout: scan over BPTT chunks x steps (one chunk for
        # MLP policies) — chunk-start LSTM carries are kept for training
        def rollout_step(carry, _):
            (env_state, obs, states, key, cum_r, cum_l, rnn_carry,
             first, cv_carry) = carry
            key, k_act = jax.random.split(key)
            mu, log_sig, v_pol, new_carry = forward_step(obs, rnn_carry,
                                                         first)
            new_cv_carry = cv_carry
            if rnn and not cv:
                v_n = v_pol
            else:
                v_n, new_cv_carry = value_of(obs, states, cv_carry, first)
            value = ts.value_rms.unnormalize(v_n) if cfg.normalize_value else v_n
            sigma = jnp.exp(log_sig)
            action = mu + sigma * jax.random.normal(k_act, mu.shape)
            logp = _gauss_logp(mu, log_sig, action)
            env_state, step_ts = env.step(env_state, action)
            reward = step_ts.reward * cfg.reward_shaper_scale
            if cfg.value_bootstrap:
                reward = reward + cfg.gamma * value * step_ts.timeout
            # episode bookkeeping on raw rewards
            cum_r = cum_r + step_ts.reward
            cum_l = cum_l + 1
            d = step_ts.done
            ep_r_sum = jnp.sum(jnp.where(d, cum_r, 0.0))
            ep_l_sum = jnp.sum(jnp.where(d, cum_l, 0))
            ep_n = jnp.sum(d)
            cum_r = jnp.where(d, 0.0, cum_r)
            cum_l = jnp.where(d, 0, cum_l)
            data = dict(obs=obs, action=action, logp=logp, value=value,
                        reward=reward, done=d, mu=mu)
            if cv:
                data["states"] = states
            if rnn:
                data["first"] = first
            new_states = step_ts.states if cv else states
            # env->logger channel: scalar task diagnostics from
            # _reward_done (the reference's extras["episode"] dicts piped
            # by RLGPUAlgoObserver, utils/rlgames_utils.py:108-148).
            # Keys under "final/" are episode-outcome metrics valid ONLY
            # on done steps (factory lift success, etc.): they are
            # done-gated sums here and normalized per-episode at epoch
            # assembly — a plain per-step mean would dilute a success
            # measured once per episode by 1/episode_length (the r2
            # factory_pick run read 0.001 while the policy's true
            # deterministic success rate was 0.75).
            d_f = step_ts.done.astype(jnp.float32)
            task_info = {}
            for k, v in step_ts.info.items():
                if not (hasattr(v, "ndim") and v.ndim <= 1):
                    continue
                if k.startswith("final/"):
                    task_info[k] = jnp.sum(v * d_f)
                    task_info["_n/" + k] = jnp.sum(d_f)
                else:
                    task_info[k] = jnp.mean(v)
            stats = (ep_r_sum, ep_l_sum, ep_n, task_info)
            new_first = d.astype(jnp.float32) if rnn else first
            return (env_state, step_ts.obs, new_states, key, cum_r, cum_l,
                    new_carry, new_first, new_cv_carry), (data, stats)

        chunk = cfg.seq_len if rnn else cfg.horizon_length
        n_chunks = cfg.horizon_length // chunk

        def chunk_step(carry, _):
            # rnn carries (policy + cv) at chunk start, kept for BPTT
            chunk_carry0 = (carry[6], carry[8])
            carry, out = jax.lax.scan(rollout_step, carry, None,
                                      length=chunk)
            return carry, (out, chunk_carry0)

        carry0 = (ts.env_state, ts.obs, ts.states, ts.key, ts.cum_reward,
                  ts.cum_length, ts.rnn_carry, ts.first, ts.cv_rnn_carry)
        carry_end, ((batch, ep_stats), chunk_carries_all) = jax.lax.scan(
            chunk_step, carry0, None, length=n_chunks)
        chunk_carries, cv_chunk_carries = chunk_carries_all
        (env_state, last_obs, last_states, key, cum_r, cum_l,
         last_carry, last_first, last_cv_carry) = carry_end
        # (n_chunks, chunk, ...) -> (T, ...)
        batch = jax.tree_util.tree_map(
            lambda x: x.reshape((cfg.horizon_length,) + x.shape[2:]), batch)
        ep_stats = jax.tree_util.tree_map(lambda x: x.reshape(-1), ep_stats)

        # bootstrap value for the final obs
        _, _, v_pol_last, _ = forward_step(last_obs, last_carry, last_first)
        v_last_n = (v_pol_last if (rnn and not cv)
                    else value_of(last_obs, last_states, last_cv_carry,
                                  last_first)[0])
        v_last = (ts.value_rms.unnormalize(v_last_n) if cfg.normalize_value
                  else v_last_n)

        # ---------------- GAE (reverse scan) --------------------------------
        def gae_step(carry, data_t):
            gae, v_next = carry
            nonterminal = 1.0 - data_t["done"].astype(jnp.float32)
            delta = (data_t["reward"] + cfg.gamma * v_next * nonterminal
                     - data_t["value"])
            gae = delta + cfg.gamma * cfg.tau * nonterminal * gae
            return (gae, data_t["value"]), gae

        (_, _), adv = jax.lax.scan(
            gae_step, (jnp.zeros_like(v_last), v_last), batch, reverse=True)
        returns = adv + batch["value"]

        # ---------------- normalizer updates -------------------------------
        obs_rms = (ts.obs_rms.update(batch["obs"].reshape(-1, env.num_obs))
                   if cfg.normalize_input else ts.obs_rms)
        value_rms = (ts.value_rms.update(returns.reshape(-1))
                     if cfg.normalize_value else ts.value_rms)
        state_rms = ts.state_rms
        if cv and cfg.normalize_input:
            state_rms = ts.state_rms.update(
                batch["states"].reshape(-1, env.num_states))

        if rnn:
            # sequence view for BPTT: (T, N, ...) -> (n_seqs, seq, ...)
            def to_seq(x):
                x = x.reshape((n_chunks, chunk) + x.shape[1:])
                x = jnp.moveaxis(x, 2, 1)          # (n_chunks, N, seq, ...)
                return x.reshape((-1, chunk) + x.shape[3:])
            flat = jax.tree_util.tree_map(to_seq, batch)
            # chunk-start carries: (n_chunks, layers)(c/h)(N, u) -> (n_seqs,)
            seq_carry = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), chunk_carries)
            cv_seq_carry = (jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), cv_chunk_carries)
                if cv_rnn else None)
            flat_returns = to_seq(returns)
            flat_adv = to_seq(adv)
        else:
            # flatten (T, N) → (T·N,)
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), batch)
            seq_carry = None
            flat_returns = returns.reshape(-1)
            flat_adv = adv.reshape(-1)
        if cfg.normalize_advantage:
            flat_adv = (flat_adv - flat_adv.mean()) / (flat_adv.std() + 1e-8)
        old_values_n = (value_rms.normalize(flat["value"], clip=0.0)
                        if cfg.normalize_value else flat["value"])
        targets_n = (value_rms.normalize(flat_returns, clip=0.0)
                     if cfg.normalize_value else flat_returns)

        total = (flat_returns.shape[0] if not rnn
                 else flat_returns.shape[0] * chunk)

        # ---------------- minibatch SGD with adaptive-KL LR ----------------
        def loss_fn(params_all, mb):
            if cv:
                params, cv_params = params_all
            else:
                params = params_all
            # Normalize with the ROLLOUT-time stats (ts.obs_rms), not the
            # batch-updated ones: stored logp/mu were computed under the
            # old stats, so using updated stats here makes the ratio != 1
            # at the first minibatch and inflates measured KL with
            # normalization drift — which the adaptive-KL schedule then
            # wrongly throttles LR for (epoch-0 KL was 0.70 vs the 0.008
            # threshold). The updated stats take effect next epoch.
            o = (ts.obs_rms.normalize(mb["obs"]) if cfg.normalize_input
                 else mb["obs"])
            if rnn:
                # mb arrays are (mb_seqs, seq, ...): run the net time-major
                # from the stored chunk-start state (stale-state BPTT)
                mu, log_sig, v_n, _ = self.net.apply(
                    params, jnp.swapaxes(o, 0, 1), mb["carry"],
                    jnp.swapaxes(mb["first"], 0, 1))
                mu = jnp.swapaxes(mu, 0, 1).reshape(-1, mu.shape[-1])
                v_n = jnp.swapaxes(v_n, 0, 1).reshape(-1)
                if cv and cv_rnn:
                    # recurrent central value: BPTT over the same chunks
                    # from its own stored chunk-start carry
                    s_seq = (ts.state_rms.normalize(mb["states"])
                             if cfg.normalize_input else mb["states"])
                    v_cv, _ = self.cv_net.apply(
                        cv_params, jnp.swapaxes(s_seq, 0, 1),
                        mb["carry_cv"], jnp.swapaxes(mb["first"], 0, 1))
                    v_n = jnp.swapaxes(v_cv, 0, 1).reshape(-1)
                mb = {k: (v.reshape((-1,) + v.shape[2:])
                          if k not in ("carry", "carry_cv", "first") else v)
                      for k, v in mb.items()}
            else:
                mu, log_sig, v_n = self.net.apply(params, o)
            if cv and not cv_rnn:
                s = (ts.state_rms.normalize(mb["states"])
                     if cfg.normalize_input else mb["states"])
                v_n = self.cv_net.apply(cv_params, s)[..., 0]
            logp = _gauss_logp(mu, log_sig, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])  # vs ROLLOUT policy (PPO)
            surr1 = mb["adv"] * ratio
            surr2 = mb["adv"] * jnp.clip(ratio, 1 - cfg.e_clip, 1 + cfg.e_clip)
            a_loss = -jnp.mean(jnp.minimum(surr1, surr2))

            if cfg.clip_value:
                v_clipped = mb["old_v"] + jnp.clip(v_n - mb["old_v"],
                                                   -cfg.e_clip, cfg.e_clip)
                c_loss = jnp.maximum((v_n - mb["target"]) ** 2,
                                     (v_clipped - mb["target"]) ** 2)
            else:
                c_loss = (v_n - mb["target"]) ** 2
            c_loss = jnp.mean(c_loss)

            entropy = jnp.mean(jnp.sum(
                log_sig + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1))

            # soft action-bound loss (common_agent.py:427-435)
            sb = 1.1
            b_loss = jnp.mean(jnp.sum(
                jnp.maximum(mu - sb, 0.0) ** 2
                + jnp.minimum(mu + sb, 0.0) ** 2, axis=-1))

            loss = (a_loss + 0.5 * cfg.critic_coef * c_loss
                    - cfg.entropy_coef * entropy
                    + cfg.bounds_loss_coef * b_loss)
            # KL for the adaptive-LR schedule: measured against the
            # policy AS OF THIS SAMPLE'S LAST VISIT, not the rollout
            # policy — rl_games overwrites the dataset's mu/sigma with
            # the current forward after every minibatch
            # (train_epoch: dataset.update_mu_sigma(cmu, csigma)), so its
            # scheduler sees per-cycle drift. Comparing to rollout
            # mu/sigma instead accumulates KL over all mini-epochs and
            # throttled our LR ~4x harder at the same kl_threshold.
            kl = jnp.mean(_gauss_kl(mb["mu"], mb["old_log_sig"], mu, log_sig))
            aux = dict(a_loss=a_loss, c_loss=c_loss, entropy=entropy,
                       b_loss=b_loss, kl=kl, cur_mu=mu,
                       cur_log_sig=jnp.broadcast_to(log_sig, mu.shape))
            return loss, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        old_log_sig = ts.params["params"]["log_sigma"]

        def mb_update(carry, idx):
            params, opt_state, lr, key, mu_store, logsig_store = carry
            take = lambda x: x[idx]
            mb = dict(obs=take(flat["obs"]), action=take(flat["action"]),
                      logp=take(flat["logp"]), mu=take(mu_store),
                      adv=take(flat_adv), old_v=take(old_values_n),
                      target=take(targets_n),
                      old_log_sig=take(logsig_store))
            if cv:
                mb["states"] = take(flat["states"])
            if rnn:
                mb["first"] = take(flat["first"])
                mb["carry"] = jax.tree_util.tree_map(take, seq_carry)
                if cv_rnn:
                    mb["carry_cv"] = jax.tree_util.tree_map(
                        take, cv_seq_carry)
            (loss, aux), grads = grad_fn(params, mb)
            # rl_games dataset.update_mu_sigma: remember this sample's
            # pre-update forward so the next visit's KL is per-cycle
            mu_store = mu_store.at[idx].set(
                aux["cur_mu"].reshape(mu_store[idx].shape))
            logsig_store = logsig_store.at[idx].set(
                aux["cur_log_sig"].reshape(logsig_store[idx].shape))
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree_util.tree_map(lambda u: -lr * u, updates))
            # adaptive KL LR, legacy schedule: per-minibatch
            if cfg.lr_schedule == "adaptive":
                kl = aux["kl"]
                lr = jnp.where(kl > 2.0 * cfg.kl_threshold,
                               jnp.maximum(lr / 1.5, 1e-6), lr)
                lr = jnp.where(kl < 0.5 * cfg.kl_threshold,
                               jnp.minimum(lr * 1.5, 1e-2), lr)
            return (params, opt_state, lr, key, mu_store, logsig_store), \
                (loss, aux["kl"], aux["a_loss"], aux["c_loss"],
                 aux["entropy"])

        def mini_epoch(carry, k):
            if rnn:  # sample whole sequences (rl_games seq_length)
                perm = jax.random.permutation(k, total // chunk)
                idxs = perm.reshape(self.num_minibatches,
                                    cfg.minibatch_size // chunk)
            else:
                perm = jax.random.permutation(k, total)
                idxs = perm.reshape(self.num_minibatches,
                                    cfg.minibatch_size)
            return jax.lax.scan(mb_update, carry, idxs)

        key, *ekeys = jax.random.split(key, cfg.mini_epochs + 1)
        params0 = (ts.params, ts.cv_params) if cv else ts.params
        mu_store0 = flat["mu"]
        logsig_store0 = jnp.broadcast_to(old_log_sig, flat["mu"].shape)
        carry = (params0, ts.opt_state, ts.lr, key, mu_store0,
                 logsig_store0)
        metrics_mb = []
        for ek in ekeys:  # static unroll over mini_epochs (small)
            carry, m = mini_epoch(carry, ek)
            metrics_mb.append(m)
        params, opt_state, lr, key = carry[:4]
        cv_params = None
        if cv:
            params, cv_params = params

        metrics = dict(
            loss=jnp.mean(jnp.stack([m[0] for m in metrics_mb])),
            kl=jnp.mean(jnp.stack([m[1] for m in metrics_mb])),
            a_loss=jnp.mean(jnp.stack([m[2] for m in metrics_mb])),
            c_loss=jnp.mean(jnp.stack([m[3] for m in metrics_mb])),
            entropy=jnp.mean(jnp.stack([m[4] for m in metrics_mb])),
            lr=lr,
            episode_reward_sum=jnp.sum(ep_stats[0]),
            episode_length_sum=jnp.sum(ep_stats[1]),
            episode_count=jnp.sum(ep_stats[2]),
            **{(f"episode/{k[6:]}" if k.startswith("final/")
                else f"episode/{k}"):
               (jnp.sum(v) / jnp.maximum(
                   jnp.sum(ep_stats[3]["_n/" + k]), 1.0)
                if k.startswith("final/") else jnp.mean(v))
               for k, v in ep_stats[3].items()
               if not k.startswith("_n/")},
            reward_mean_step=jnp.mean(batch["reward"]),
        )

        new_ts = TrainState(
            params=params, opt_state=opt_state, lr=lr,
            obs_rms=obs_rms, value_rms=value_rms,
            env_state=env_state, obs=last_obs, key=key,
            epoch=ts.epoch + 1, cum_reward=cum_r, cum_length=cum_l,
            cv_params=cv_params, state_rms=state_rms,
            states=last_states if cv else None,
            rnn_carry=last_carry if rnn else None,
            first=last_first if rnn else None,
            cv_rnn_carry=last_cv_carry if cv_rnn else None)
        return new_ts, metrics

    # ------------------------------------------------------------------ eval
    @functools.partial(jax.jit, static_argnums=0)
    def act_deterministic(self, ts: TrainState, obs):
        if self.rnn:
            a, _ = self.act_deterministic_rnn(ts, obs, ts.rnn_carry,
                                              ts.first)
            return a
        mu, _, _ = self._forward(ts.params, ts.obs_rms, obs)
        return jnp.clip(mu, -1.0, 1.0)

    @functools.partial(jax.jit, static_argnums=0)
    def act_deterministic_rnn(self, ts: TrainState, obs, carry, first):
        """Recurrent eval step: caller threads (carry, first) and sets
        first = done after each env step (CommonPlayer RNN-state zeroing
        on done, learning/common_player.py:54-153)."""
        o = ts.obs_rms.normalize(obs) if self.cfg.normalize_input else obs
        mu, _, _, carry = self.net.apply(ts.params, o[None], carry,
                                         first[None])
        return jnp.clip(mu[0], -1.0, 1.0), carry
