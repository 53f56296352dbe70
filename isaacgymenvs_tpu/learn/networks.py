"""Actor-critic networks (rl_games `actor_critic` builder parity).

Shared MLP trunk (separate=False), elu activation, state-independent
learnable log-sigma (fixed_sigma=True, const-init 0), linear mu and value
heads — matching `cfg/train/*PPO.yaml` network blocks. Optional LSTM and
separate-critic variants (asymmetric critic) for the hand/LSTM configs.

bfloat16-friendly: the trunk matmuls run in the param dtype; heads in f32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

_ACT = {"elu": nn.elu, "relu": nn.relu, "tanh": nn.tanh, "selu": nn.selu,
        "swish": nn.swish, "gelu": nn.gelu, "None": lambda x: x}


class MLP(nn.Module):
    units: Sequence[int]
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32
    out_dim: Optional[int] = None   # optional linear head (no activation)

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for i, u in enumerate(self.units):
            # selective precision: the FIRST layer stays fp32 — bf16's
            # 8-bit mantissa quantizes normalized observations (~0.03
            # resolution on the ±5 clip range), which measurably degraded
            # Ant training when the whole trunk ran bf16 (round-1 A/B:
            # ep_rew -570 vs +74 at 20M steps). Deeper layers run in the
            # requested dtype (bf16 on the MXU); params stay fp32 masters
            # either way, heads are fp32.
            layer_dtype = jnp.float32 if i == 0 else self.dtype
            x = nn.Dense(u, dtype=layer_dtype)(x)
            x = act(x)
            if i == 0 and self.dtype != jnp.float32:
                x = x.astype(self.dtype)
        if self.out_dim is not None:
            x = nn.Dense(self.out_dim, dtype=jnp.float32)(x)
        return x


class ActorCritic(nn.Module):
    """Returns (mu, log_sigma, value)."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    activation: str = "elu"
    separate: bool = False
    sigma_init: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        trunk = MLP(self.units, self.activation, self.dtype)(obs)
        mu = nn.Dense(self.num_actions, dtype=jnp.float32,
                      kernel_init=nn.initializers.lecun_normal())(trunk)
        log_sigma = self.param(
            "log_sigma", nn.initializers.constant(self.sigma_init),
            (self.num_actions,))
        if self.separate:
            vtrunk = MLP(self.units, self.activation, self.dtype,
                         name="critic_mlp")(obs)
        else:
            vtrunk = trunk
        value = nn.Dense(1, dtype=jnp.float32, name="value")(vtrunk)
        return mu, log_sigma, value[..., 0]


class ActorCriticLSTM(nn.Module):
    """rl_games `rnn: lstm` variant (ShadowHandPPOAsymmLSTM.yaml:33-38,
    AnymalTerrainPPO_LSTM.yaml): obs -> [MLP] -> LSTM -> [LayerNorm] ->
    [MLP] -> heads, hidden state zeroed at episode starts.

    __call__(obs_seq (T,B,F), carry, first_seq (T,B)) ->
        (mu (T,B,A), log_sigma (A,), value (T,B), new_carry)
    carry: tuple over layers of (c, h), each (B, rnn_units).
    `first_seq[t]` is 1 where obs_seq[t] is the first observation of an
    episode (the previous step's done flag) — the state is zeroed there,
    matching rl_games' RNN-state masking on done.
    """

    num_actions: int
    units: Sequence[int] = (512, 512, 256, 128)
    activation: str = "elu"
    rnn_units: int = 1024
    rnn_layers: int = 1
    before_mlp: bool = True   # True: LSTM directly on obs, MLP after
    layer_norm: bool = True
    sigma_init: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def initial_carry(self, batch: int):
        return tuple(
            (jnp.zeros((batch, self.rnn_units)),
             jnp.zeros((batch, self.rnn_units)))
            for _ in range(self.rnn_layers))

    @nn.compact
    def __call__(self, obs_seq, carry, first_seq):
        x = obs_seq
        if not self.before_mlp:
            x = MLP(self.units, self.activation, self.dtype)(x)
        cells = [nn.OptimizedLSTMCell(self.rnn_units, name=f"lstm{i}")
                 for i in range(self.rnn_layers)]
        outs = []
        carry = tuple(carry)
        for t in range(obs_seq.shape[0]):   # seq_len is small (<= 16)
            keep = (1.0 - first_seq[t])[:, None]
            x_t = x[t]
            new_carry = []
            for i, cell in enumerate(cells):
                c, h = carry[i]
                (c, h), x_t = cell((c * keep, h * keep), x_t)
                new_carry.append((c, h))
            carry = tuple(new_carry)
            outs.append(x_t)
        y = jnp.stack(outs)
        if self.layer_norm:
            y = nn.LayerNorm(name="rnn_ln")(y)
        if self.before_mlp:
            y = MLP(self.units, self.activation, self.dtype)(y)
        mu = nn.Dense(self.num_actions, dtype=jnp.float32,
                      kernel_init=nn.initializers.lecun_normal())(y)
        log_sigma = self.param(
            "log_sigma", nn.initializers.constant(self.sigma_init),
            (self.num_actions,))
        value = nn.Dense(1, dtype=jnp.float32, name="value")(y)[..., 0]
        return mu, log_sigma, value, carry


class ValueLSTM(nn.Module):
    """Recurrent central-value net (reference
    ShadowHandPPOAsymmLSTM.yaml:87-103: central_value network with its
    own `rnn: lstm` — states -> [MLP] -> LSTM -> [LayerNorm] -> [MLP] ->
    value). Same carry/first-seq contract as ActorCriticLSTM.

    __call__(states_seq (T,B,F), carry, first_seq (T,B)) ->
        (value (T,B), new_carry)
    """

    units: Sequence[int] = (512,)
    activation: str = "relu"
    rnn_units: int = 1024
    rnn_layers: int = 1
    before_mlp: bool = True
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    def initial_carry(self, batch: int):
        return tuple(
            (jnp.zeros((batch, self.rnn_units)),
             jnp.zeros((batch, self.rnn_units)))
            for _ in range(self.rnn_layers))

    @nn.compact
    def __call__(self, states_seq, carry, first_seq):
        x = states_seq
        if not self.before_mlp:
            x = MLP(self.units, self.activation, self.dtype)(x)
        cells = [nn.OptimizedLSTMCell(self.rnn_units, name=f"lstm{i}")
                 for i in range(self.rnn_layers)]
        outs = []
        carry = tuple(carry)
        for t in range(states_seq.shape[0]):
            keep = (1.0 - first_seq[t])[:, None]
            x_t = x[t]
            new_carry = []
            for i, cell in enumerate(cells):
                c, h = carry[i]
                (c, h), x_t = cell((c * keep, h * keep), x_t)
                new_carry.append((c, h))
            carry = tuple(new_carry)
            outs.append(x_t)
        y = jnp.stack(outs)
        if self.layer_norm:
            y = nn.LayerNorm(name="rnn_ln")(y)
        if self.before_mlp:
            y = MLP(self.units, self.activation, self.dtype)(y)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(y)[..., 0]
        return value, carry


class CentralValueNet(nn.Module):
    """Asymmetric critic over privileged states
    (`central_value_config`, ShadowHandPPOAsymm*)."""

    units: Sequence[int] = (512, 256, 128)
    activation: str = "elu"

    @nn.compact
    def __call__(self, states):
        h = MLP(self.units, self.activation)(states)
        return nn.Dense(1)(h)[..., 0]
