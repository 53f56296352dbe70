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
        for u in self.units:
            x = nn.Dense(u, dtype=self.dtype)(x)
            x = act(x)
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


class CentralValueNet(nn.Module):
    """Asymmetric critic over privileged states
    (`central_value_config`, ShadowHandPPOAsymm*)."""

    units: Sequence[int] = (512, 256, 128)
    activation: str = "elu"

    @nn.compact
    def __call__(self, states):
        h = MLP(self.units, self.activation)(states)
        return nn.Dense(1)(h)[..., 0]
