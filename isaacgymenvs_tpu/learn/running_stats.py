"""Running mean/std normalizers (rl_games RunningMeanStd parity).

Used for normalize_input / normalize_value (`cfg/train/*.yaml`), updated
on-device inside the jitted train step (the reference updates them inside
the torch model forward in train mode)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunningMeanStd:
    mean: Any
    var: Any
    count: Any

    @staticmethod
    def create(shape=()):
        return RunningMeanStd(mean=jnp.zeros(shape), var=jnp.ones(shape),
                              count=jnp.asarray(1e-4))

    def update(self, batch: jnp.ndarray) -> "RunningMeanStd":
        """Welford parallel update over leading axes."""
        axes = tuple(range(batch.ndim - self.mean.ndim))
        b_mean = jnp.mean(batch, axis=axes)
        b_var = jnp.var(batch, axis=axes)
        b_count = batch.size / max(self.mean.size, 1)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * (b_count / tot)
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta ** 2 * self.count * b_count / tot
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x, clip=5.0):
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -clip, clip) if clip else y

    def unnormalize(self, y):
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
