"""Deep mutual-information (Jensen-Shannon) loss with learned discriminators.

TPU-native re-design of `/root/reference/losses/mi_loss_v2.py:7-79` (the
live version per `losses/__init__.py:3`; v1 at `mi_loss.py:8-83` is the
fixed-channel special case).  The discriminators are flax modules so their
parameters join the train state exactly like the reference adds
`mi_loss.parameters()` to the optimizer (`train/train_reg_v6.py:268`).

Layout note: the reference's local tensors are [B, C, N]; ours are
channels-last [B, N, C].  The global tensors are [B, D] vectors (the
reference feeds per-point weight vectors of length N as D).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GlobalInfoNet(nn.Module):
    """Vector discriminator (mi_loss_v2.py:7-22): 3 conv1d(k=1) + linear."""
    in_channels: int

    @nn.compact
    def __call__(self, x_global, c_global):
        h = jnp.concatenate([x_global, c_global], axis=-1)   # [B, 2D]
        h = nn.relu(nn.Dense(self.in_channels // 2, use_bias=False)(h))
        h = nn.relu(nn.Dense(self.in_channels // 4, use_bias=False)(h))
        h = nn.relu(nn.Dense(self.in_channels // 8, use_bias=False)(h))
        return nn.Dense(1)(h)                                # [B, 1]


class LocalInfoNet(nn.Module):
    """Per-point discriminator (mi_loss_v2.py:25-39): 3 conv1d(k=1)."""
    in_channels: int

    @nn.compact
    def __call__(self, x_local, c_local):
        h = jnp.concatenate([x_local, c_local], axis=-1)     # [B, N, 2C]
        h = nn.relu(nn.Dense(self.in_channels // 2, use_bias=False)(h))
        h = nn.relu(nn.Dense(self.in_channels // 4, use_bias=False)(h))
        h = nn.relu(nn.Dense(1, use_bias=False)(h))
        return h[..., 0]                                     # [B, N]


class DeepMILoss(nn.Module):
    """JSD MI lower bound: 0.5 * (softplus(T(neg)) - (-softplus(-T(pos)))).

    Matches `DeepMILoss` (mi_loss_v2.py:42-79); either head may be absent.
    """
    global_in_channels: Optional[int] = None
    local_in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x_global=None, x_global_prime=None,
                 x_local=None, x_local_prime=None,
                 c_local=None, c_global=None):
        if self.global_in_channels is None and self.local_in_channels is None:
            raise ValueError('MI loss needs at least one of global/local heads')
        total = 0.0
        if self.local_in_channels is not None:
            local_d = LocalInfoNet(self.local_in_channels, name='local_d')
            ej = -jax.nn.softplus(-local_d(c_local, x_local)).mean()
            em = jax.nn.softplus(local_d(c_local, x_local_prime)).mean()
            total = total + 0.5 * (em - ej)
        if self.global_in_channels is not None:
            global_d = GlobalInfoNet(self.global_in_channels, name='global_d')
            ej = -jax.nn.softplus(-global_d(c_global, x_global)).mean()
            em = jax.nn.softplus(global_d(c_global, x_global_prime)).mean()
            total = total + 0.5 * (em - ej)
        return total
