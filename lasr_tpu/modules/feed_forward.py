"""Position-wise feed-forward variants (Flax).

Ports of ``positionwise_feed_forward.py`` and ``multi_layer_conv.py``:
linear FFN, FastSpeech-style two-conv FFN, and conv+linear hybrid.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


class PositionwiseFeedForward(nn.Module):
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden_units, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.idim, dtype=self.dtype)(h)


class MultiLayeredConv1d(nn.Module):
    """Two SAME-padded 1-D convs with ReLU (multi_layer_conv.py:12-61)."""

    idim: int
    hidden_units: int
    kernel_size: int = 1
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.hidden_units, (self.kernel_size,),
                    padding=[(pad, pad)], dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Conv(self.idim, (self.kernel_size,),
                       padding=[(pad, pad)], dtype=self.dtype)(h)


class Conv1dLinear(nn.Module):
    """Conv1d then linear (multi_layer_conv.py:64-105)."""

    idim: int
    hidden_units: int
    kernel_size: int = 1
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.hidden_units, (self.kernel_size,),
                    padding=[(pad, pad)], dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.idim, dtype=self.dtype)(h)
