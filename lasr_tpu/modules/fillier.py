"""Audio-classification head stack (Flax) — port of
``lasr/modules/net/fillier/``: separable-ish conv pyramid blocks
(convblock.py:3-36), the 6-block embedding model (embedding.py:5-18), and
the max-pool classification head (classiﬁcation.py:4-30).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    channel_out: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C) NHWC."""
        h = nn.Conv(self.channel_out, (1, 3), padding=[(0, 0), (1, 1)],
                    dtype=self.dtype)(x)
        h = nn.Conv(self.channel_out, (3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.relu(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(self.channel_out, (3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype)(h)
        h = nn.Conv(self.channel_out, (1, 3), padding=[(0, 0), (1, 1)],
                    dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.relu(h)


class ConvBlockFinal(nn.Module):
    channel_out: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.channel_out, (3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype)(x)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.relu(h)
        h = nn.Conv(self.channel_out, (3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.relu(h)


class EmbeddingModel(nn.Module):
    """6-block pyramid: 24→48→72→96→96 + final (embedding.py:5-18)."""

    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for ch in (24, 48, 72, 96, 96):
            x = ConvBlock(ch, self.dropout_rate, dtype=self.dtype)(
                x, deterministic=deterministic)
        return ConvBlockFinal(96, self.dropout_rate, dtype=self.dtype)(
            x, deterministic=deterministic)


class Classification(nn.Module):
    """Max-pool over the embedding axis then a linear classifier."""

    embedding_channel: int
    embedding_size: int
    output_size: int
    dropout_rate: float = 0.1
    conv_1x1: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, C, E, 1) channel-major like the reference."""
        assert x.shape[1] == self.embedding_channel
        assert x.shape[2] == self.embedding_size
        h = jnp.max(x[..., 0], axis=2)  # (B, C)
        if self.conv_1x1:
            h = nn.Dense(self.embedding_channel, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.output_size, dtype=self.dtype)(h)
