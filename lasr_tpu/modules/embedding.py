"""Positional encoding family (Flax).

Behavioral port of the reference PE family
(``lasr/modules/net/transformer/embedding.py``):
  - ``PositionalEncoding``: x·√d + sinusoid[offset : offset+T], dropout;
    the streaming ``offset`` supports chunked encoders.
  - ``ScaledPositionalEncoding``: x + α·sinusoid with learnable scalar α.
  - ``RelPositionalEncoding``: returns (x·√d, pos_emb[2T-1]) for
    Transformer-XL style attention, positive positions first (flipped),
    with optional ``max_dist`` index clamping (embedding.py:131-196).

Tables are baked as numpy constants at trace time (static shapes), not
parameters — matching the reference's non-persistent ``pe`` buffer.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def sinusoid_table(length: int, d_model: int, negative: bool = False) -> np.ndarray:
    """(length, d_model) float32 sinusoidal table; sin on even, cos on odd."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    if negative:
        pos = -pos
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    table = np.zeros((length, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table.astype(np.float32)


def _sinusoid_at(positions: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Sinusoid PE evaluated at dynamic ``positions`` (..., ) → (..., d).

    On-the-fly counterpart of ``sinusoid_table`` for per-row offsets with
    no static table bound (long-form windowed encoding: positions grow
    with audio length)."""
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / d_model))
    ang = positions[..., None].astype(jnp.float32) * div
    out = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(*positions.shape, d_model)


def _pos_slice(pe, offset, T: int, d_model: int, dtype):
    """PE rows [offset, offset+T) — (1, T, d) for scalar offsets (table
    slice), (B, T, d) for per-row offset arrays (computed on the fly)."""
    if isinstance(offset, int):
        return (pe[:T] if offset == 0 else
                lax.dynamic_slice_in_dim(pe, offset, T, axis=0))[None]
    offset = jnp.asarray(offset)
    if offset.ndim == 0:
        return lax.dynamic_slice_in_dim(pe, offset, T, axis=0)[None]
    pos = offset[:, None] + jnp.arange(T)[None]
    return _sinusoid_at(pos, d_model).astype(dtype)


class PositionalEncoding(nn.Module):
    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset=0, deterministic: bool = True):
        T = x.shape[1]
        table_len = max(self.max_len, T)
        pe = jnp.asarray(sinusoid_table(table_len, self.d_model), dtype=self.dtype)
        pos = _pos_slice(pe, offset, T, self.d_model, self.dtype)
        x = x * math.sqrt(self.d_model) + pos
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class ScaledPositionalEncoding(nn.Module):
    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset=0, deterministic: bool = True):
        T = x.shape[1]
        table_len = max(self.max_len, T)
        pe = jnp.asarray(sinusoid_table(table_len, self.d_model), dtype=self.dtype)
        pos = _pos_slice(pe, offset, T, self.d_model, self.dtype)
        alpha = self.param("alpha", nn.initializers.ones, (), jnp.float32)
        x = x + alpha.astype(self.dtype) * pos
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class RelPositionalEncoding(nn.Module):
    """Returns (scaled x, relative pos-emb of length 2T-1).

    Index layout matches the reference: position T-1 of the output table is
    relative distance 0; earlier entries are positive (key left of query)
    distances, later are negative.
    """

    d_model: int
    dropout_rate: float = 0.1
    max_dist: int = -1
    max_len: int = 5000
    # apply dropout to the returned pos table (reference embedding.py:197).
    # The conformer encoder's pos_dropout_mode="rotated" sets this False
    # and applies positional dropout in rotated score space instead (see
    # RelPositionMultiHeadedAttention.rot_fold_train); x keeps its dropout
    # either way.
    drop_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        L = max(self.max_len, T)
        pos_part = sinusoid_table(L, self.d_model)[::-1]          # dist L-1 .. 0
        neg_part = sinusoid_table(L, self.d_model, negative=True)[1:]  # -1 .. -(L-1)
        full = jnp.asarray(np.concatenate([pos_part, neg_part], axis=0),
                           dtype=self.dtype)  # (2L-1, d); center L-1 = dist 0
        center = L - 1
        idx = np.arange(center - (T - 1), center + T)
        if self.max_dist >= 0:
            idx = np.clip(idx, center - self.max_dist, center + self.max_dist)
        pos_emb = full[jnp.asarray(idx)][None]  # (1, 2T-1, d)

        x = x * math.sqrt(self.d_model)
        drop = nn.Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pos_emb, deterministic=deterministic or not self.drop_pos))


class ConvPosEmbedding(nn.Module):
    """wav2vec-style grouped conv positional embedding
    (reference embedding.py:198-227)."""

    d_model: int
    dropout_rate: float = 0.1
    kernel_size: int = 64
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = nn.Conv(self.d_model, kernel_size=(self.kernel_size,),
                       padding=[(self.kernel_size // 2, self.kernel_size // 2)],
                       feature_group_count=self.groups, dtype=self.dtype)
        # symmetric pad of k/2 on an even kernel yields T+1 steps; the
        # reference drops the trailing one (embedding.py:221)
        h = conv(x)[:, : x.shape[1]]
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.relu(h)
        return x + h
