"""wav2vec/CPC stack (Flax) — ports of ``lasr/modules/net/wav2vec/``.

``ConvFeatureExtractionModel`` (raw-wave conv encoder, encoder.py:12-52),
``ConvAggegator`` (causal conv context network, aggegator.py:20-66), and
``Wav2VecPredictionsModel`` (CPC negatives + step predictions,
predict.py:14-88).  Norms match the Fp32GroupNorm(1 group)/Fp32LayerNorm
behavior (norm.py:5-46): statistics in float32 regardless of compute dtype.

TPU-first deviation (documented): the prediction model returns fixed-shape
``(logits, labels, valid)`` arrays over (copies, B, steps, T) instead of the
reference's flattened variable-length vector — same elements, maskable, and
jit-stable.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _fp32_group_norm(x, scale, bias, eps=1e-5):
    """GroupNorm with 1 group over channel dim (last axis here), f32 stats."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-2, -1), keepdims=True)
    var = jnp.var(x32, axis=(-2, -1), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale + bias
    return out.astype(x.dtype)


class ConvFeatureExtractionModel(nn.Module):
    """Raw waveform → features via strided 1-D convs (encoder.py:12-52)."""

    conv_layers: Sequence[Tuple[int, int, int]] = (
        (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2))
    dropout: float = 0.0
    log_compression: bool = False
    skip_connections: bool = False
    residual_scale: float = 0.5
    non_affine_group_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, S) raw wave → (B, T, C)."""
        h = x[..., None].astype(self.dtype)  # (B, S, 1) NWC
        scale = math.sqrt(self.residual_scale)
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            residual = h
            h = nn.Conv(dim, (k,), strides=(stride,), padding="VALID",
                        use_bias=False, dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            affine = not self.non_affine_group_norm
            g = self.param(f"gn_scale_{i}", nn.initializers.ones, (dim,)) \
                if affine else None
            b = self.param(f"gn_bias_{i}", nn.initializers.zeros, (dim,)) \
                if affine else None
            h = _fp32_group_norm(h, g, b)
            h = nn.relu(h)
            if self.skip_connections and h.shape[-1] == residual.shape[-1]:
                r_t, t = residual.shape[1], h.shape[1]
                residual = residual[:, :: r_t // t][:, :t]
                h = (h + residual) * scale
        if self.log_compression:
            h = jnp.log(jnp.abs(h) + 1.0)
        return h


class ConvAggegator(nn.Module):
    """Causal conv context network (aggegator.py:20-66)."""

    conv_layers: Sequence[Tuple[int, int, int]] = ((512, 3, 1),) * 9
    embed: int = 512
    dropout: float = 0.0
    skip_connections: bool = True
    residual_scale: float = 0.5
    non_affine_group_norm: bool = False
    conv_bias: bool = True
    zero_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, C) → (B, T, C')."""
        h = x
        scale = math.sqrt(self.residual_scale)
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            residual = h
            ka = k // 2
            kb = ka - 1 if k % 2 == 0 else ka
            pad = ka + kb
            if self.zero_pad:
                hp = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
            else:  # replication pad
                hp = jnp.concatenate(
                    [jnp.repeat(h[:, :1], pad, axis=1), h], axis=1)
            h = nn.Conv(dim, (k,), strides=(stride,), padding="VALID",
                        use_bias=self.conv_bias, dtype=self.dtype,
                        name=f"conv_{i}")(hp)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            affine = not self.non_affine_group_norm
            g = self.param(f"gn_scale_{i}", nn.initializers.ones, (dim,)) \
                if affine else None
            b = self.param(f"gn_bias_{i}", nn.initializers.zeros, (dim,)) \
                if affine else None
            h = _fp32_group_norm(h, g, b)
            h = nn.relu(h)
            if self.skip_connections:
                if residual.shape[-1] != dim:
                    residual = nn.Conv(dim, (1,), use_bias=False,
                                       dtype=self.dtype,
                                       name=f"rproj_{i}")(residual)
                h = (h + residual[:, :h.shape[1]]) * scale
        return h


class Wav2VecPredictionsModel(nn.Module):
    """CPC step-prediction head (predict.py:14-88)."""

    in_dim: int
    out_dim: int
    prediction_steps: int = 12
    n_negatives: int = 10
    cross_sample_negatives: bool = False
    sample_distance: Optional[int] = None
    dropout: float = 0.0
    offset: int = 1
    balanced_classes: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # ConvTranspose2d(in, out, (1, steps)) ≡ a per-step linear projection
        self.step_proj = nn.DenseGeneral(
            features=(self.out_dim, self.prediction_steps),
            axis=-1, dtype=self.dtype, name="project_to_steps")
        self.drop = nn.Dropout(self.dropout)

    def sample_negatives(self, y, key):
        """y: (B, T, C) targets → (N, B, T, C) negative samples."""
        B, T, C = y.shape
        if self.cross_sample_negatives:
            idx = jax.random.randint(key, (self.n_negatives, B, T), 0, B * T)
            flat = y.reshape(B * T, C)
            return flat[idx]
        idx = jax.random.randint(key, (self.n_negatives, B, T), 0, T)
        return jnp.take_along_axis(
            y[None], idx[..., None], axis=2)

    def __call__(self, context, targets, key=None, deterministic: bool = True):
        """context: (B, T, in_dim) aggregator output; targets: (B, T, out_dim)
        encoder output.  Returns (logits, labels, valid) over
        (1+n_negatives, B, steps, T)."""
        if key is None:
            key = self.make_rng("negatives")
        negs = self.sample_negatives(targets, key)          # (N, B, T, C)
        cands = jnp.concatenate([targets[None], negs], 0)   # (1+N, B, T, C)

        preds = self.step_proj(context)                     # (B, T, C, S)
        preds = self.drop(preds, deterministic=deterministic)

        S = self.prediction_steps
        T = context.shape[1]
        t_idx = jnp.arange(T)
        logits_steps, valid_steps = [], []
        for i in range(S):
            off = i + self.offset
            shifted = jnp.roll(cands, -off, axis=2)         # target at t+off
            logits_steps.append(
                jnp.einsum("btc,kbtc->kbt", preds[..., i], shifted))
            valid_steps.append(t_idx < T - off)
        logits = jnp.stack(logits_steps, axis=2)            # (K, B, S, T)
        valid = jnp.broadcast_to(
            jnp.stack(valid_steps, axis=0)[None, None], logits.shape)
        labels = jnp.zeros_like(logits).at[0].set(1.0)
        return logits, labels, valid


def cpc_loss(logits, labels, valid):
    """Masked binary sigmoid CE over the CPC predictions."""
    bce = (jnp.maximum(logits, 0) - logits * labels
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.sum(jnp.where(valid, bce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
