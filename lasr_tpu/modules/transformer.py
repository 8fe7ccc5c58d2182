"""Transformer encoder/decoder stacks (Flax).

Behavioral ports of ``lasr/modules/net/transformer/{encoder,decoder,
encoder_layer,decoder_layer}.py``: pre/post-norm residual blocks (LayerNorm
eps=1e-12, layer_norm.py:4-24), optional concat-linear, embed-layer switches
(linear / conv2d subsampling / token embed), and an after-norm when
normalize_before.

TPU-first decode path: instead of the reference's "cache layer outputs and
recompute the last query" (decoder.py:110-144), ``Decoder.init_cache`` /
``Decoder.forward_one_step`` keep fixed-shape per-layer KV caches updated by
``lax.dynamic_update_slice``, so a whole beam batch steps under ``jit``
inside ``lax.while_loop`` with no shape growth.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lasr_tpu.modules.attention import MultiHeadedAttention
from lasr_tpu.modules.embedding import PositionalEncoding, sinusoid_table
from lasr_tpu.modules.feed_forward import PositionwiseFeedForward
from lasr_tpu.modules.subsampling import Conv2dSubsampling

LAYERNORM_EPS = 1e-12  # reference layer_norm.py eps


class EncoderLayer(nn.Module):
    """Self-attention + FFN residual block (transformer/encoder_layer.py)."""

    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    # sequence parallelism: (data, seq) NamedSharding re-asserted at the
    # block boundary (see ConformerEncoderLayer.act_sharding)
    act_sharding: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 q_rows: Optional[int] = None):
        """``q_rows``: compute only the LAST q_rows positions as queries
        (keys/values span all of x) and return just those rows — the
        reference's incremental-cache path (encoder_layer.py:56-68 /
        transformer per-chunk streaming)."""
        if self.act_sharding is not None and q_rows is None:
            from lasr_tpu.parallel.mesh import constrain_divisible
            x = constrain_divisible(x, self.act_sharding)
        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm1")(x)
        if q_rows is not None:
            x_q = x[:, -q_rows:]
            residual = residual[:, -q_rows:]
            if mask is not None and mask.ndim == 3 and mask.shape[1] > 1:
                mask = mask[:, -q_rows:]
        else:
            x_q = x
        att = MultiHeadedAttention(self.attention_heads, self.size,
                                   self.attention_dropout_rate,
                                   dtype=self.dtype, name="self_attn")(
            x_q, x, x, mask, deterministic=deterministic)
        if q_rows is not None:
            x = x_q
        if self.concat_after:
            x = residual + nn.Dense(self.size, dtype=self.dtype, name="concat_linear")(
                jnp.concatenate([x, att], axis=-1))
        else:
            x = residual + nn.Dropout(self.dropout_rate)(
                att, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm1")(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm2")(x)
        ff = PositionwiseFeedForward(self.size, self.linear_units,
                                     self.dropout_rate, dtype=self.dtype,
                                     name="feed_forward")(
            x, deterministic=deterministic)
        x = residual + nn.Dropout(self.dropout_rate)(ff, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm2")(x)
        return x


class Encoder(nn.Module):
    """Transformer encoder (transformer/encoder.py:12-126).

    ``input_layer``: 'linear' | 'conv2d' | 'embed' | None.
    ``__call__(x, x_len)`` returns (hs (B,T',D), hs_len (B,)).
    """

    idim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "conv2d"
    normalize_before: bool = True
    concat_after: bool = False
    remat: bool = False   # rematerialize layer activations (memory ↓, FLOPs ↑)
    act_sharding: Optional[object] = None   # sequence parallelism
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.input_layer == "conv2d":
            self.embed = Conv2dSubsampling(
                self.idim, self.attention_dim, self.dropout_rate,
                pos_enc=PositionalEncoding(self.attention_dim,
                                           self.positional_dropout_rate,
                                           dtype=self.dtype),
                dtype=self.dtype)
        elif self.input_layer == "linear":
            self.embed_linear = nn.Dense(self.attention_dim, dtype=self.dtype)
            self.embed_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
            self.embed_dropout = nn.Dropout(self.dropout_rate)
            self.embed_pos = PositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, dtype=self.dtype)
        elif self.input_layer == "embed":
            self.embed_tok = nn.Embed(self.idim, self.attention_dim,
                                      dtype=self.dtype)
            self.embed_pos = PositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, dtype=self.dtype)
        elif self.input_layer is None:
            self.embed_pos = PositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, dtype=self.dtype)
        else:
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        layer_cls = nn.remat(EncoderLayer, static_argnums=(3,)) \
            if self.remat else EncoderLayer
        self.encoders = [
            layer_cls(self.attention_dim, self.attention_heads,
                         self.linear_units, self.dropout_rate,
                         self.attention_dropout_rate, self.normalize_before,
                         self.concat_after,
                         act_sharding=self.act_sharding, dtype=self.dtype,
                         name=f"layers_{i}")
            for i in range(self.num_blocks)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)

    def embed_input(self, x, x_len, deterministic: bool = True,
                    solo_len: bool = False, pos_offset=0):
        """``pos_offset``: absolute-PE start position(s) in encoder frames
        — int, or (B,) array for per-row offsets (long-form windows)."""
        if self.input_layer == "conv2d":
            return self.embed(x, x_len, offset=pos_offset,
                              deterministic=deterministic,
                              solo_len=solo_len)
        if self.input_layer == "linear":
            h = self.embed_linear(x)
            h = self.embed_norm(h)
            h = self.embed_dropout(h, deterministic=deterministic)
            h = nn.relu(h)
            return self.embed_pos(h, offset=pos_offset,
                                  deterministic=deterministic), x_len
        if self.input_layer == "embed":
            return self.embed_pos(self.embed_tok(x), offset=pos_offset,
                                  deterministic=deterministic), x_len
        return self.embed_pos(x, offset=pos_offset,
                              deterministic=deterministic), x_len

    def __call__(self, x, x_len, att_mask=None, deterministic: bool = True,
                 solo_pad: bool = False, pos_offset=0):
        """att_mask: optional (T', T') or (B, T', T') extra attention
        constraint (e.g. streaming chunk mask) combined with padding.
        ``solo_pad``: decode-time per-row lengths as if each utterance were
        encoded alone (see Conv2dSubsampling.subsampled_len).
        ``pos_offset``: absolute-PE start position(s), int or (B,) array
        (long-form windowed encoding)."""
        # sequence parallelism: pad the time dim to a seq-axis multiple
        # (see ConformerEncoder.__call__ — appended rows act like bucket
        # padding, masked past every row's h_len)
        len_cap = None
        if self.act_sharding is not None:
            from lasr_tpu.parallel.mesh import seq_axis_size
            sn = seq_axis_size(self.act_sharding)
            if sn > 1:
                if self.input_layer == "conv2d":
                    t_enc = ((x.shape[1] - 1) // 2 - 1) // 2
                    xpad = 4 * ((-t_enc) % sn)
                else:
                    t_enc = x.shape[1]
                    xpad = (-t_enc) % sn
                if xpad:
                    pad_width = [(0, 0), (0, xpad)] + \
                        [(0, 0)] * (x.ndim - 2)
                    x = jnp.pad(x, pad_width)
                    len_cap = t_enc
        h, h_len = self.embed_input(x, x_len, deterministic,
                                    solo_len=solo_pad, pos_offset=pos_offset)
        if len_cap is not None:
            # clamp to the UNPADDED encoder length: full-length rows must
            # not gain trailing frames from the seq pad
            h_len = jnp.minimum(h_len, len_cap)
        T = h.shape[1]
        pad = jnp.arange(T)[None, :] < h_len[:, None]  # (B, T)
        mask = pad[:, None, :]                          # (B, 1, T)
        if att_mask is not None:
            if att_mask.ndim == 2:
                att_mask = att_mask[None]
            mask = mask & att_mask
        for layer in self.encoders:
            h = layer(h, mask, deterministic)
        if self.normalize_before:
            h = self.after_norm(h)
        return h, h_len


class DecoderLayer(nn.Module):
    """Self-attn + src-attn + FFN residual block (decoder_layer.py)."""

    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.self_attention_dropout_rate,
            dtype=self.dtype)
        self.src_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.src_attention_dropout_rate,
            dtype=self.dtype)
        self.feed_forward = PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear1 = nn.Dense(self.size, dtype=self.dtype)
            self.concat_linear2 = nn.Dense(self.size, dtype=self.dtype)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 deterministic: bool = True):
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt
        att = self.self_attn(x, x, x, tgt_mask, deterministic=deterministic)
        if self.concat_after:
            x = residual + self.concat_linear1(jnp.concatenate([x, att], -1))
        else:
            x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        att = self.src_attn(y, memory, memory, memory_mask,
                            deterministic=deterministic)
        if self.concat_after:
            x = residual + self.concat_linear2(jnp.concatenate([y, att], -1))
        else:
            x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        y = self.norm3(x) if self.normalize_before else x
        x = residual + self.dropout(self.feed_forward(y, deterministic=deterministic),
                                    deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm3(x)
        return x

    def step(self, x_t, pos, self_k, self_v, mem_k, mem_v, mem_mask):
        """One cached decode step (deterministic).

        x_t: (B, 1, D); pos: scalar int step index; self_k/v: (B, Lmax, H, dk)
        caches; mem_k/v: (B, T, H, dk) precomputed memory projections;
        mem_mask: (B, 1, T) bool.  Returns (out (B,1,D), self_k, self_v).
        """
        residual = x_t
        x = self.norm1(x_t) if self.normalize_before else x_t
        q = self.self_attn.project_q(x)                   # (B,1,H,dk)
        k_new, v_new = self.self_attn.project_kv(x, x)
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_new, pos, axis=1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_new, pos, axis=1)
        Lmax = self_k.shape[1]
        prefix = (jnp.arange(Lmax) <= pos)[None, None, :]  # (1,1,Lmax)
        att = self.self_attn.attend(q, self_k, self_v, prefix)
        x = residual + att
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        q = self.src_attn.project_q(y)
        att = self.src_attn.attend(q, mem_k, mem_v, mem_mask)
        x = residual + att
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        y = self.norm3(x) if self.normalize_before else x
        x = residual + self.feed_forward(y, deterministic=True)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, self_k, self_v


class Decoder(nn.Module):
    """Transformer decoder (transformer/decoder.py:12-164)."""

    odim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: str = "embed"
    use_output_layer: bool = True
    normalize_before: bool = True
    concat_after: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.input_layer == "embed":
            self.embed_tok = nn.Embed(self.odim, self.attention_dim,
                                      dtype=self.dtype)
        elif self.input_layer == "linear":
            self.embed_linear = nn.Dense(self.attention_dim, dtype=self.dtype)
            self.embed_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
            self.embed_dropout = nn.Dropout(self.dropout_rate)
        else:
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        self.embed_pos = PositionalEncoding(
            self.attention_dim, self.positional_dropout_rate, dtype=self.dtype)
        self.decoders = [
            DecoderLayer(self.attention_dim, self.attention_heads,
                         self.linear_units, self.dropout_rate,
                         self.self_attention_dropout_rate,
                         self.src_attention_dropout_rate,
                         self.normalize_before, self.concat_after,
                         dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_blocks)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.odim, dtype=self.dtype)

    def _embed(self, tgt, deterministic, offset=0):
        if self.input_layer == "embed":
            h = self.embed_tok(tgt)
        else:
            h = self.embed_linear(tgt)
            h = self.embed_norm(h)
            h = self.embed_dropout(h, deterministic=deterministic)
            h = nn.relu(h)
        return self.embed_pos(h, offset=offset, deterministic=deterministic)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 deterministic: bool = True):
        """tgt: (B, L) ids; tgt_mask: (B, L, L); memory: (B, T, D);
        memory_mask: (B, 1, T). Returns (B, L, odim) logits."""
        x = self._embed(tgt, deterministic)
        for layer in self.decoders:
            x = layer(x, tgt_mask, memory, memory_mask,
                      deterministic=deterministic)
        if self.normalize_before:
            x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        return x

    # ---- fixed-shape cached decode ----

    def init_cache(self, batch: int, max_len: int) -> Dict[str, jnp.ndarray]:
        h, dk = self.attention_heads, self.attention_dim // self.attention_heads
        shape = (self.num_blocks, batch, max_len, h, dk)
        return {"k": jnp.zeros(shape, self.dtype), "v": jnp.zeros(shape, self.dtype)}

    def project_memory(self, memory) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute per-layer src-attention K/V once per utterance.
        Returns stacked (num_blocks, B, T, H, dk) arrays."""
        ks, vs = [], []
        for layer in self.decoders:
            k, v = layer.src_attn.project_kv(memory, memory)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def forward_one_step(self, y_t, pos, cache, mem_k, mem_v, mem_mask):
        """y_t: (B,) last token ids; pos: scalar int32 position; cache: from
        ``init_cache``; mem_k/v: from ``project_memory``; mem_mask: (B,1,T).
        Returns (log-probs (B, odim), new cache)."""
        if self.input_layer != "embed":
            raise NotImplementedError("cached decode requires embed input")
        h = self.embed_tok(y_t[:, None])  # (B, 1, D)
        import math as _math
        table = jnp.asarray(
            sinusoid_table(cache["k"].shape[2], self.attention_dim),
            dtype=self.dtype)
        h = h * _math.sqrt(self.attention_dim) + \
            jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)[None]
        new_k, new_v = [], []
        for i, layer in enumerate(self.decoders):
            h, k, v = layer.step(h, pos, cache["k"][i], cache["v"][i],
                                 mem_k[i], mem_v[i], mem_mask)
            new_k.append(k)
            new_v.append(v)
        if self.normalize_before:
            h = self.after_norm(h)
        y = h[:, 0]
        if self.use_output_layer:
            y = self.output_layer(y)
        return jax.nn.log_softmax(y, axis=-1), \
            {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
