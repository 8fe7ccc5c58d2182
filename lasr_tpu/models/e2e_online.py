"""Streaming / dual-mode end-to-end models (Flax).

Behavioral ports of ``lasr/model/e2e_ctc_att/e2e_transformer_online.py`` and
``e2e_transformer_online_offline.py`` with the reference constructor kwargs
preserved, so recipe YAMLs resolve here unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lasr_tpu.models.e2e_ctc_att import CTCHead, E2EBase
from lasr_tpu.modules.streaming import (
    ChunkEncoder, ParallelDynamicDualEncoder, StreamDecoder)
from lasr_tpu.utils.masks import target_mask


class E2E_Transformer_CTC_Online(E2EBase):
    """ChunkEncoder + StreamDecoder + CTC head
    (e2e_transformer_online.py:10-63)."""

    idim: int = 13
    odim: int = 26
    encoder_attention_dim: int = 256
    encoder_attention_heads: int = 4
    encoder_left_chunk: int = 64
    encoder_center_chunk: int = 64
    encoder_right_chunk: int = 64
    encoder_linear_units: int = 2048
    encoder_num_blocks: int = 12
    encoder_input_layer: str = "conv2d"
    encoder_dropout_rate: float = 0.1
    encoder_attention_dropout_rate: float = 0.0
    decoder_attention_dim: int = 256
    decoder_self_attention_heads: int = 4
    decoder_src_attention_heads: int = 4
    decoder_linear_units: int = 2048
    decoder_num_block: int = 6
    decoder_input_layer: str = "embed"
    decoder_dropout_rate: float = 0.1
    decoder_src_attention_dropout_rate: float = 0.0
    decoder_self_attention_dropout_rate: float = 0.0
    decoder_src_attention_bias_init: float = 0.0
    decoder_src_attention_sigmoid_noise: float = 1.0
    ctc_dropout: float = 0.1
    encoder_remat: bool = False  # see ChunkEncoder.remat
    # layer-major: run the subsampling conv once over the full stream
    # and slice chunk rows (ChunkEncoder.conv_once; halves the conv
    # FLOPs that dominate the online step's roofline — off by default
    # to keep the 1e-5 parity pins, training configs opt in)
    encoder_conv_once: bool = False
    # layer-major full-stream encoder forward (ChunkEncoder.layer_major):
    # same math as the sequential chunk scan, MXU-shaped; False = legacy
    # scan (A/B probes)
    encoder_layer_major: bool = True
    # max chunk-rows per layer-major group (0 = unbounded); bounds peak
    # HBM at recipe-scale duration buckets (ChunkEncoder.layer_major_rows)
    encoder_layer_major_rows: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ChunkEncoder(
            idim=self.idim,
            attention_dim=self.encoder_attention_dim,
            attention_heads=self.encoder_attention_heads,
            linear_units=self.encoder_linear_units,
            num_blocks=self.encoder_num_blocks,
            input_layer=self.encoder_input_layer,
            dropout_rate=self.encoder_dropout_rate,
            positional_dropout_rate=self.encoder_dropout_rate,
            attention_dropout_rate=self.encoder_attention_dropout_rate,
            remat=self.encoder_remat,
            layer_major=self.encoder_layer_major,
            layer_major_rows=self.encoder_layer_major_rows,
            conv_once=self.encoder_conv_once,
            left_len=self.encoder_left_chunk,
            cur_len=self.encoder_center_chunk,
            right_len=self.encoder_right_chunk,
            hop_len=self.encoder_center_chunk,
            dtype=self.dtype)
        self.decoder = StreamDecoder(
            odim=self.odim,
            attention_dim=self.decoder_attention_dim,
            self_attention_heads=self.decoder_self_attention_heads,
            src_attention_heads=self.decoder_src_attention_heads,
            linear_units=self.decoder_linear_units,
            num_blocks=self.decoder_num_block,
            input_layer=self.decoder_input_layer,
            dropout_rate=self.decoder_dropout_rate,
            positional_dropout_rate=self.decoder_dropout_rate,
            src_attention_dropout_rate=self.decoder_src_attention_dropout_rate,
            self_attention_dropout_rate=self.decoder_self_attention_dropout_rate,
            src_attention_bias_init=self.decoder_src_attention_bias_init,
            src_attention_sigmoid_noise=self.decoder_src_attention_sigmoid_noise,
            dtype=self.dtype)
        self.ctc = CTCHead(self.odim, self.ctc_dropout, dtype=self.dtype)

    # the streaming encoder IS the forward path (encoder_forward_online)
    def encode_online(self, x, xlen, deterministic: bool = True,
                      ref_tail: bool = False):
        return self.encoder(x, xlen, deterministic=deterministic,
                            ref_tail=ref_tail)

    def decoder_init_cache(self, batch: int, max_len: int):
        return self.decoder.init_cache(batch, max_len)

    def decoder_step_online(self, y_t, pos, cache, memory):
        return self.decoder.forward_one_step_online(y_t, pos, cache, memory)

    def decoder_step_ep(self, y_t, pos, cache, mem_k, mem_v, mem_mask=None,
                        parent=None, alive=None):
        """Online beam-decode step: the reference decode_feat_online drives
        forward_one_step_online (endpoint-truncated source attention,
        ctc_att_decoder.py:400), not the offline monotonic step; endpoints
        chain across same-parent siblings in beam order (see
        StreamDecoderLayer.step_online_chained).  Returns
        (logp, cache, ep_stall)."""
        return self.decoder.forward_one_step_ep(y_t, pos, cache, mem_k,
                                                mem_v, mem_mask, parent,
                                                alive)


class E2E_Transformer_CTC_Univ_Dynamic(nn.Module):
    """ParallelDynamicDualEncoder + StreamDecoder: one forward yields the
    offline and online views plus per-layer source attention maps
    (e2e_transformer_online_offline.py:10-118)."""

    idim: int = 13
    odim: int = 26
    encoder_attention_dim: int = 256
    encoder_attention_heads: int = 4
    encoder_attention_chunk: int = 16
    encoder_attention_left: int = -1
    encoder_linear_units: int = 2048
    encoder_num_blocks: int = 12
    encoder_input_layer: str = "conv2d"
    encoder_dropout_rate: float = 0.1
    encoder_attention_dropout_rate: float = 0.0
    decoder_attention_dim: int = 256
    decoder_self_attention_heads: int = 4
    decoder_src_attention_heads: int = 4
    decoder_linear_units: int = 2048
    decoder_num_block: int = 6
    decoder_input_layer: str = "embed"
    decoder_dropout_rate: float = 0.1
    decoder_src_attention_dropout_rate: float = 0.0
    decoder_self_attention_dropout_rate: float = 0.0
    decoder_src_attention_bias_init: float = 0.0
    decoder_src_attention_sigmoid_noise: float = 1.0
    ctc_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ParallelDynamicDualEncoder(
            idim=self.idim,
            attention_dim=self.encoder_attention_dim,
            attention_heads=self.encoder_attention_heads,
            attention_chunk=self.encoder_attention_chunk,
            attention_left=self.encoder_attention_left,
            linear_units=self.encoder_linear_units,
            num_blocks=self.encoder_num_blocks,
            input_layer=self.encoder_input_layer,
            dropout_rate=self.encoder_dropout_rate,
            positional_dropout_rate=self.encoder_dropout_rate,
            attention_dropout_rate=self.encoder_attention_dropout_rate,
            dtype=self.dtype)
        self.decoder = StreamDecoder(
            odim=self.odim,
            attention_dim=self.decoder_attention_dim,
            self_attention_heads=self.decoder_self_attention_heads,
            src_attention_heads=self.decoder_src_attention_heads,
            linear_units=self.decoder_linear_units,
            num_blocks=self.decoder_num_block,
            input_layer=self.decoder_input_layer,
            dropout_rate=self.decoder_dropout_rate,
            positional_dropout_rate=self.decoder_dropout_rate,
            src_attention_dropout_rate=self.decoder_src_attention_dropout_rate,
            self_attention_dropout_rate=self.decoder_self_attention_dropout_rate,
            src_attention_bias_init=self.decoder_src_attention_bias_init,
            src_attention_sigmoid_noise=self.decoder_src_attention_sigmoid_noise,
            dtype=self.dtype)
        self.ctc = CTCHead(self.odim, self.ctc_dropout, dtype=self.dtype)

    def __call__(self, x, xlen, ys_in, ylen=None, deterministic: bool = True):
        B = x.shape[0]
        hs_off, hs_on, hs_len = self.encoder(x, xlen,
                                             deterministic=deterministic)
        T = hs_off.shape[1]
        mem_mask = (jnp.arange(T)[None, :] < hs_len[:, None])[:, None, :]
        ys_mask = target_mask(ys_in, ignore_id=-1)

        hs_all = jnp.concatenate([hs_off, hs_on], axis=0)
        ys_all = jnp.concatenate([ys_in, ys_in], axis=0)
        ys_mask_all = jnp.concatenate([ys_mask, ys_mask], axis=0)
        mem_mask_all = jnp.concatenate([mem_mask, mem_mask], axis=0)
        att_all, attn_maps = self.decoder(
            ys_all, ys_mask_all, hs_all, mem_mask_all,
            deterministic=deterministic, collect_attn=True)

        ctc_all = self.ctc(hs_all, deterministic=deterministic)
        return {
            "att_out_on": att_all[B:],
            "ctc_out_on": ctc_all[B:],
            "ali_out": attn_maps[B:],   # online half (reference :78-80)
            "att_out_off": att_all[:B],
            "ctc_out_off": ctc_all[:B],
            "hs_len": hs_len,
            # aliases so the standard E2E_Loss / decode hooks work too
            "att_out": att_all[:B],
            "ctc_out": ctc_all[:B],
        }

    def encode(self, x, xlen, online: bool = False,
               deterministic: bool = True, solo_pad: bool = False):
        # solo_pad is accepted for decoder-API compatibility; the dual
        # encoder's chunk-mask views already window attention per block,
        # so the offline/online split governs padding semantics here
        del solo_pad
        if online:
            hs, hs_len = self.encoder.forward_online(
                x, xlen, deterministic=deterministic)
        else:
            hs, hs_len = self.encoder.forward_offline(
                x, xlen, deterministic=deterministic)
        return hs, hs_len

    def ctc_logits(self, hs, deterministic: bool = True):
        return self.ctc(hs, deterministic=deterministic)

    def decoder_init_cache(self, batch: int, max_len: int):
        return self.decoder.init_cache(batch, max_len)

    def decoder_step_online(self, y_t, pos, cache, memory):
        return self.decoder.forward_one_step_online(y_t, pos, cache, memory)

    def decoder_step_ep(self, y_t, pos, cache, mem_k, mem_v, mem_mask=None,
                        parent=None, alive=None):
        return self.decoder.forward_one_step_ep(y_t, pos, cache, mem_k,
                                                mem_v, mem_mask, parent,
                                                alive)
