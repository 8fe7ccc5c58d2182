"""Joint CTC/attention end-to-end models (Flax).

Behavioral ports of ``lasr/model/e2e_ctc_att/{e2e_base,e2e_transformer,
e2e_conformer}.py`` with the reference's constructor kwargs preserved
verbatim, so existing ``config.yaml`` ``model_config`` blocks resolve here
unchanged (only the module path changes).

The dict contract (everything-is-a-dict, SURVEY.md §1): the forward takes
``{x, xlen, ys_in, ylen}`` and returns ``{att_out, ctc_out, hs_len}``
(reference e2e_base.py:27-44).  Decode hooks mirror e2e_base.py:50-91:
``encode`` (encoder_forward), ``ctc_logits`` (ctc_forward), ``decode_full``
(decoder_forward), and the cached ``decoder_*`` helpers via the Decoder's
fixed-shape KV-cache path.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lasr_tpu.modules.conformer import ConformerEncoder
from lasr_tpu.modules.transformer import Decoder, Encoder
from lasr_tpu.utils.masks import target_mask


class CTCHead(nn.Module):
    """Dropout → Linear CTC projection (e2e_transformer.py:39-42).

    ``domain_dim`` widens the projection input by a per-utterance domain
    tag (reference e2e_conformer.py:52 widens the Linear the same way; its
    forward never concatenates the tag, so the torch path with
    domain_dim > 0 only exists for checkpoint-shape compatibility — here
    the tag is actually plumbed: pass ``domain`` (B, domain_dim) and it is
    broadcast over time and concatenated; omitted, zeros are used so
    widened checkpoints still load and decode)."""

    odim: int
    dropout: float = 0.1
    domain_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hs, deterministic: bool = True, domain=None):
        if self.domain_dim:
            B, T = hs.shape[:2]
            if domain is None:
                tag = jnp.zeros((B, T, self.domain_dim), hs.dtype)
            else:
                tag = jnp.broadcast_to(
                    domain[:, None, :].astype(hs.dtype),
                    (B, T, self.domain_dim))
            hs = jnp.concatenate([hs, tag], axis=-1)
        h = nn.Dropout(self.dropout)(hs, deterministic=deterministic)
        return nn.Dense(self.odim, dtype=self.dtype)(h)


class E2EBase(nn.Module):
    """Shared forward/hook structure; subclasses define submodules in setup."""

    def __call__(self, x, xlen, ys_in, ylen=None, deterministic: bool = True,
                 domain=None):
        """``domain``: optional (B, domain_dim) tag concatenated into the
        CTC head when the model was built with domain_dim > 0."""
        hs, hs_len = self.encoder(x, xlen, deterministic=deterministic)
        ys_mask = target_mask(ys_in, ignore_id=-1)
        att_out = self.decoder(ys_in, ys_mask, hs,
                               self._mem_mask(hs, hs_len),
                               deterministic=deterministic)
        ctc_out = self.ctc(hs, deterministic=deterministic, domain=domain)
        return {"att_out": att_out, "ctc_out": ctc_out, "hs_len": hs_len}

    @staticmethod
    def _mem_mask(hs, hs_len):
        T = hs.shape[1]
        return (jnp.arange(T)[None, :] < hs_len[:, None])[:, None, :]

    # ---- decode hooks (reference e2e_base.py:50-91) ----

    def encode(self, x, xlen, deterministic: bool = True,
               solo_pad: bool = False, pos_offset=0):
        """``solo_pad=True`` = decode-time semantics: each row's length and
        conv padding behave as if the utterance were encoded alone, making
        batched decode bit-equivalent to the reference's one-at-a-time
        decode driver (decode_lighting.py:129).  ``pos_offset``: absolute-PE
        start position(s) in encoder frames (long-form windowed encoding;
        int or per-row (B,) array; no-op for relative PE)."""
        import inspect
        params = inspect.signature(type(self.encoder).__call__).parameters
        kwargs = {}
        if solo_pad and "solo_pad" in params:
            kwargs["solo_pad"] = True
            # chunked/streaming encoders window per chunk; solo-pad
            # semantics don't apply — omitted there
        if not (isinstance(pos_offset, int) and pos_offset == 0) \
                and "pos_offset" in params:
            kwargs["pos_offset"] = pos_offset
        return self.encoder(x, xlen, deterministic=deterministic, **kwargs)

    def ctc_logits(self, hs, deterministic: bool = True, domain=None):
        return self.ctc(hs, deterministic=deterministic, domain=domain)

    def get_ctc_prob(self, x, xlen, deterministic: bool = True, domain=None):
        hs, _ = self.encoder(x, xlen, deterministic=deterministic)
        return self.ctc(hs, deterministic=deterministic, domain=domain)

    def decode_full(self, ys, hs, hs_len, deterministic: bool = True):
        """Full (non-incremental) decoder pass over hypothesis prefixes."""
        ys_mask = target_mask(ys, ignore_id=-1)
        return self.decoder(ys, ys_mask, hs, self._mem_mask(hs, hs_len),
                            deterministic=deterministic)

    # fixed-shape cached decode (used by beam search under jit)
    def decoder_init_cache(self, batch: int, max_len: int):
        return self.decoder.init_cache(batch, max_len)

    def decoder_project_memory(self, hs):
        return self.decoder.project_memory(hs)

    def decoder_step(self, y_t, pos, cache, mem_k, mem_v, mem_mask):
        return self.decoder.forward_one_step(y_t, pos, cache, mem_k, mem_v,
                                             mem_mask)

    def get_input_dict(self):
        return {"x": "(B,T,D)", "xlen": "(B,)", "ys_in": "(B,N)", "ylen": "(B,)"}

    def get_out_dict(self):
        return {"att_out": "(B,N,O)", "ctc_out": "(B,T,O)", "hs_len": "(B,)"}


class E2E_Transformer_CTC(E2EBase):
    """Transformer enc-dec + CTC head (e2e_transformer.py:6-42)."""

    idim: int = 13
    odim: int = 26
    encoder_attention_dim: int = 256
    encoder_attention_heads: int = 4
    encoder_linear_units: int = 2048
    encoder_num_blocks: int = 12
    encoder_input_layer: str = "conv2d"
    encoder_dropout_rate: float = 0.1
    encoder_attention_dropout_rate: float = 0.0
    decoder_attention_dim: int = 256
    decoder_attention_heads: int = 4
    decoder_linear_units: int = 2048
    decoder_num_block: int = 6
    decoder_input_layer: str = "embed"
    decoder_dropout_rate: float = 0.1
    decoder_src_attention_dropout_rate: float = 0.0
    decoder_self_attention_dropout_rate: float = 0.0
    ctc_dropout: float = 0.1
    encoder_remat: bool = False
    # sequence parallelism (see E2E_Conformer_CTC.encoder_act_sharding)
    encoder_act_sharding: object = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
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
            act_sharding=self.encoder_act_sharding,
            dtype=self.dtype)
        self.decoder = Decoder(
            odim=self.odim,
            attention_dim=self.decoder_attention_dim,
            attention_heads=self.decoder_attention_heads,
            linear_units=self.decoder_linear_units,
            num_blocks=self.decoder_num_block,
            input_layer=self.decoder_input_layer,
            dropout_rate=self.decoder_dropout_rate,
            positional_dropout_rate=self.decoder_dropout_rate,
            self_attention_dropout_rate=self.decoder_self_attention_dropout_rate,
            src_attention_dropout_rate=self.decoder_src_attention_dropout_rate,
            dtype=self.dtype)
        self.ctc = CTCHead(self.odim, self.ctc_dropout, dtype=self.dtype)


class E2E_Conformer_CTC(E2EBase):
    """Conformer encoder + Transformer decoder + CTC head
    (e2e_conformer.py:10-53)."""

    idim: int = 13
    odim: int = 26
    encoder_attention_dim: int = 256
    encoder_attention_heads: int = 4
    encoder_linear_units: int = 2048
    encoder_num_blocks: int = 12
    encoder_input_layer: str = "conv2d"
    encoder_dropout_rate: float = 0.1
    encoder_attention_dropout_rate: float = 0.0
    encoder_pos_enc_layer_type: str = "abs_pos"
    encoder_selfattention_layer_type: str = "selfattn"
    encoder_use_cnn: bool = True
    encoder_cnn_kernel: int = 31
    decoder_attention_dim: int = 256
    decoder_attention_heads: int = 4
    decoder_linear_units: int = 2048
    decoder_num_block: int = 6
    decoder_input_layer: str = "embed"
    decoder_dropout_rate: float = 0.1
    decoder_src_attention_dropout_rate: float = 0.0
    decoder_self_attention_dropout_rate: float = 0.0
    ctc_dropout: float = 0.1
    domain_dim: int = 0
    encoder_remat: bool = False
    encoder_use_pallas_attention: bool = False
    encoder_remat_attend: int = 0   # see MultiHeadedAttention.remat_attend
    # "table" (reference parity) or "rotated" (one-matmul fold in training,
    # positional dropout in rotated score space — documented deviation);
    # see ConformerEncoder.pos_dropout_mode
    encoder_pos_dropout_mode: str = "table"
    # fused Pallas flash kernel for rotated-fold scoring (see
    # ConformerEncoder.rot_fold_pallas)
    encoder_rot_fold_pallas: bool = False
    # int8-MXU feed-forward GEMMs in every encoder block (ops/quant.py;
    # beyond-reference TPU feature, opt-in, checkpoint-compatible with
    # the bf16 build — gated by tools/probe_ff_int8.py A/Bs)
    encoder_ff_int8: bool = False
    encoder_scan_layers: bool = False
    # pipeline parallelism (modules/pipeline.py): stage-stacked encoder
    # blocks scheduled GPipe-style; the stage axis shards over the mesh
    # 'pipe' axis.  YAML-visible model structure (affects param shapes).
    encoder_pipeline_stages: int = 1
    encoder_pipeline_microbatches: int = 0
    # sequence parallelism: NamedSharding for encoder activations over a
    # (data, seq) mesh; injected by Trainer when the mesh has a seq axis
    # (parallel/mesh.py seq_sharding), not a YAML-visible knob
    encoder_act_sharding: object = None
    # pipeline buffer NamedSharding ([stages, mb, T, D] — pipe, data);
    # injected by Trainer when the mesh has a pipe axis, not a YAML knob
    encoder_pipe_sharding: object = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConformerEncoder(
            idim=self.idim,
            attention_dim=self.encoder_attention_dim,
            attention_heads=self.encoder_attention_heads,
            linear_units=self.encoder_linear_units,
            num_blocks=self.encoder_num_blocks,
            input_layer=self.encoder_input_layer,
            dropout_rate=self.encoder_dropout_rate,
            positional_dropout_rate=self.encoder_dropout_rate,
            attention_dropout_rate=self.encoder_attention_dropout_rate,
            positionwise_layer_type="linear",
            positionwise_conv_kernel_size=1,
            macaron_style=False,
            pos_enc_layer_type=self.encoder_pos_enc_layer_type,
            selfattention_layer_type=self.encoder_selfattention_layer_type,
            use_cnn_module=self.encoder_use_cnn,
            cnn_module_kernel=self.encoder_cnn_kernel,
            remat=self.encoder_remat,
            use_pallas_attention=self.encoder_use_pallas_attention,
            remat_attend=self.encoder_remat_attend,
            pos_dropout_mode=self.encoder_pos_dropout_mode,
            rot_fold_pallas=self.encoder_rot_fold_pallas,
            ff_int8=self.encoder_ff_int8,
            scan_layers=self.encoder_scan_layers,
            pipeline_stages=self.encoder_pipeline_stages,
            pipeline_microbatches=self.encoder_pipeline_microbatches,
            pipe_sharding=self.encoder_pipe_sharding,
            act_sharding=self.encoder_act_sharding,
            dtype=self.dtype)
        self.decoder = Decoder(
            odim=self.odim,
            attention_dim=self.decoder_attention_dim,
            attention_heads=self.decoder_attention_heads,
            linear_units=self.decoder_linear_units,
            num_blocks=self.decoder_num_block,
            input_layer=self.decoder_input_layer,
            dropout_rate=self.decoder_dropout_rate,
            positional_dropout_rate=self.decoder_dropout_rate,
            self_attention_dropout_rate=self.decoder_self_attention_dropout_rate,
            src_attention_dropout_rate=self.decoder_src_attention_dropout_rate,
            dtype=self.dtype)
        self.ctc = CTCHead(self.odim, self.ctc_dropout,
                           domain_dim=self.domain_dim,
                           dtype=self.dtype)
