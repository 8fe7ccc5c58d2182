"""Conformer encoder (Flax).

Behavioral port of ``lasr/modules/net/conformer/{encoder,encoder_layer,
convolution,swish}.py``: macaron-optional blocks of
ff(.5) → MHA(+rel pos) → conv module → ff(.5) → final norm, with the
ConvolutionModule as pointwise→GLU→depthwise(k=31)→BatchNorm→swish→pointwise
(convolution.py:22-79).  BatchNorm keeps the reference's exact semantics:
per-replica statistics (the reference trains with sync_batchnorm=False,
bin/train_lighting.py:207) including padded frames.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from lasr_tpu.modules.attention import (
    MultiHeadedAttention, RelPositionMultiHeadedAttention)
from lasr_tpu.modules.embedding import (
    PositionalEncoding, RelPositionalEncoding, ScaledPositionalEncoding)
from lasr_tpu.modules.feed_forward import (
    Conv1dLinear, MultiLayeredConv1d, PositionwiseFeedForward)
from lasr_tpu.modules.subsampling import Conv2dSubsampling
from lasr_tpu.modules.transformer import LAYERNORM_EPS


def swish(x):
    return x * nn.sigmoid(x)


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 31
    # matmul_form: express the convs as tap-wise matmul/FMA (TapConv1d,
    # param-tree identical to nn.Conv).  Set by the pipelined encoder:
    # XLA's SPMD partitioner miscompiles lax.conv when the stage-vmapped
    # dim is sharded over 'pipe' (repro: tools/spmd_conv_repro.py) while
    # dot_general partitions correctly.
    matmul_form: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, zero_mask=None):
        """x: (B, T, C) → (B, T, C).

        ``zero_mask``: optional (B, T) bool, True = valid frame.  Zeroes the
        GLU output at invalid frames before the depthwise conv so batched
        decode reproduces the zeros the conv's implicit padding provides
        when the utterance is encoded alone (solo-pad decode semantics)."""
        if self.matmul_form:
            from lasr_tpu.modules.convops import TapConv1d
            conv = lambda feat, k, name, **kw: TapConv1d(
                feat, k, dtype=self.dtype, name=name, **kw)
        else:
            conv = lambda feat, k, name, **kw: nn.Conv(
                feat, (k,), dtype=self.dtype, name=name, **kw)
        h = conv(2 * self.channels, 1, "pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        if zero_mask is not None:
            h = jnp.where(zero_mask[..., None], h, 0.0)
        pad = (self.kernel_size - 1) // 2
        h = conv(self.channels, self.kernel_size, "depthwise_conv",
                 padding=[(pad, pad)],
                 feature_group_count=self.channels)(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        h = swish(h)
        return conv(self.channels, 1, "pointwise_conv2")(h)


class ConformerEncoderLayer(nn.Module):
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    selfattention_layer_type: str = "selfattn"   # or "rel_selfattn"
    positionwise_layer_type: str = "linear"      # or "conv1d" / "conv1d-linear"
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = False
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    normalize_before: bool = True
    concat_after: bool = False
    use_pallas_attention: bool = False
    remat_attend: int = 0
    rot_fold: bool = False   # see RelPositionMultiHeadedAttention.rot_fold
    # see RelPositionMultiHeadedAttention.rot_fold_train: positional
    # dropout in rotated score space, enabling the one-matmul fold in
    # training (encoder pos_dropout_mode="rotated")
    rot_fold_train: bool = False
    pos_dropout_rate: float = 0.0
    rot_fold_pallas: bool = False  # fused flash kernel for the fold
    # int8-MXU feed-forward GEMMs (ops/quant.py QuantDense; "linear"
    # positionwise type only) — opt-in, checkpoint-compatible
    ff_int8: bool = False
    # tap-matmul form for every in-layer conv (ConvolutionModule and the
    # conv positionwise types) — required under pipeline parallelism, see
    # ConvolutionModule.matmul_form / tools/spmd_conv_repro.py
    conv_matmul_form: bool = False
    # sequence parallelism: a NamedSharding (batch over 'data', time over
    # 'seq') re-asserted at every block boundary so XLA keeps activations
    # time-sharded across the stack (gathers for attention, halo
    # exchanges for the conv module ride ICI); None = no constraint
    act_sharding: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    def _positionwise(self, name):
        if self.positionwise_layer_type == "linear":
            return PositionwiseFeedForward(
                self.size, self.linear_units, self.dropout_rate,
                activation=swish, int8=self.ff_int8, dtype=self.dtype,
                name=name)
        if self.ff_int8:
            raise ValueError("ff_int8 requires positionwise_layer_type="
                             "'linear'")
        if self.positionwise_layer_type == "conv1d":
            return MultiLayeredConv1d(
                self.size, self.linear_units, self.positionwise_conv_kernel_size,
                self.dropout_rate, matmul_form=self.conv_matmul_form,
                dtype=self.dtype, name=name)
        if self.positionwise_layer_type == "conv1d-linear":
            return Conv1dLinear(
                self.size, self.linear_units, self.positionwise_conv_kernel_size,
                self.dropout_rate, matmul_form=self.conv_matmul_form,
                dtype=self.dtype, name=name)
        raise NotImplementedError(self.positionwise_layer_type)

    @nn.compact
    def __call__(self, x, mask=None, pos_emb=None, deterministic: bool = True,
                 conv_zero_mask=None, pos_table=None):
        if self.act_sharding is not None:
            from lasr_tpu.parallel.mesh import constrain_divisible
            x = constrain_divisible(x, self.act_sharding)
        drop = nn.Dropout(self.dropout_rate)
        ff_scale = 0.5 if self.macaron_style else 1.0

        if self.macaron_style:
            residual = x
            if self.normalize_before:
                x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype,
                                 name="norm_ff_macaron")(x)
            x = residual + ff_scale * drop(
                self._positionwise("feed_forward_macaron")(
                    x, deterministic=deterministic),
                deterministic=deterministic)
            if not self.normalize_before:
                x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype,
                                 name="norm_ff_macaron")(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm_mha")(x)
        if self.selfattention_layer_type == "rel_selfattn":
            assert pos_emb is not None
            att = RelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                use_pallas=self.use_pallas_attention,
                remat_attend=self.remat_attend,
                rot_fold=self.rot_fold,
                rot_fold_train=self.rot_fold_train,
                pos_dropout_rate=self.pos_dropout_rate,
                rot_fold_pallas=self.rot_fold_pallas,
                dtype=self.dtype, name="self_attn")(
                x, x, x, pos_emb, mask, deterministic=deterministic,
                pos_table=pos_table)
        else:
            att = MultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                remat_attend=self.remat_attend,
                dtype=self.dtype, name="self_attn")(
                x, x, x, mask, deterministic=deterministic)
        if self.concat_after:
            x = residual + nn.Dense(self.size, dtype=self.dtype,
                                    name="concat_linear")(
                jnp.concatenate([x, att], axis=-1))
        else:
            x = residual + drop(att, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm_mha")(x)

        if self.use_cnn_module:
            residual = x
            if self.normalize_before:
                x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype,
                                 name="norm_conv")(x)
            x = residual + drop(
                ConvolutionModule(self.size, self.cnn_module_kernel,
                                  matmul_form=self.conv_matmul_form,
                                  dtype=self.dtype, name="conv_module")(
                    x, deterministic=deterministic,
                    zero_mask=conv_zero_mask),
                deterministic=deterministic)
            if not self.normalize_before:
                x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype,
                                 name="norm_conv")(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm_ff")(x)
        x = residual + ff_scale * drop(
            self._positionwise("feed_forward")(x, deterministic=deterministic),
            deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm_ff")(x)

        if self.use_cnn_module:
            x = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype, name="norm_final")(x)
        return x


class _LayerCarry(struct.PyTreeNode):
    """Scan carry: activations plus the (static) deterministic flag."""
    x: jnp.ndarray
    deterministic: bool = struct.field(pytree_node=False, default=True)


class _ScanConformerLayer(nn.Module):
    """nn.scan adapter: (carry, mask, pos_emb) → (carry, ())."""

    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    selfattention_layer_type: str = "selfattn"
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = False
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    normalize_before: bool = True
    concat_after: bool = False
    use_pallas_attention: bool = False
    remat_attend: int = 0
    rot_fold: bool = False
    rot_fold_train: bool = False
    pos_dropout_rate: float = 0.0
    rot_fold_pallas: bool = False
    ff_int8: bool = False
    conv_matmul_form: bool = False
    remat: bool = False
    act_sharding: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, mask, pos_emb, conv_zero_mask=None,
                 pos_table=None):
        layer_cls = nn.remat(ConformerEncoderLayer, static_argnums=(4,)) \
            if self.remat else ConformerEncoderLayer
        layer = layer_cls(
            self.size, self.attention_heads, self.linear_units,
            self.dropout_rate, self.attention_dropout_rate,
            self.selfattention_layer_type, self.positionwise_layer_type,
            self.positionwise_conv_kernel_size, self.macaron_style,
            self.use_cnn_module, self.cnn_module_kernel,
            self.normalize_before, self.concat_after,
            self.use_pallas_attention, remat_attend=self.remat_attend,
            rot_fold=self.rot_fold, rot_fold_train=self.rot_fold_train,
            pos_dropout_rate=self.pos_dropout_rate,
            rot_fold_pallas=self.rot_fold_pallas,
            ff_int8=self.ff_int8,
            conv_matmul_form=self.conv_matmul_form,
            act_sharding=self.act_sharding,
            dtype=self.dtype, name="block")
        x = layer(carry.x, mask, pos_emb, carry.deterministic, conv_zero_mask,
                  pos_table)
        return carry.replace(x=x), ()


class ConformerEncoder(nn.Module):
    """Conformer encoder stack (conformer/encoder.py:37-229)."""

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
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = False
    pos_enc_layer_type: str = "abs_pos"   # abs_pos | scaled_abs_pos | rel_pos
    remat_attend: int = 0                 # see MultiHeadedAttention.remat_attend
    # the encoder's rel_pos PE is exactly the standard sinusoid table, so
    # the rotated-fold deterministic fast path is sound to enable here
    rot_fold: bool = True
    # where positional dropout applies during training (rel_pos only):
    #   "table"   — on the (1, 2T-1, D) positional table, per (distance,
    #               feature) entry: exact reference semantics
    #               (embedding.py:197), scored via the skewed-table fold
    #               or per-layer rel-shift.
    #   "rotated" — on the rotated position-query u, per (batch, query,
    #               head, frequency) entry, same rate, expectation-equal;
    #               training then uses the one-matmul rotated fold: no
    #               O(T²M) skew table, no (B,H,T,2T-1) rel-shift — the
    #               dominant HBM cost of the training step disappears
    #               (tools/roofline.py books 13.5 ms/step of skew traffic
    #               at recipe shapes).  DOCUMENTED DEVIATION from the
    #               reference's regularization; deterministic forwards
    #               (decode/eval) are bit-identical between modes.
    pos_dropout_mode: str = "table"
    # run rotated-fold scoring through the fused Pallas flash kernel
    # (ops/rot_attention.py) wherever the fold applies — deterministic
    # forwards, and training when pos_dropout_mode="rotated"
    rot_fold_pallas: bool = False
    # int8-MXU feed-forward GEMMs across every block (ops/quant.py);
    # opt-in, checkpoint-compatible with the bf16 build
    ff_int8: bool = False
    selfattention_layer_type: str = "selfattn"
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    remat: bool = False   # rematerialize layer activations (memory ↓, FLOPs ↑)
    use_pallas_attention: bool = False
    # scan_layers stacks the identical blocks into one nn.scan: the layer is
    # traced/lowered ONCE (params get a leading num_blocks axis), which cuts
    # XLA compile time ~num_blocks-fold and — critically — means a single
    # Mosaic compilation when use_pallas_attention is on
    scan_layers: bool = False
    # GPipe pipeline parallelism (modules/pipeline.py): stack the blocks
    # [stages, num_blocks/stages, ...] and run the microbatched tick
    # schedule; the stage axis shards over the mesh 'pipe' axis.  Mutually
    # exclusive with scan_layers (the pipeline already scans within each
    # stage).  microbatches=0 → 2*stages (bubble ≤ 1/3), clamped to a
    # divisor of the batch at call time.
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0
    # NamedSharding for the [stages, mb, T, D] pipeline buffer (pipe over
    # dim 0, data over dim 1); injected by Trainer, not a YAML knob
    pipe_sharding: Optional[object] = None
    # sequence parallelism: NamedSharding for (B, T, D) activations,
    # re-asserted at every block (see ConformerEncoderLayer.act_sharding)
    act_sharding: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    def _pos_enc(self):
        if self.pos_enc_layer_type == "abs_pos":
            return PositionalEncoding(self.attention_dim,
                                      self.positional_dropout_rate,
                                      dtype=self.dtype)
        if self.pos_enc_layer_type == "scaled_abs_pos":
            return ScaledPositionalEncoding(self.attention_dim,
                                            self.positional_dropout_rate,
                                            dtype=self.dtype)
        if self.pos_enc_layer_type == "rel_pos":
            assert self.selfattention_layer_type == "rel_selfattn"
            return RelPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate,
                drop_pos=(self.pos_dropout_mode == "table"),
                dtype=self.dtype)
        raise ValueError(f"unknown pos_enc_layer: {self.pos_enc_layer_type}")

    def setup(self):
        if self.pos_dropout_mode not in ("table", "rotated"):
            raise ValueError(
                f"unknown pos_dropout_mode: {self.pos_dropout_mode!r}")
        if self.pos_dropout_mode == "rotated" and not (
                self.pos_enc_layer_type == "rel_pos" and self.rot_fold):
            raise ValueError(
                "pos_dropout_mode='rotated' needs pos_enc_layer_type="
                "'rel_pos' with rot_fold enabled")
        pos_enc = self._pos_enc()
        if self.input_layer == "conv2d":
            self.embed = Conv2dSubsampling(
                self.idim, self.attention_dim, self.dropout_rate,
                pos_enc=pos_enc, dtype=self.dtype)
        elif self.input_layer == "linear":
            self.embed_linear = nn.Dense(self.attention_dim, dtype=self.dtype)
            self.embed_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
            self.embed_dropout = nn.Dropout(self.dropout_rate)
            self.embed_pos = pos_enc
        elif self.input_layer is None:
            self.embed_pos = pos_enc
        else:
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        layer_cls = nn.remat(ConformerEncoderLayer, static_argnums=(4,)) \
            if self.remat else ConformerEncoderLayer
        layer_kwargs = dict(
            size=self.attention_dim, attention_heads=self.attention_heads,
            linear_units=self.linear_units, dropout_rate=self.dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            selfattention_layer_type=self.selfattention_layer_type,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            normalize_before=self.normalize_before,
            concat_after=self.concat_after,
            use_pallas_attention=self.use_pallas_attention,
            remat_attend=self.remat_attend,
            rot_fold=(self.rot_fold
                      and self.pos_enc_layer_type == "rel_pos"),
            rot_fold_train=(self.pos_dropout_mode == "rotated"),
            pos_dropout_rate=(self.positional_dropout_rate
                              if self.pos_dropout_mode == "rotated" else 0.0),
            rot_fold_pallas=self.rot_fold_pallas,
            ff_int8=self.ff_int8,
            act_sharding=self.act_sharding,
            dtype=self.dtype)
        if self.pipeline_stages > 1:
            if self.scan_layers:
                raise ValueError("pipeline_stages>1 already scans the "
                                 "layers within each stage; unset "
                                 "scan_layers")
            from lasr_tpu.modules.pipeline import make_stage_stack
            # named pipe_stages: the path component is the marker
            # parallel/sharding.py uses to split dim 0 over the mesh
            # 'pipe' axis.  conv_matmul_form: lax.conv with the stage dim
            # sharded miscompiles in the SPMD partitioner
            # (tools/spmd_conv_repro.py) — TapConv1d is param-compatible,
            # so checkpoints move freely between topologies.
            pipe_kwargs = dict(layer_kwargs, conv_matmul_form=True)
            self.encoders_pipelined = make_stage_stack(
                _ScanConformerLayer, dict(remat=self.remat, **pipe_kwargs),
                self.num_blocks, self.pipeline_stages, name="pipe_stages")
            self.encoders = []
        elif self.scan_layers:
            scanned = nn.scan(
                _ScanConformerLayer,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast),
                length=self.num_blocks,
                metadata_params={nn.PARTITION_NAME: "layers"})
            self.encoders_scanned = scanned(remat=self.remat, name="layers",
                                            **layer_kwargs)
            self.encoders = []
        else:
            self.encoders = [
                layer_cls(name=f"layers_{i}", **layer_kwargs)
                for i in range(self.num_blocks)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)

    def __call__(self, x, x_len, att_mask=None, deterministic: bool = True,
                 solo_pad: bool = False, pos_offset=0):
        """``solo_pad``: decode-time semantics — per-row lengths as if each
        utterance were encoded alone, and zeros past the valid length before
        the conv module (the reference decodes utterances one at a time, so
        this makes batched decode bit-equivalent to its solo decode).
        ``pos_offset``: absolute-PE start position(s) in encoder frames
        (int or (B,) array, long-form windows); a no-op under rel_pos,
        which is translation-invariant by construction."""
        rel = self.pos_enc_layer_type == "rel_pos"
        # sequence parallelism: pad the time dim so the encoder length
        # divides the mesh seq axis (otherwise the sharding constraint
        # would silently drop the seq dim).  Appended feature rows behave
        # exactly like the dataset's bucket padding: past every row's
        # h_len, masked everywhere downstream.
        len_cap = None   # clamp h_len to the UNPADDED encoder length so
        # full-length rows don't gain trailing frames from the pad
        # (the batch-length convention would otherwise credit them)
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
                    x = jnp.pad(x, ((0, 0), (0, xpad), (0, 0)))
                    len_cap = t_enc
        if self.input_layer == "conv2d":
            out, h_len = self.embed(x, x_len,
                                    offset=0 if rel else pos_offset,
                                    deterministic=deterministic,
                                    solo_len=solo_pad)
        elif self.input_layer == "linear":
            h = self.embed_linear(x)
            h = self.embed_norm(h)
            h = self.embed_dropout(h, deterministic=deterministic)
            out = (self.embed_pos(h, deterministic=deterministic) if rel else
                   self.embed_pos(h, offset=pos_offset,
                                  deterministic=deterministic))
            h_len = x_len
        else:
            out = (self.embed_pos(x, deterministic=deterministic) if rel else
                   self.embed_pos(x, offset=pos_offset,
                                  deterministic=deterministic))
            h_len = x_len
        if rel:
            h, pos_emb = out
        else:
            h, pos_emb = out, None
        if len_cap is not None:
            h_len = jnp.minimum(h_len, len_cap)

        T = h.shape[1]
        pad = jnp.arange(T)[None, :] < h_len[:, None]
        mask = pad[:, None, :]
        if att_mask is not None:
            if att_mask.ndim == 2:
                att_mask = att_mask[None]
            mask = mask & att_mask
        conv_zero = pad if solo_pad else None
        # pre-skew the shared rel-position table ONCE per forward (gradient-
        # free): layers then contract against it with no per-layer shift.
        # The table is O(T^2 * M) memory (5.8 GB at T=3000!), so past a
        # length cutoff the layers fall back to the per-layer rel_shift
        # path, whose transients are O(B*H*T*2T) — that is what makes
        # long-form (minutes-scale) encoder forwards fit in HBM.
        pos_table = None
        if rel and pos_emb is not None and not self.use_pallas_attention \
                and self.pos_dropout_mode == "table" \
                and pos_emb.shape[0] == 1 and pos_emb.shape[1] == 2 * T - 1 \
                and T <= 1024:
            from lasr_tpu.modules.attention import build_skewed_pos_table
            pos_table = build_skewed_pos_table(pos_emb)
        if self.pipeline_stages > 1:
            from lasr_tpu.modules.pipeline import run_pipeline
            h = run_pipeline(
                self, "encoders_pipelined", _LayerCarry, h, mask, conv_zero,
                pos_emb, pos_table, self.pipeline_stages,
                self.pipeline_microbatches or 2 * self.pipeline_stages,
                deterministic, buf_sharding=self.pipe_sharding)
        elif self.scan_layers:
            h, _ = self.encoders_scanned(
                _LayerCarry(h, deterministic), mask, pos_emb, conv_zero,
                pos_table)
            h = h.x
        else:
            for layer in self.encoders:
                h = layer(h, mask, pos_emb, deterministic, conv_zero,
                          pos_table)
        if self.normalize_before:
            h = self.after_norm(h)
        return h, h_len
