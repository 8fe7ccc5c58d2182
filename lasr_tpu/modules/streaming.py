"""Streaming encoders/decoder (Flax) — TPU-first redesign.

Behavioral ports of ``lasr/modules/net/online_transformer/{encoder,
encoder_layer,decoder}.py`` and the DualEncoder in
``lasr/modules/net/transformer/encoder.py:128-323``:

  - ``StreamEncoderLayer``: self-attention over [cached memory ‖ chunk]
    keys with a detached ring memory of the stream's last ``mem_len``
    frames (encoder_layer.py:47-128).  The reference mutates a buffer per
    chunk; here memory is an explicit fixed-shape carry.
  - ``ChunkEncoder``: Transformer-XL style streaming encoder.  The
    reference's python generator over sliding windows
    (encoder.py:143-176) becomes one ``nn.scan`` over a static chunk grid:
    chunks of (cur+right) frames advance by ``hop``, each chunk is conv
    subsampled with a positional-encoding offset, runs the layer stack
    against carried memories, and contributes its first cur/4 outputs.
  - ``DualTransformerEncoder``: offline + chunk-masked online views over
    shared weights (encoder.py:206-240).
  - ``ParallelDynamicDualEncoder``: both views in one 2B-batch forward
    with a random chunk size (chunk + U{0..16} - 8) per step
    (online encoder.py:252-317).  The reference pre-registers 17 mask
    buffers of (1250,1250); here the block mask is built on the fly from
    the traced chunk size — no tables.
  - ``StreamDecoder``: decoder stack whose source attention is monotonic
    truncated attention (decoder.py:166-326), returning per-layer source
    attention maps for alignment losses (``ali_out``,
    e2e_transformer_online_offline.py:78-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from lasr_tpu.modules.attention import (
    MTMultiHeadedAttention, MultiHeadedAttention)
from lasr_tpu.modules.embedding import PositionalEncoding, sinusoid_table
from lasr_tpu.modules.feed_forward import PositionwiseFeedForward
from lasr_tpu.modules.subsampling import Conv2dSubsampling
from lasr_tpu.modules.transformer import LAYERNORM_EPS, EncoderLayer
from lasr_tpu.utils.masks import chunk_attention_mask


class StreamEncoderLayer(nn.Module):
    """Encoder block attending over [memory ‖ chunk]; returns new memory."""

    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    hop_sub: int = 16
    mem_len_sub: int = 16
    normalize_before: bool = True
    concat_after: bool = False
    use_grad: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            dtype=self.dtype)
        self.feed_forward = PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear = nn.Dense(self.size, dtype=self.dtype)

    def _attend_ff(self, xh, kx, kmask, residual, deterministic: bool):
        """The row-independent tail of the block: attend over [mem ‖ chunk]
        keys, residual+norm, feed-forward.  Shared by the sequential
        chunk step and (in row groups) the layer-major forward."""
        att = self.self_attn(xh, kx, kx, kmask, deterministic=deterministic)
        if self.concat_after:
            x = residual + self.concat_linear(jnp.concatenate([xh, att], -1))
        else:
            x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        x = residual + self.dropout(
            self.feed_forward(y, deterministic=deterministic),
            deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        return x

    def __call__(self, x, mem, kmask, deterministic: bool = True):
        """x: (B, Tc, D) chunk; mem: (B, M, D) carried memory (post-norm1
        values, like the reference's ``update_mems(x)`` after norm1);
        kmask: (B, 1, M+Tc) key validity.  Returns (out, new_mem)."""
        residual = x
        xh = self.norm1(x) if self.normalize_before else x
        kx = jnp.concatenate([mem, xh], axis=1)
        x = self._attend_ff(xh, kx, kmask, residual, deterministic)

        # memory keeps the last mem_len frames of the stream up to this
        # chunk's hop boundary (encoder_layer.py:55-65); detached unless
        # use_grad
        new_mem = jnp.concatenate([mem, xh[:, : self.hop_sub]], axis=1)
        new_mem = new_mem[:, -self.mem_len_sub:]
        if not self.use_grad:
            new_mem = jax.lax.stop_gradient(new_mem)
        return x, new_mem

    def forward_all_chunks(self, x, kmask, n: int,
                           deterministic: bool = True, row_cap: int = 0):
        """All n chunks of the stream through this layer in ONE batched op.

        The carried memory of chunk c is the last ``mem_len_sub`` frames
        of the previous chunks' ``norm1(input)[:, :hop_sub]`` hop regions
        (see ``__call__``) — a value that depends only on this layer's
        INPUT, never its output.  So once layer i-1 has produced every
        chunk, layer i's memories for ALL chunks are a chunk-shifted view
        of its own normed input, and the whole layer runs as one
        (n·B)-row batch instead of n sequential 1-chunk steps.  This is
        the TPU-first training formulation: at recipe shapes the
        sequential chunk scan feeds the MXU 16-row GEMMs, n·blocks times
        in a chain; layer-major restores offline-encoder-sized GEMMs.
        Exactly the same math as scanning ``__call__`` over chunks.

        x: (n·B, Tc, D) chunk-major layer input; kmask: (n·B, 1, M+Tc).
        ``row_cap`` > 0 bounds the number of chunk-rows attended at once:
        the attention+FF tail is row-independent once the memory view is
        gathered, so it scans over ⌈n·B/row_cap⌉ remat'd row groups —
        peak HBM temps scale with ``row_cap`` instead of n·B (the
        recipe-scale duration buckets stack >1.2k chunk-rows, whose
        (rows, Tc, ffn) and padded per-head temps exhaust 16 GB), while
        each group still feeds the MXU row_cap·Tc-row GEMMs.
        Returns (n·B, Tc, D).
        """
        residual = x
        xh = self.norm1(x) if self.normalize_before else x
        NB, Tc, D = xh.shape
        B = NB // n
        M, hop = self.mem_len_sub, self.hop_sub
        # stream of hop regions, chunk-major: (B, n·hop, D)
        hops = xh.reshape(n, B, Tc, D)[:, :, :hop]
        stream = jnp.moveaxis(hops, 0, 1).reshape(B, n * hop, D)
        stream = jnp.pad(stream, ((0, 0), (M, 0), (0, 0)))
        # mem[c] = stream_padded[:, c·hop : c·hop + M] — the scan carry's
        # exact value at chunk c (zeros before the stream starts)
        idx = (jnp.arange(n) * hop)[:, None] + jnp.arange(M)[None, :]
        mem = jnp.moveaxis(stream[:, idx], 1, 0).reshape(NB, M, D)
        if not self.use_grad:
            mem = jax.lax.stop_gradient(mem)

        kx = jnp.concatenate([mem, xh], axis=1)
        if row_cap and row_cap < NB:
            rows = row_cap
            groups = -(-NB // rows)
            # pad to groups·rows by wrapping row indices (duplicate rows
            # recompute a few chunks; their outputs are dropped)
            ridx = jnp.arange(groups * rows) % NB
            xs = tuple(a[ridx].reshape(groups, rows, *a.shape[1:])
                       for a in (xh, kx, kmask, residual))

            def body(module, carry, xs_g):
                xh_g, kx_g, km_g, res_g = xs_g
                return carry, module._attend_ff(xh_g, kx_g, km_g, res_g,
                                                deterministic)

            # remat the BODY: a plain scan saves every group's attention/
            # FF residuals — re-materializing the full-NB footprint the
            # grouping exists to avoid
            body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True})
            _, out = scan(self, None, xs)
            return out.reshape(groups * rows, Tc, D)[:NB]
        return self._attend_ff(xh, kx, kmask, residual, deterministic)


def _chunk_grid(T_raw: int, cur: int, right: int, hop: int) -> int:
    """Number of sliding chunks the reference iterator yields
    (encoder.py:143-154 with left_len=0 and right pad right+6)."""
    padded = T_raw + right + 6
    n = 0
    i = 0
    chunk_len = cur + right
    while i + chunk_len < padded - 6 + hop:
        n += 1
        i += hop
    return n


class ChunkEncoder(nn.Module):
    """Streaming chunked encoder (online_transformer/encoder.py:15-176)."""

    idim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    normalize_before: bool = True
    concat_after: bool = False
    left_len: int = 64
    cur_len: int = 64
    right_len: int = 64
    hop_len: int = 64
    use_mem: bool = True
    use_grad: bool = False
    # rematerialize each chunk's block stack in the backward pass: the
    # chunk scan otherwise saves every per-chunk per-block intermediate
    # ([n_chunks, B, chunk, d/ffn] x num_blocks — OOM at recipe batch
    # scale on 16 GB HBM); with remat only the scan carries/outputs
    # survive the forward.  Under layer_major the same flag remats each
    # layer (drops the (n·B, Tc, ffn) FF intermediates).
    remat: bool = False
    # layer-major full-utterance forward (training/offline decode): each
    # layer processes ALL chunks as one (n·B)-row batch — see
    # StreamEncoderLayer.forward_all_chunks.  Exactly the same math as
    # the sequential chunk scan (memories depend only on each layer's
    # input), but MXU-shaped: the scan feeds 16-row GEMMs n_chunks ×
    # num_blocks times in a chain.  False = legacy scan (A/B probes).
    layer_major: bool = True
    # max chunk-rows per layer-major attention/FF group (0 = all at
    # once).  Bounds peak HBM under layer_major at duration-bucketed
    # recipe batches (see StreamEncoderLayer.forward_all_chunks).
    layer_major_rows: int = 0
    # layer-major only: run the subsampling convolution ONCE over the
    # full stream and slice each chunk's rows from it, instead of
    # re-convolving every chunk's overlapping (cur+right+6)-frame
    # window.  Same math: window-local row j of chunk c and stream row
    # c*hop_sub + j read the same raw taps [c*hop + 4j, c*hop + 4j + 6]
    # with the same weights and positional index (pinned in
    # test_streaming.py) — but the per-chunk form pays the conv twice
    # for every overlapped frame, the single largest analytic cost of
    # the online step (tools/roofline.py --online: 2.69 of 6.86
    # TFLOP/step).  Two caveats keep this off by default: the conv's
    # f32 accumulation order changes (reassociation-level diffs, so the
    # 1e-5 serving/torch-parity pins hold only with the per-chunk
    # form), and in training overlapping rows share one positional-
    # dropout draw where the per-chunk form drew independently.
    # Training configs opt in for the throughput.
    conv_once: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def _sub(self) -> int:
        return 4 if self.input_layer == "conv2d" else 1

    def setup(self):
        if self.input_layer != "conv2d":
            raise NotImplementedError(
                "ChunkEncoder currently supports input_layer='conv2d' "
                "(the reference recipes' setting)")
        self.embed = Conv2dSubsampling(
            self.idim, self.attention_dim, self.dropout_rate,
            pos_enc=PositionalEncoding(self.attention_dim,
                                       self.positional_dropout_rate,
                                       dtype=self.dtype),
            dtype=self.dtype)
        mem_len = self.left_len if self.use_mem else 0
        self.mem_len_sub = mem_len // self._sub
        self.cur_sub = self.cur_len // self._sub
        self.hop_sub = self.hop_len // self._sub
        # the reference's chunks are exactly (cur+right) raw frames wide
        # (chunk_iter slices chunk_len=left+cur+right with left=0,
        # encoder.py:143-154), so each chunk contributes
        # ((cur+right-1)//2-1)//2 subsampled attention keys.  We conv a
        # (cur+right+6)-frame window (so chunk outputs tile the stream with
        # no conv-tap gaps), which yields one extra trailing column; it is
        # masked out of attention so the key set — and therefore every
        # attended output — equals the reference's.
        self.key_sub = ((self.cur_len + self.right_len - 1) // 2 - 1) // 2 \
            if self._sub == 4 else self.cur_len + self.right_len
        self.layers = [
            StreamEncoderLayer(
                self.attention_dim, self.attention_heads, self.linear_units,
                self.dropout_rate, self.attention_dropout_rate,
                self.hop_sub, self.mem_len_sub, self.normalize_before,
                self.concat_after, self.use_grad, dtype=self.dtype,
                name=f"layers_{i}")
            for i in range(self.num_blocks)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)

    def chunk_step(self, carry, xs, deterministic: bool):
        mems = carry                          # (L, B, M, D) tuple
        chunk_x, offset, valid_mem, key_valid = xs
        # chunk_x: (B, chunk_raw, idim); offset: scalar sub-frame offset;
        # valid_mem: scalar count of filled memory rows;
        # key_valid: (B, chunk_sub) chunk-key validity
        B = chunk_x.shape[0]
        dummy_len = jnp.full((B,), chunk_x.shape[1], jnp.int32)
        h, _ = self.embed(chunk_x, dummy_len, offset=offset,
                          deterministic=deterministic)
        M = self.mem_len_sub
        mem_valid = jnp.arange(M) >= (M - valid_mem)     # (M,)
        kmask = jnp.concatenate(
            [jnp.broadcast_to(mem_valid[None, :], (B, M)), key_valid],
            axis=1)[:, None, :]                           # (B, 1, M+Tc)
        new_mems = []
        for i, layer in enumerate(self.layers):
            h, m = layer(h, mems[i], kmask, deterministic=deterministic)
            new_mems.append(m)
        if self.normalize_before:
            h = self.after_norm(h)
        return tuple(new_mems), h[:, : self.cur_sub]

    def _forward_layer_major(self, chunks, offsets, valid_mem, key_valid,
                             deterministic: bool, x_pad=None):
        """Layer-major full-stream forward: embed every chunk in one
        batch, then run each layer over ALL chunks at once (see
        StreamEncoderLayer.forward_all_chunks for why the memories are
        available in parallel).  Same math as scanning ``chunk_step``.

        chunks: (n, B, chunk_raw, idim); offsets/valid_mem: (n,);
        key_valid: (n, B, chunk_sub).  Returns (n, B, cur_sub, D) — the
        same stacked output the chunk scan yields.
        """
        n, B, chunk_raw, _ = chunks.shape
        Tc_sub = ((chunk_raw - 1) // 2 - 1) // 2
        if self.conv_once and x_pad is not None:
            # one full-stream subsampling pass, then slice each chunk's
            # rows: stream row c*hop_sub + j == chunk c's window row j
            # (identical conv taps and positional index — see conv_once)
            hop = self.hop_sub
            need = hop * (n - 1) + Tc_sub
            h_full, _ = self.embed(
                x_pad, jnp.full((B,), x_pad.shape[1], jnp.int32),
                deterministic=deterministic)
            if h_full.shape[1] < need:
                h_full = jnp.pad(
                    h_full, ((0, 0), (0, need - h_full.shape[1]), (0, 0)))
            idx = (jnp.arange(n) * hop)[:, None] + jnp.arange(Tc_sub)
            h = jnp.moveaxis(h_full[:, idx], 1, 0) \
                .reshape(n * B, Tc_sub, h_full.shape[-1])
        else:
            flat = chunks.reshape(n * B, chunk_raw, chunks.shape[-1])
            dummy_len = jnp.full((n * B,), chunk_raw, jnp.int32)
            off_rows = jnp.repeat(offsets.astype(jnp.int32), B)
            h, _ = self.embed(flat, dummy_len, offset=off_rows,
                              deterministic=deterministic)
        Tc = h.shape[1]
        M = self.mem_len_sub
        mem_valid = jnp.arange(M)[None, :] >= (M - valid_mem[:, None])
        kmask = jnp.concatenate(
            [jnp.broadcast_to(mem_valid[:, None, :], (n, B, M)), key_valid],
            axis=2).reshape(n * B, 1, M + Tc)

        def one(layer, h, kmask):
            return layer.forward_all_chunks(
                h, kmask, n, deterministic=deterministic,
                row_cap=self.layer_major_rows)

        if self.remat:
            one = nn.remat(one, prevent_cse=False)
        for layer in self.layers:
            h = one(layer, h, kmask)
        if self.normalize_before:
            h = self.after_norm(h)
        return h.reshape(n, B, Tc, -1)[:, :, : self.cur_sub]

    def init_stream_state(self, batch: int):
        """Fresh per-layer memories for chunk-incremental serving."""
        return tuple(
            jnp.zeros((batch, self.mem_len_sub, self.attention_dim),
                      self.dtype)
            for _ in range(self.num_blocks))

    def encode_chunk(self, chunk_x, chunk_idx, mems, n_valid=None):
        """Serve one raw chunk of (cur+right+6) frames.

        chunk_x: (B, cur_len+right_len+6, idim) — the stream's frames
        [idx·hop, idx·hop + cur + right + 6) (zero-pad the tail at EOS);
        chunk_idx: scalar int; mems: from ``init_stream_state``;
        n_valid: (B,) total valid frames seen so far (None = everything in
        this chunk is real signal).  Returns (out (B, cur_sub, D), new mems).
        Step-by-step output equals the batch ``__call__`` (tested), so
        offline training and online serving share weights and numerics.
        """
        B = chunk_x.shape[0]
        offset = jnp.asarray(chunk_idx * self.hop_sub, jnp.int32)
        valid_mem = jnp.minimum(offset, self.mem_len_sub)
        chunk_sub = ((chunk_x.shape[1] - 1) // 2 - 1) // 2
        start = jnp.asarray(chunk_idx * self.hop_len, jnp.int32)
        j = jnp.arange(chunk_sub)
        if n_valid is None:
            key_valid = jnp.broadcast_to((j < self.key_sub)[None, :],
                                         (B, chunk_sub))
        else:
            key_valid = ((start + self._sub * j)[None, :] <
                         jnp.asarray(n_valid)[:, None]) & \
                (j < self.key_sub)[None, :]
        new_mems, out = self.chunk_step(
            mems, (chunk_x, offset, valid_mem, key_valid), True)
        return out, new_mems

    def __call__(self, x, x_len, deterministic: bool = True,
                 ref_tail: bool = False):
        """x: (B, T, idim); returns (hs (B, n·cur_sub, D), hs_len).

        ``ref_tail``: reproduce the reference decoder's length convention.
        ``decode_feat_online`` consumes the encoder output with NO mask
        (ctc_att_decoder.py:336-347): every frame of every chunk the solo
        chunk iterator yields counts, including the tail frames of the last
        chunk whose conv taps read the zero right-padding (their queries
        attend over real keys, so they carry real — if low-information —
        activations).  With ``ref_tail=True`` the outputs are left unzeroed
        and hs_len is the per-row solo chunk count × cur_sub
        (chunk_iter: i < x_len + hop - cur, encoder.py:143-154), so a
        batched search over (hs, hs_len) equals the reference's solo
        decode.  Default (False) keeps the production convention: only
        frames backed by real audio are valid."""
        B, T, _ = x.shape
        cur, right, hop = self.cur_len, self.right_len, self.hop_len
        n_chunks = _chunk_grid(T, cur, right, hop)
        chunk_raw = cur + right + 6
        x_pad = jnp.pad(x, ((0, 0), (0, right + 6 + hop), (0, 0)))

        starts = jnp.arange(n_chunks) * hop
        gather_idx = starts[:, None] + jnp.arange(chunk_raw)[None, :]
        chunks = x_pad[:, gather_idx]                 # (B, n, chunk_raw, D)
        chunks = jnp.moveaxis(chunks, 1, 0)           # (n, B, chunk_raw, D)

        offsets = (starts // self._sub).astype(jnp.int32)
        valid_mem = jnp.minimum(starts // self._sub,
                                self.mem_len_sub).astype(jnp.int32)
        chunk_sub = (chunk_raw - 1) // 2
        chunk_sub = (chunk_sub - 1) // 2
        j = jnp.arange(chunk_sub)
        # chunk c's sub-frame j maps to raw frame c*hop + 4j; columns past
        # key_sub exist only as conv margin and are never attendable keys
        key_valid = ((starts[:, None, None] + self._sub * j[None, None, :]
                      < x_len[None, :, None])
                     & (j < self.key_sub)[None, None, :])  # (n, B, chunk_sub)

        if self.layer_major:
            outs = self._forward_layer_major(
                chunks, offsets, valid_mem, key_valid, deterministic,
                x_pad=x_pad)
        else:
            mems0 = tuple(
                jnp.zeros((B, self.mem_len_sub, self.attention_dim),
                          self.dtype)
                for _ in range(self.num_blocks))

            def body(module, carry, xs):
                return module.chunk_step(carry, xs, deterministic)

            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True})
            _, outs = scan(self, mems0,
                           (chunks, offsets, valid_mem, key_valid))
        hs = jnp.moveaxis(outs, 0, 1).reshape(B, -1, self.attention_dim)

        if ref_tail:
            # solo chunk count: #{c >= 0 : c·hop < x_len + hop - cur}
            n_solo = jnp.maximum(
                (x_len + hop - cur - 1) // hop + 1, 0).astype(jnp.int32)
            hs_len = jnp.minimum(n_solo, n_chunks) * self.cur_sub
            return hs, hs_len
        g = jnp.arange(hs.shape[1])
        c = g // self.cur_sub
        jj = g % self.cur_sub
        valid = (c * hop + self._sub * jj)[None, :] < x_len[:, None]
        hs_len = jnp.sum(valid, axis=1).astype(jnp.int32)
        hs = jnp.where(valid[..., None], hs, 0.0)
        return hs, hs_len


class DualTransformerEncoder(nn.Module):
    """Offline + chunk-masked online forward over shared weights
    (transformer/encoder.py:128-323)."""

    idim: int
    attention_dim: int = 256
    attention_heads: int = 4
    attention_chunk: int = 16
    attention_left: int = -1
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    normalize_before: bool = True
    concat_after: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from lasr_tpu.modules.transformer import Encoder
        self.core = Encoder(
            idim=self.idim, attention_dim=self.attention_dim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units, num_blocks=self.num_blocks,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.positional_dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            input_layer=self.input_layer,
            normalize_before=self.normalize_before,
            concat_after=self.concat_after, dtype=self.dtype)

    def _chunk_mask(self, size: int, chunk=None):
        chunk = self.attention_chunk if chunk is None else chunk
        return chunk_attention_mask(size, chunk, self.attention_left)

    def __call__(self, x, x_len, deterministic: bool = True):
        """Returns (hs_offline, hs_online, hs_len)."""
        h, h_len = self.core.embed_input(x, x_len, deterministic)
        off = self._run(h, h_len, None, deterministic)
        on = self._run(h, h_len, self._chunk_mask(h.shape[1]), deterministic)
        return off, on, h_len

    def _run(self, h, h_len, att_mask, deterministic):
        T = h.shape[1]
        mask = (jnp.arange(T)[None, :] < h_len[:, None])[:, None, :]
        if att_mask is not None:
            mask = mask & att_mask[None]
        for layer in self.core.encoders:
            h = layer(h, mask, deterministic=deterministic)
        if self.normalize_before:
            h = self.core.after_norm(h)
        return h

    def forward_offline(self, x, x_len, deterministic: bool = True):
        h, h_len = self.core.embed_input(x, x_len, deterministic)
        return self._run(h, h_len, None, deterministic), h_len

    def forward_online(self, x, x_len, deterministic: bool = True):
        h, h_len = self.core.embed_input(x, x_len, deterministic)
        return self._run(h, h_len, self._chunk_mask(h.shape[1]),
                         deterministic), h_len

    def forward_per_chunk(self, x_raw, caches=None, right: int = 0):
        """Incremental chunk-masked inference (reference
        transformer/encoder.py:242-323 / online encoder.py:358-410).

        x_raw: ALL raw frames received so far (B, T_raw, idim) — each call
        embeds only the yet-unseen tail (with positional offset) and runs
        every layer's queries only over the new rows against cached keys.
        caches: previous return value (None to start); right: raw
        right-context frames to hold back and re-encode next call.
        Returns (new subsampled outputs (B, chunk', D), new caches).
        """
        right_sub = right // 4
        B, T_raw, _ = x_raw.shape
        if caches is None:
            offset = 0
            new_raw = x_raw
        else:
            offset = caches[0].shape[1]
            new_raw = x_raw[:, offset * 4 - T_raw:]
        dummy_len = jnp.full((B,), new_raw.shape[1], jnp.int32)
        h_new, _ = self.core.embed(new_raw, dummy_len, offset=offset,
                                   deterministic=True)
        h = jnp.concatenate([caches[0], h_new], axis=1) if caches is not None \
            else h_new
        hlen = h.shape[1]
        chunk = hlen - offset
        mask_full = self._chunk_mask(hlen)[None]          # (1, hlen, hlen)
        new_caches = [h[:, : hlen - right_sub] if right_sub else h]
        rows = h[:, -chunk:]
        for i, layer in enumerate(self.core.encoders):
            full = jnp.concatenate([caches[i + 1], rows], axis=1) \
                if caches is not None else rows
            rows = layer(full, mask_full[:, -chunk:, :hlen], True,
                         q_rows=chunk)
            new_caches.append(full[:, : hlen - right_sub] if right_sub
                              else full)
        out = rows[:, : chunk - right_sub] if right_sub else rows
        if self.normalize_before:
            out = self.core.after_norm(out)
        return out, new_caches


class ParallelDynamicDualEncoder(DualTransformerEncoder):
    """Dual forward in one 2B batch with a random chunk size per step
    (online_transformer/encoder.py:178-317): chunk = attention_chunk +
    U{0..16} - 8; eval/online decode uses idx=8 (the nominal chunk)."""

    def __call__(self, x, x_len, deterministic: bool = True):
        h, h_len = self.core.embed_input(x, x_len, deterministic)
        T = h.shape[1]
        if deterministic:
            chunk = self.attention_chunk
        else:
            idx = jax.random.randint(self.make_rng("dropout"), (), 0, 17)
            chunk = self.attention_chunk + idx - 8
        pad = (jnp.arange(T)[None, :] < h_len[:, None])[:, None, :]
        off_mask = jnp.broadcast_to(pad, (h.shape[0], T, T))
        on_mask = pad & self._chunk_mask(T, chunk)[None]
        h2 = jnp.concatenate([h, h], axis=0)
        mask2 = jnp.concatenate([off_mask, on_mask], axis=0)
        for layer in self.core.encoders:
            h2 = layer(h2, mask2, deterministic=deterministic)
        if self.normalize_before:
            h2 = self.core.after_norm(h2)
        B = x.shape[0]
        return h2[:B], h2[B:], h_len


class StreamDecoderLayer(nn.Module):
    """Decoder block with monotonic truncated source attention
    (online_transformer/decoder_layer.py semantics)."""

    size: int
    self_attention_heads: int
    src_attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    src_attention_bias_init: float = 0.0
    src_attention_sigmoid_noise: float = 1.0
    normalize_before: bool = True
    concat_after: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.self_attention_heads, self.size,
            self.self_attention_dropout_rate, dtype=self.dtype)
        self.src_attn = MTMultiHeadedAttention(
            self.src_attention_heads, self.size,
            self.src_attention_dropout_rate,
            bias_init=self.src_attention_bias_init,
            sigmoid_noise=self.src_attention_sigmoid_noise, dtype=self.dtype)
        self.feed_forward = PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 deterministic: bool = True, return_attn: bool = False):
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt
        att = self.self_attn(x, x, x, tgt_mask, deterministic=deterministic)
        x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        src_out = self.src_attn(y, memory, memory, memory_mask,
                                deterministic=deterministic,
                                return_attn=return_attn)
        att, attn_map = src_out if return_attn else (src_out, None)
        x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        y = self.norm3(x) if self.normalize_before else x
        x = residual + self.dropout(
            self.feed_forward(y, deterministic=deterministic),
            deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm3(x)
        if return_attn:
            return x, attn_map
        return x

    def step_offline(self, x_t, pos, self_k, self_v, mem_k, mem_v, mem_mask):
        """Cached decode step with full (untruncated) monotonic source
        attention — the reference's forward_one_step_offline
        (decoder.py:298-326)."""
        residual = x_t
        x = self.norm1(x_t) if self.normalize_before else x_t
        q = self.self_attn.project_q(x)
        k_new, v_new = self.self_attn.project_kv(x, x)
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_new, pos, 1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_new, pos, 1)
        prefix = (jnp.arange(self_k.shape[1]) <= pos)[None, None, :]
        att = self.self_attn.attend(q, self_k, self_v, prefix)
        x = residual + att
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        q = self.src_attn.project_q(y)
        att = self.src_attn.attend_monotonic(q, mem_k, mem_v, mem_mask)
        x = residual + att
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        y = self.norm3(x) if self.normalize_before else x
        x = residual + self.feed_forward(y, deterministic=True)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, self_k, self_v

    def step_online_chained(self, x_t, pos, self_k, self_v, mem_k, mem_v,
                            ep_slots, parent, alive, mem_mask=None):
        """One cached online beam-decode step over PRE-PROJECTED memory K/V
        with the reference's SIBLING-CHAINED endpoint semantics.

        ``decode_feat_online`` hands every beam child the SAME ``att_prev``
        object (ctc_att_decoder.py:446) and ``decode_attention`` advances
        the cached endpoint list IN PLACE (online_transformer/
        attention.py:109-117), so when the next step expands hypotheses in
        beam order, each one both reads and mutates its parent's shared
        per-layer endpoint state: later siblings start from the endpoints
        already advanced by earlier siblings.  Exactness therefore needs a
        beam-ordered chain, not an independent per-hypothesis advance.

        ``x_t``: (B·K, 1, D) flat; ``ep_slots``: (B, K, H) endpoints stored
        per PREVIOUS beam slot; ``parent``: (B, K) previous-slot index of
        each current hypothesis; ``alive``: (B, K) — dead slots are
        expanded vacuously and must not mutate the chain.  Returns
        (x, self_k, self_v, ep_eff (B, K, H), ep_stall (B, K)) — ep_eff[k]
        is hypothesis k's effective endpoints this step AND the per-slot
        state the next step's chain starts from (the reference's fresh
        list copy, decoder.py:133); ep_stall flags live hypotheses whose
        advance found no candidate among the visible (unmasked) keys —
        the incremental search's pause signal."""
        residual = x_t
        x = self.norm1(x_t) if self.normalize_before else x_t
        q = self.self_attn.project_q(x)
        k_new, v_new = self.self_attn.project_kv(x, x)
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_new, pos, 1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_new, pos, 1)
        prefix = (jnp.arange(self_k.shape[1]) <= pos)[None, None, :]
        att = self.self_attn.attend(q, self_k, self_v, prefix)
        x = residual + att
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        q = self.src_attn.project_q(y)
        s = self.src_attn.decode_scores(q, mem_k, mask=mem_mask)  # (B·K,H,T2)
        B, K = parent.shape
        sK = s.reshape(B, K, *s.shape[1:])                        # (B,K,H,T2)

        def chain(ep_state, xs):
            s_k, p_k, a_k = xs            # (B,H,T2), (B,), (B,)
            cur = jnp.take_along_axis(
                ep_state, p_k[:, None, None], axis=1)[:, 0]       # (B,H)
            new, has = self.src_attn.advance_endpoint(s_k, cur)
            new = jnp.where(a_k[:, None], new, cur)
            # a live hypothesis whose advance found no candidate among the
            # VISIBLE keys may advance once more frames exist — the
            # incremental search pauses on this (see advance_endpoint)
            stall = a_k & jnp.any(~has, axis=-1)                  # (B,)
            slot = (jnp.arange(K)[None, :] == p_k[:, None])       # (B,K)
            upd = slot[:, :, None] & a_k[:, None, None]
            ep_state = jnp.where(upd, new[:, None, :], ep_state)
            return ep_state, (new, stall)

        _, (ep_eff, ep_stall) = jax.lax.scan(
            chain, ep_slots,
            (jnp.moveaxis(sK, 1, 0), parent.T, alive.T))
        ep_eff = jnp.moveaxis(ep_eff, 0, 1)                       # (B,K,H)
        ep_stall = ep_stall.T                                     # (B,K)

        att = self.src_attn.decode_context(
            s, mem_v, ep_eff.reshape(B * K, -1))
        x = residual + att
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        y = self.norm3(x) if self.normalize_before else x
        x = residual + self.feed_forward(y, deterministic=True)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, self_k, self_v, ep_eff, ep_stall

    def step_online(self, x_t, pos, self_k, self_v, memory, endpoint):
        """One cached online decode step: self-attn over the KV prefix,
        monotonic source attention with per-head endpoint advance."""
        residual = x_t
        x = self.norm1(x_t) if self.normalize_before else x_t
        q = self.self_attn.project_q(x)
        k_new, v_new = self.self_attn.project_kv(x, x)
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_new, pos, 1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_new, pos, 1)
        prefix = (jnp.arange(self_k.shape[1]) <= pos)[None, None, :]
        att = self.self_attn.attend(q, self_k, self_v, prefix)
        x = residual + att
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        y = self.norm2(x) if self.normalize_before else x
        q = self.src_attn.project_q(y)
        mk, mv = self.src_attn.project_kv(memory, memory)
        att, new_ep = self.src_attn.decode_attend(q, mk, mv, endpoint)
        x = residual + att
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        y = self.norm3(x) if self.normalize_before else x
        x = residual + self.feed_forward(y, deterministic=True)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, self_k, self_v, new_ep


class StreamDecoder(nn.Module):
    """Streaming decoder stack (transformer/decoder.py:166-326)."""

    odim: int
    attention_dim: int = 256
    self_attention_heads: int = 4
    src_attention_heads: int = 1
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    src_attention_bias_init: float = 0.0
    src_attention_sigmoid_noise: float = 1.0
    input_layer: str = "embed"
    use_output_layer: bool = True
    normalize_before: bool = True
    concat_after: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.input_layer != "embed":
            raise NotImplementedError("StreamDecoder supports embed input")
        self.embed_tok = nn.Embed(self.odim, self.attention_dim,
                                  dtype=self.dtype)
        self.embed_pos = PositionalEncoding(
            self.attention_dim, self.positional_dropout_rate, dtype=self.dtype)
        self.decoders = [
            StreamDecoderLayer(
                self.attention_dim, self.self_attention_heads,
                self.src_attention_heads, self.linear_units,
                self.dropout_rate, self.self_attention_dropout_rate,
                self.src_attention_dropout_rate,
                self.src_attention_bias_init,
                self.src_attention_sigmoid_noise,
                self.normalize_before, self.concat_after,
                dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_blocks)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(LAYERNORM_EPS, dtype=self.dtype)
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.odim, dtype=self.dtype)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 deterministic: bool = True, collect_attn: bool = False):
        """Returns logits (B, L, odim); with ``collect_attn`` also the
        concatenated per-layer source attention maps (B, layers·H, L, T)
        — the ``ali_out`` contract (e2e_transformer_online_offline.py:78)."""
        x = self.embed_pos(self.embed_tok(tgt), deterministic=deterministic)
        attns = []
        for layer in self.decoders:
            out = layer(x, tgt_mask, memory, memory_mask,
                        deterministic=deterministic, return_attn=collect_attn)
            if collect_attn:
                x, attn = out
                attns.append(attn)
            else:
                x = out
        if self.normalize_before:
            x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        if collect_attn:
            return x, jnp.concatenate(attns, axis=1)  # (B, layers·H, L, T)
        return x

    # fixed-shape cached online decode
    def init_cache(self, batch: int, max_len: int):
        h = self.self_attention_heads
        dk = self.attention_dim // h
        shape = (self.num_blocks, batch, max_len, h, dk)
        ep = jnp.full((self.num_blocks, batch, self.src_attention_heads), -1,
                      jnp.int32)
        return {"k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype),
                "ep": ep}

    def project_memory(self, memory):
        """Per-layer src-attention K/V, stacked (num_blocks, B, T, H, dk)."""
        ks, vs = [], []
        for layer in self.decoders:
            k, v = layer.src_attn.project_kv(memory, memory)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def forward_one_step(self, y_t, pos, cache, mem_k, mem_v, mem_mask):
        """Decoder-compatible cached step (offline/full-context monotonic
        attention — reference forward_one_step_offline)."""
        import math as _math
        h = self.embed_tok(y_t[:, None])
        table = jnp.asarray(
            sinusoid_table(cache["k"].shape[2], self.attention_dim),
            dtype=self.dtype)
        h = h * _math.sqrt(self.attention_dim) + \
            jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)[None]
        ks, vs = [], []
        for i, layer in enumerate(self.decoders):
            h, k, v = layer.step_offline(h, pos, cache["k"][i], cache["v"][i],
                                         mem_k[i], mem_v[i], mem_mask)
            ks.append(k)
            vs.append(v)
        if self.normalize_before:
            h = self.after_norm(h)
        y = h[:, 0]
        if self.use_output_layer:
            y = self.output_layer(y)
        return jax.nn.log_softmax(y, axis=-1), \
            {"k": jnp.stack(ks), "v": jnp.stack(vs), "ep": cache["ep"]}

    def forward_one_step_ep(self, y_t, pos, cache, mem_k, mem_v,
                            mem_mask=None, parent=None, alive=None):
        """Beam-decode step with the reference ONLINE semantics
        (forward_one_step_online, decoder.py:114-142): monotonic truncated
        source attention over memory K/V pre-projected once per utterance
        (``project_memory``), whose per-layer/head endpoints ride the
        cache — stored per beam SLOT and chained across same-parent
        siblings in beam order (see ``step_online_chained``; the
        reference shares one mutable endpoint list per layer among a
        parent's children).  ``mem_mask``: (B·K, 1, T) or (B·K, T) key
        validity (the reference decodes solo); ``parent``/``alive``:
        (B, K) previous-slot index and liveness of each hypothesis.
        cache["ep"]: (layers, B·K, H) per-previous-slot endpoints — the
        caller must NOT parent-reorder this leaf (chaining gathers by
        ``parent`` itself)."""
        import math as _math
        if mem_mask is not None and mem_mask.ndim == 3:
            mem_mask = mem_mask[:, 0, :]
        B, K = parent.shape
        h = self.embed_tok(y_t[:, None])
        table = jnp.asarray(
            sinusoid_table(cache["k"].shape[2], self.attention_dim),
            dtype=self.dtype)
        h = h * _math.sqrt(self.attention_dim) + \
            jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)[None]
        ks, vs, eps = [], [], []
        ep_stall = jnp.zeros((B, K), bool)
        for i, layer in enumerate(self.decoders):
            ep_slots = cache["ep"][i].reshape(B, K, -1)
            h, k, v, ep, stall = layer.step_online_chained(
                h, pos, cache["k"][i], cache["v"][i], mem_k[i], mem_v[i],
                ep_slots, parent, alive, mem_mask)
            ks.append(k)
            vs.append(v)
            eps.append(ep.reshape(B * K, -1))
            ep_stall = ep_stall | stall
        if self.normalize_before:
            h = self.after_norm(h)
        y = h[:, 0]
        if self.use_output_layer:
            y = self.output_layer(y)
        return jax.nn.log_softmax(y, axis=-1), \
            {"k": jnp.stack(ks), "v": jnp.stack(vs), "ep": jnp.stack(eps)}, \
            ep_stall

    def forward_one_step_online(self, y_t, pos, cache, memory):
        """y_t: (B,); pos: scalar; memory: (B, T, D) streamed encoder out.
        Returns (log-probs (B, odim), new cache incl. per-layer endpoints)."""
        import math as _math
        h = self.embed_tok(y_t[:, None])
        table = jnp.asarray(
            sinusoid_table(cache["k"].shape[2], self.attention_dim),
            dtype=self.dtype)
        h = h * _math.sqrt(self.attention_dim) + \
            jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)[None]
        ks, vs, eps = [], [], []
        for i, layer in enumerate(self.decoders):
            h, k, v, ep = layer.step_online(
                h, pos, cache["k"][i], cache["v"][i], memory, cache["ep"][i])
            ks.append(k)
            vs.append(v)
            eps.append(ep)
        if self.normalize_before:
            h = self.after_norm(h)
        y = h[:, 0]
        if self.use_output_layer:
            y = self.output_layer(y)
        return jax.nn.log_softmax(y, axis=-1), \
            {"k": jnp.stack(ks), "v": jnp.stack(vs), "ep": jnp.stack(eps)}
