"""Multi-head attention family (Flax).

Behavioral ports of ``lasr/modules/net/transformer/attention.py``:
  - ``MultiHeadedAttention``: scaled-dot MHA; the post-softmax map is
    ``sow``n into the 'intermediates' collection (key ``attn``) for the
    ``calculate_all_attentions`` parity hook (reference attention.py:84-88).
  - ``RelPositionMultiHeadedAttention``: Transformer-XL relative position
    scoring with learnable pos_bias_u/v and the rel-shift trick
    (attention.py:117-203).
  - ``MTMultiHeadedAttention``: monotonic truncated attention — sigmoid
    choose-probabilities times an exclusive survival cumprod, trainable
    scalar score bias, optional training-time sigmoid noise
    (attention.py:241-277; bug-fixed copy online_transformer/attention.py).

All masks are boolean with True = attendable.  Each class exposes
``project_kv`` / ``attend`` so decode-time KV caching reuses the same
parameters without re-projecting the memory every step.
"""

from __future__ import annotations

import math
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn


def _mask_min(dtype) -> float:
    return float(jnp.finfo(dtype).min)


import functools


@functools.lru_cache(maxsize=8)
def _rot_tables(T: int, M: int):
    """Numpy constants for the rotated rel-position fold (see
    ``RelPositionMultiHeadedAttention._rot_fold_attend``): W[i] carries
    sin/cos(ω_c·i) interleaved (= ``sinusoid_table``), V[j] the same with
    sin/cos swapped within each frequency pair."""
    from lasr_tpu.modules.embedding import sinusoid_table
    import numpy as np
    W = sinusoid_table(T, M)              # [i,2c]=sin(ω_c i), [2c+1]=cos
    V = np.empty_like(W)
    V[:, 0::2] = W[:, 1::2]               # cos(ω_c j)
    V[:, 1::2] = W[:, 0::2]               # sin(ω_c j)
    return W, V


def _rel_fold_ctx(q_u, q_v, k, v, kmat, pos_table, mask, neg, dk):
    """Full rel-pos (folded-table) attention interior as one pure function
    — the remat_attend>=2 region (see RelPositionMultiHeadedAttention)."""
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
    z = jnp.einsum("bqhd,mhd->bhqm", q_v, kmat)
    bd = jnp.einsum("bhqm,qkm->bhqk", z, pos_table)
    return _softmax_ctx((ac + bd) / math.sqrt(dk), v, mask, neg)


def _softmax_ctx(scores, v, mask, neg):
    """Pure mask→softmax→mask→context core (the remat_attend region).
    scores: (B,H,T1,T2); v: (B,T2,H,dk); mask (B,1|H,T1|1,T2) or None."""
    if mask is not None:
        scores = jnp.where(mask, scores, neg)
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        # zero fully-masked rows (see the comment in _softmax_attend)
        attn = jnp.where(mask, attn, 0.0)
    # named so remat_attend=3's save_only_these_names policy can keep the
    # softmax OUTPUT as the region's single residual (a no-op otherwise)
    attn = jax.ad_checkpoint.checkpoint_name(attn, "attn_probs")
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _remat_policy(level: int):
    """remat_attend>=2 checkpoint policy: 2 = save nothing (recompute
    scores AND softmax in bwd); 3 = save only the named softmax output —
    bwd then re-runs neither the score matmuls (their grads contract the
    saved region inputs directly) nor the exp chain (softmax bwd needs
    only its output), and exactly one (B,H,T,T) tensor survives fwd."""
    if level >= 3:
        return jax.checkpoint_policies.save_only_these_names("attn_probs")
    return jax.checkpoint_policies.nothing_saveable


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # rematerialize the attention interior in the backward pass instead of
    # saving (B, H, T, T)-sized intermediates: 1 = recompute the softmax
    # region (scores stay saved), 2 = recompute scores too (only q/k/v and
    # the position projections are saved), 3 = checkpoint the whole
    # interior but save the softmax OUTPUT (between 1 and 2: one saved
    # (B,H,T,T) tensor like level 1, but bwd recomputes neither the score
    # matmuls nor the exp chain — softmax bwd needs only its output, and
    # the score-einsum grads contract the saved region inputs directly).
    # Saved (B,H,T,T) tensors are
    # what XLA spills and relayouts between their forward producer and the
    # several backward consumers (~15 ms/step of pure copies at recipe
    # shapes, tools/xprof_detail.py) — recomputing them keeps each
    # materialization single-consumer.  Ignored when the attention map is
    # being sown (calculate_all_attentions) or attention dropout is live.
    remat_attend: int = 0

    @property
    def d_k(self) -> int:
        return self.n_feat // self.n_head

    def setup(self):
        assert self.n_feat % self.n_head == 0
        dense = lambda name: nn.Dense(self.n_feat, dtype=self.dtype, name=name)
        self.linear_q = dense("linear_q")
        self.linear_k = dense("linear_k")
        self.linear_v = dense("linear_v")
        self.linear_out = dense("linear_out")
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.n_head, self.d_k)

    def project_q(self, query):
        return self._split(self.linear_q(query))  # (B, T1, H, dk)

    def project_kv(self, key, value):
        return self._split(self.linear_k(key)), self._split(self.linear_v(value))

    def _remat_ok(self, deterministic) -> bool:
        return (self.remat_attend > 0
                and not self.is_mutable_collection("intermediates")
                and (deterministic or self.dropout_rate == 0.0))

    def _softmax_attend(self, scores, v, mask, deterministic):
        """scores: (B, H, T1, T2); v: (B, T2, H, dk); mask broadcastable to
        (B, 1|H, T1|1, T2) boolean."""
        if mask is not None:
            while mask.ndim < scores.ndim:
                mask = mask[:, None] if mask.ndim == 3 else mask[None]
        if self._remat_ok(deterministic):
            core = jax.checkpoint(
                _softmax_ctx, static_argnums=(3,),
                policy=_remat_policy(self.remat_attend))
            x = core(scores, v, mask, _mask_min(scores.dtype))
            B, T1 = x.shape[:2]
            return self.linear_out(x.reshape(B, T1, self.n_feat))
        if mask is not None:
            scores = jnp.where(mask, scores, _mask_min(scores.dtype))
            attn = jax.nn.softmax(scores, axis=-1)
            # the second masked_fill(0.0) (reference attention.py:84-88)
            # matters ONLY for fully-masked rows: rows with >= 1 valid key
            # already get exact zeros from the underflow of
            # exp(finfo.min - max), but dummy batch-padding rows
            # (hs_len == 0) are all-masked and would otherwise attend
            # uniformly — their activations then leak into conformer
            # BatchNorm batch statistics.  XLA elides the runtime cost.
            attn = jnp.where(mask, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores, axis=-1)
        self.sow("intermediates", "attn", attn)
        p_attn = self.attn_dropout(attn, deterministic=deterministic)
        x = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
        B, T1 = x.shape[:2]
        return self.linear_out(x.reshape(B, T1, self.n_feat))

    def attend(self, q, k, v, mask=None, deterministic: bool = True):
        """q: (B, T1, H, dk); k/v: (B, T2, H, dk)."""
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
        return self._softmax_attend(scores, v, mask, deterministic)

    def __call__(self, query, key, value, mask=None, deterministic: bool = True):
        q = self.project_q(query)
        k, v = self.project_kv(key, value)
        return self.attend(q, k, v, mask, deterministic)


class _PosLinear(nn.Module):
    """Bias-free position projection (the reference's ``linear_pos``).

    Same parameter tree path/shape/init as ``nn.Dense(features,
    use_bias=False)`` — torch checkpoint mapping is unchanged — but the
    kernel is also directly accessible (``get_kernel``) so the folded
    rel-position path can contract it into the query side instead of
    projecting the full ±(T-1) table every layer.
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))

    def __call__(self, x):
        x, kernel = nn.dtypes.promote_dtype(x, self.kernel, dtype=self.dtype)
        return x @ kernel

    def get_kernel(self):
        (kernel,) = nn.dtypes.promote_dtype(self.kernel, dtype=self.dtype)
        return kernel


def build_skewed_pos_table(pos_emb: jnp.ndarray) -> jnp.ndarray:
    """(1, 2T-1, M) relative PE table → (T, T, M) with out[i, j] =
    pos_emb[0, T-1-i+j] — the rel_shift index map materialized on the
    BATCH-INDEPENDENT table (same pad/reshape skew as ``rel_shift``, but
    once per encoder forward instead of per layer per batch, and with no
    gradient: the sinusoid table is constant).  See
    ``RelPositionMultiHeadedAttention`` for how it is consumed.
    """
    e = pos_emb[0]                                  # (P, M), P = 2T-1
    P, M = e.shape
    T = (P + 1) // 2
    x = jnp.broadcast_to(e[None], (T, P, M))
    x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))        # (T, P+1, M)
    x = x.reshape(P + 1, T, M)[1:]                  # (P, T, M)
    x = x.reshape(T, P, M)
    return x[:, :T]


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (reference attention.py:141-161).

    x: (B, H, T1, P) scores against relative positions [T1-1 .. -(T1-1)]
    (P = 2*T1-1). Returns (B, H, T1, P//2+1): per query row i, the scores
    realigned so column j is relative distance i-j, keeping keys 0..T1-1.
    """
    B, H, T1, P = x.shape
    zero_pad = jnp.zeros((B, H, T1, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)  # (B,H,T1,P+1)
    x_padded = x_padded.reshape(B, H, P + 1, T1)
    x = x_padded[:, :, 1:].reshape(B, H, T1, P)
    return x[..., : P // 2 + 1]


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    zero_triu: bool = False
    # use the fused Pallas flash kernel (ops/rel_attention.py) when the mask
    # is a key-prefix padding mask and attention dropout is inactive; falls
    # back to the XLA path otherwise (attn-map sow only exists on fallback)
    use_pallas: bool = False
    # rotated fold (deterministic forwards only): merge content+position
    # scores into ONE matmul via the sinusoid angle-addition identity —
    # see _rot_fold_attend.  The path IGNORES the passed pos_emb values
    # and reconstructs the standard sinusoid table, so only the owner of
    # the positional encoding may enable it (the conformer encoder does:
    # its rel_pos PE is exactly that table; positional dropout in
    # training breaks the identity, so training keeps the fold/rel_shift
    # paths and this one triggers only when deterministic).
    rot_fold: bool = False
    # rot_fold_train extends the fold to TRAINING forwards, replacing the
    # reference's per-(distance, feature) dropout on the positional table
    # (embedding.py:197 — incompatible with the fold: the mask entangles
    # the query/key indices) with an expectation-equal dropout on the
    # rotated position-query u (per (batch, query, head, frequency)) at
    # ``pos_dropout_rate``.  A DOCUMENTED DEVIATION from reference
    # regularization semantics, selected via the encoder's
    # pos_dropout_mode="rotated"; deterministic forwards are exact either
    # way.  Why: the table-dropout semantics force either the O(T²M)
    # skewed table or a per-layer rel-shift on (B,H,T,2T-1) scores — the
    # single largest HBM cost of the training step (13.5 ms/step of pure
    # skew traffic at recipe shapes, tools/roofline.py).
    rot_fold_train: bool = False
    pos_dropout_rate: float = 0.0
    # run the rotated fold through the fused Pallas flash kernel
    # (ops/rot_attention.py): blockwise online softmax, the (B,H,T,T)
    # score tensor never reaches HBM in fwd or bwd.  Shift-free by
    # construction (the fold has no rel-shift).  Applies whenever the
    # fold itself applies AND the mask is a key-prefix padding mask AND
    # attention maps aren't being harvested; falls back to the XLA fold
    # otherwise.
    rot_fold_pallas: bool = False

    def setup(self):
        super().setup()
        self.linear_pos = _PosLinear(self.n_feat, self.n_feat,
                                     dtype=self.dtype, name="linear_pos")
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param("pos_bias_u", init, (self.n_head, self.d_k))
        self.pos_bias_v = self.param("pos_bias_v", init, (self.n_head, self.d_k))
        self.pos_dropout = nn.Dropout(self.pos_dropout_rate)

    def _pallas_ok(self, query, key, pos_emb, mask, deterministic) -> bool:
        if not self.use_pallas or self.zero_triu:
            return False
        if not deterministic and self.dropout_rate > 0:
            return False
        if query.shape[1] != key.shape[1]:
            return False
        if pos_emb.shape[0] != 1 or pos_emb.shape[1] != 2 * query.shape[1] - 1:
            return False
        return mask is None or (mask.ndim == 3 and mask.shape[1] == 1)

    def _pallas_attend(self, query, key, value, pos_emb, mask):
        from lasr_tpu.ops.rel_attention import rel_attention_context
        B, T, _ = query.shape
        H, dk = self.n_head, self.d_k
        q = self.project_q(query)
        k, v = self.project_kv(key, value)
        p = self._split(self.linear_pos(pos_emb))[0]      # (2T-1, H, dk)
        q_u = q + self.pos_bias_u.astype(q.dtype)[None, None]
        q_v = q + self.pos_bias_v.astype(q.dtype)[None, None]

        def bh(x):
            return jnp.moveaxis(x, 2, 1).reshape(B * H, T, dk)

        if mask is None:
            kv_len = jnp.full((B,), T, jnp.int32)
        else:
            # key-prefix padding mask (True = valid); padding is trailing
            kv_len = jnp.sum(mask[:, 0, :], axis=-1).astype(jnp.int32)
        ctx = rel_attention_context(
            bh(q_u), bh(q_v), bh(k), bh(v), jnp.moveaxis(p, 1, 0),
            jnp.repeat(kv_len, H))
        ctx = jnp.moveaxis(ctx.reshape(B, H, T, dk), 1, 2)
        return self.linear_out(ctx.reshape(B, T, self.n_feat))

    def _rot_fold_attend(self, q_u, q_v, k, v, mask, deterministic):
        """Rotated rel-position fold: with the pure sinusoid table,
        ``bd[i,j] = q_v_i · p(i−j)`` decomposes exactly (angle addition)
        as ``u_i · V_j`` where ``u = rot_i(q_v @ W_pos)`` is a per-query
        2×2 rotation per frequency pair — so content and position scores
        merge into ONE matmul over dk+M lanes:

            scores = [q_u ; u] @ [k ; V]^T / sqrt(dk)

        vs the table fold this removes the O(T²·M) skewed table (and its
        length cap), the separate ac/bd matmuls, and the (B,H,T,T) ac+bd
        add.  Valid only when pos_emb is the undropped table
        (deterministic) and unclamped (max_dist is never set here)."""
        B, T = q_u.shape[:2]
        M, H, dk = self.n_feat, self.n_head, self.d_k
        kernel = self.linear_pos.get_kernel()
        kmat = kernel.reshape(M, H, dk).astype(q_v.dtype)
        z = jnp.einsum("bqhd,mhd->bqhm", q_v, kmat)      # (B,T,H,M)
        W, V = _rot_tables(T, M)
        si = jnp.asarray(W[:, 0::2], z.dtype)[None, :, None, :]
        ci = jnp.asarray(W[:, 1::2], z.dtype)[None, :, None, :]
        zs, zc = z[..., 0::2], z[..., 1::2]
        u = jnp.stack([zs * si + zc * ci, zc * si - zs * ci], axis=-1)
        u = u.reshape(z.shape)
        if not deterministic and self.rot_fold_train \
                and self.pos_dropout_rate > 0:
            # rotated-space positional dropout (see rot_fold_train)
            u = self.pos_dropout(u, deterministic=False)
        if (self.rot_fold_pallas
                and (deterministic or self.dropout_rate == 0.0)
                and not self.is_mutable_collection("intermediates")
                and (mask is None
                     or (mask.ndim == 3 and mask.shape[1] == 1))):
            from lasr_tpu.ops.rot_attention import rot_attention_context
            B, T = q_u.shape[:2]
            H, dk = self.n_head, self.d_k

            def bh(x):
                return jnp.moveaxis(x, 2, 1).reshape(B * H, T, x.shape[-1])

            if mask is None:
                kv_len = jnp.full((B,), T, jnp.int32)
            else:
                # key-prefix padding mask (True = valid); padding trails
                kv_len = jnp.sum(mask[:, 0, :], axis=-1).astype(jnp.int32)
            vt = jnp.asarray(V, k.dtype)                 # (T, M) static
            ctx = rot_attention_context(
                bh(q_u), bh(u), bh(k), bh(v), vt, jnp.repeat(kv_len, H))
            ctx = jnp.moveaxis(ctx.reshape(B, H, T, dk), 1, 2)
            return self.linear_out(ctx.reshape(B, T, self.n_feat))
        qcat = jnp.concatenate([q_u, u], axis=-1)        # (B,T,H,dk+M)
        vb = jnp.broadcast_to(jnp.asarray(V, k.dtype)[None, :, None, :],
                              (B, T, H, M))
        kcat = jnp.concatenate([k, vb], axis=-1)
        scores = jnp.einsum("bqhe,bkhe->bhqk", qcat, kcat) \
            / math.sqrt(dk)
        return self._softmax_attend(scores, v, mask, deterministic)

    def __call__(self, query, key, value, pos_emb, mask=None,
                 deterministic: bool = True, pos_table=None):
        """``pos_table``: optional pre-skewed (T, T, M) table from
        ``build_skewed_pos_table(pos_emb)``.  When given (and the shapes are
        the plain self-attention case), the position score is computed as
        ``(q_v @ W_pos)[b,h,i,:] · pos_table[i,j,:]`` — mathematically the
        same rel-shift contraction, but the shift lives on the shared
        gradient-free table, so no (B, H, T, 2T-1) tensor, pad, or relayout
        reshape is ever materialized (per layer, fwd or bwd).  On TPU this
        removes the dominant data-formatting cost of rel-pos attention.
        """
        if self._pallas_ok(query, key, pos_emb, mask, deterministic):
            return self._pallas_attend(query, key, value, pos_emb, mask)
        q = self.project_q(query)                       # (B, T1, H, dk)
        k, v = self.project_kv(key, value)              # (B, T2, H, dk)

        q_u = q + self.pos_bias_u.astype(q.dtype)[None, None]
        q_v = q + self.pos_bias_v.astype(q.dtype)[None, None]
        T1, T2 = q.shape[1], k.shape[1]
        if (self.rot_fold and (deterministic or self.rot_fold_train)
                and not self.zero_triu
                and T1 == T2 and pos_emb is not None
                and pos_emb.shape[0] == 1
                and pos_emb.shape[1] == 2 * T1 - 1):
            return self._rot_fold_attend(q_u, q_v, k, v, mask,
                                         deterministic)
        # content score (matrix a+c) and position score (matrix b+d)
        if (pos_table is not None and not self.zero_triu and T1 == T2
                and pos_table.shape[0] == T1):
            kernel = self.linear_pos.get_kernel()       # (M, n_feat)
            kmat = kernel.reshape(kernel.shape[0], self.n_head, self.d_k)
            if self.remat_attend >= 2 and self._remat_ok(deterministic):
                # checkpoint the whole score interior: level 2 saves only
                # q/k/v-sized tensors and the (shared, layer-invariant)
                # pos_table — no (B,H,T,T) tensor survives the forward, so
                # none is spilled or relayouted; level 3 additionally keeps
                # the named softmax output (see _remat_policy)
                m = mask
                if m is not None:
                    while m.ndim < 4:
                        m = m[:, None] if m.ndim == 3 else m[None]
                core = jax.checkpoint(
                    _rel_fold_ctx, static_argnums=(7, 8),
                    policy=_remat_policy(self.remat_attend))
                x = core(q_u, q_v, k, v, kmat.astype(q_v.dtype),
                         pos_table.astype(q_v.dtype), m,
                         _mask_min(q_v.dtype), self.d_k)
                B, T = x.shape[:2]
                return self.linear_out(x.reshape(B, T, self.n_feat))
            matrix_ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
            z = jnp.einsum("bqhd,mhd->bhqm", q_v, kmat.astype(q_v.dtype))
            matrix_bd = jnp.einsum("bhqm,qkm->bhqk", z,
                                   pos_table.astype(z.dtype))
            scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
            return self._softmax_attend(scores, v, mask, deterministic)
        matrix_ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
        p = self._split(self.linear_pos(pos_emb))       # (1|B, 2T-1, H, dk)
        if p.shape[0] == 1:
            # shared pos table: contract without materializing a per-batch
            # copy (the table is (1, 2T-1, H, dk))
            matrix_bd = jnp.einsum("bqhd,phd->bhqp", q_v, p[0])
        else:
            matrix_bd = jnp.einsum("bqhd,bphd->bhqp", q_v, p)
        matrix_bd = rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd[..., : k.shape[1]]) / math.sqrt(self.d_k)
        if self.zero_triu:
            T1, T2 = scores.shape[2], scores.shape[3]
            tri = jnp.tril(jnp.ones((T1, T2), dtype=bool), T2 - T1)
            scores = jnp.where(tri[None, None], scores, 0.0)
        return self._softmax_attend(scores, v, mask, deterministic)


def safe_exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive cumprod computed as exp∘cumsum∘log for stability
    (reference attention.py:205-222); first element along axis is 1."""
    tiny = float(jnp.finfo(x.dtype).tiny)
    logs = jnp.log(jnp.clip(x, tiny, 1.0))
    csum = jnp.cumsum(logs, axis=axis)
    head = [slice(None)] * x.ndim
    head[axis] = slice(0, 1)
    rest = [slice(None)] * x.ndim
    rest[axis] = slice(0, -1)
    ones = jnp.ones_like(x[tuple(head)])
    return jnp.concatenate([ones, jnp.exp(csum)[tuple(rest)]], axis=axis)


class MTMultiHeadedAttention(MultiHeadedAttention):
    """Monotonic truncated attention for streaming decoders."""

    bias_init: float = 0.0
    sigmoid_noise: float = 1.0

    def setup(self):
        super().setup()
        self.src_att_bias = self.param(
            "src_att_bias",
            lambda key, shape: jnp.full(shape, self.bias_init, jnp.float32),
            (1, 1))

    def _choose_probs(self, scores, mask, noise_key=None):
        if noise_key is not None and self.sigmoid_noise > 0:
            scores = scores + self.sigmoid_noise * jax.random.normal(
                noise_key, scores.shape, scores.dtype)
        if mask is not None:
            while mask.ndim < scores.ndim:
                mask = mask[:, None] if mask.ndim == 3 else mask[None]
            scores = jnp.where(mask, scores, _mask_min(scores.dtype))
            p = jax.nn.sigmoid(scores)
            p = jnp.where(mask, p, 0.0)
        else:
            p = jax.nn.sigmoid(scores)
        return p

    def __call__(self, query, key, value, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        q = self.project_q(query)
        k, v = self.project_kv(key, value)
        scores = (jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
                  + self.src_att_bias.astype(q.dtype))
        noise_key = None
        if not deterministic and self.sigmoid_noise > 0:
            noise_key = self.make_rng("dropout")
        p_choose = self._choose_probs(scores, mask, noise_key)
        survive = safe_exclusive_cumprod(1.0 - p_choose, axis=-1)
        attn = p_choose * survive
        self.sow("intermediates", "attn", attn)
        p_attn = self.attn_dropout(attn, deterministic=deterministic)
        x = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
        B, T1 = x.shape[:2]
        out = self.linear_out(x.reshape(B, T1, self.n_feat))
        if return_attn:
            return out, attn
        return out

    def attend_monotonic(self, q, k, v, mask=None):
        """Deterministic monotonic attention over precomputed K/V (the
        reference's forward_one_step_offline path, decoder.py:298-326)."""
        scores = (jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
                  + self.src_att_bias.astype(q.dtype))
        p = self._choose_probs(scores, mask, None)
        attn = p * safe_exclusive_cumprod(1.0 - p, axis=-1)
        x = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        B, T1 = x.shape[:2]
        return self.linear_out(x.reshape(B, T1, self.n_feat))

    def decode_scores(self, q, k, mask=None):
        """Per-head monotonic choose-scores for one decode query.

        q: (B, 1, H, dk); k: (B, T2, H, dk); mask: optional (B, T2) key
        validity.  Returns (B, H, T2) scores (masked keys at -inf)."""
        scores = (jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
                  + self.src_att_bias.astype(q.dtype))
        s = scores[:, :, 0, :]
        if mask is not None:
            s = jnp.where(mask[:, None, :], s, _mask_min(s.dtype))
        return s

    def decode_context(self, s, v, endpoint):
        """Monotonic context from precomputed scores and (already advanced)
        endpoints: sigmoid-survival weights truncated past the endpoint
        (online_transformer/attention.py:106-119).  s: (B, H, T2);
        v: (B, T2, H, dk); endpoint: (B, H).  Returns (B, 1, n_feat)."""
        T2 = s.shape[-1]
        pos = jnp.arange(T2)
        p = jax.nn.sigmoid(s)
        attn = p * safe_exclusive_cumprod(1.0 - p, axis=-1)
        attn = jnp.where(pos[None, None, :] <= endpoint[..., None], attn, 0.0)
        x = jnp.einsum("bhk,bkhd->bhd", attn, v)
        B = x.shape[0]
        return self.linear_out(x.reshape(B, 1, self.n_feat))

    @staticmethod
    def advance_endpoint(s, endpoint):
        """Reference endpoint advance (attention.py:112-116): the first
        position > endpoint with score > 0, else unchanged.  s: (..., T2);
        endpoint: (...,) broadcastable to s's leading dims.

        Returns (new_endpoint, advanced) — ``advanced`` reports whether a
        candidate position existed.  Incremental streaming search uses
        ``~advanced`` as a pause signal: with only a prefix of the memory
        visible (later keys masked), a failed advance is indistinguishable
        from "the advance position hasn't arrived yet", so the search must
        wait for more frames to stay exactly equal to the full search."""
        T2 = s.shape[-1]
        pos = jnp.arange(T2)
        beyond = pos > endpoint[..., None]
        cand = beyond & (s > 0)
        first = jnp.argmax(cand, axis=-1)
        has = jnp.any(cand, axis=-1)
        return jnp.where(has, first, endpoint), has

    def decode_attend(self, q, k, v, endpoint, mask=None):
        """Single-step monotonic decode with per-head endpoint advance.

        q: (B, 1, H, dk); k/v: (B, T2, H, dk); endpoint: (B, H) int32 last
        committed source positions.  Vectorized form of the reference's
        per-head python scan (online_transformer/attention.py:92-123): the
        new endpoint is the first position > endpoint with score > 0 (or the
        old endpoint if none), and attention mass past it is truncated.
        ``mask``: optional (B, T2) key validity — the reference decodes solo
        (its memory has no batch-padding rows), so batched decode restricts
        endpoint candidates and choose-probs to the row's own frames.
        Returns (context (B, 1, n_feat), new endpoint (B, H)).
        """
        scores = (jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.d_k)
                  + self.src_att_bias.astype(q.dtype))       # (B, H, 1, T2)
        s = scores[:, :, 0, :]                                # (B, H, T2)
        T2 = s.shape[-1]
        pos = jnp.arange(T2)
        if mask is not None:
            s = jnp.where(mask[:, None, :], s, _mask_min(s.dtype))
        beyond = pos[None, None, :] > endpoint[..., None]
        cand = beyond & (s > 0)
        first = jnp.argmax(cand, axis=-1)                     # 0 if none
        has = jnp.any(cand, axis=-1)
        new_ep = jnp.where(has, first, endpoint)
        p = jax.nn.sigmoid(s)
        attn = p * safe_exclusive_cumprod(1.0 - p, axis=-1)
        attn = jnp.where(pos[None, None, :] <= new_ep[..., None], attn, 0.0)
        x = jnp.einsum("bhk,bkhd->bhd", attn, v)
        B = x.shape[0]
        return self.linear_out(x.reshape(B, 1, self.n_feat)), new_ep
