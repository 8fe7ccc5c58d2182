"""Fused rotated-fold rel-pos attention — Pallas TPU kernel.

The rotated fold (modules/attention.py `_rot_fold_attend`) turns
Transformer-XL relative-position scoring into two plain matmuls with NO
rel-shift: ``scores[i,j] = q_u[i]·k[j] + u[i]·V[j]`` where ``u`` is the
per-query rotated position-query (computed outside, carries the
linear_pos gradient) and ``V`` is the STATIC swapped-sinusoid table.
This kernel runs that scoring flash-attention style — blockwise over
(q, k) tiles with an online softmax — so the (B, H, T, T) score tensor
never touches HBM, in the forward or the backward.

Contrast with ops/rel_attention.py (the table-semantics kernel): no
per-tile barrel-shift rolls (the rel-shift is algebraically gone), no
positional-table gradient scatter (V is a constant; the position
gradient flows through ``du``), and the position matmul contracts over
the full M=320 lanes instead of dk=40.

Valid exactly when the rotated fold is valid: deterministic forwards
always; training forwards under pos_dropout_mode="rotated" (u arrives
pre-dropped).  Reference semantics context: attention.py:117-203,
embedding.py:131-197 of /root/reference/lasr/modules/net/transformer/.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(kvlen_ref, qu_ref, u_ref, k_ref, v_ref, vt_ref,
                o_ref, lse_ref, *, BQ, BK, dk, n_kblocks):
    iq = pl.program_id(1)
    kvlen = kvlen_ref[pl.program_id(0), 0]

    qu = qu_ref[0, :, :]              # (BQ, dkp)
    uu = u_ref[0, :, :]               # (BQ, M)
    scale = 1.0 / math.sqrt(dk)

    m = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((BQ, 1), jnp.float32)
    acc = jnp.zeros((BQ, qu.shape[-1]), jnp.float32)

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(jk * BK, BK), :]          # (BK, dkp)
        v_blk = v_ref[0, pl.ds(jk * BK, BK), :]
        vt_blk = vt_ref[0, pl.ds(jk * BK, BK), :]        # (BK, M)
        ac = jax.lax.dot_general(
            qu, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)
        bd = jax.lax.dot_general(
            uu, vt_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)
        s = (ac + bd) * scale
        j_idx = jk * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        s = jnp.where(j_idx < kvlen, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        prob = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(prob, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            prob.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kblocks, body, (m, l, acc))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, :, :] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0, pl.ds(iq * BQ, BQ)] = (m + jnp.log(l_safe))[:, 0]


@functools.partial(jax.jit, static_argnames=("BQ", "interpret"))
def _rot_attention_pallas(q_u, u, k, v, vt, kv_len, BQ: int = 128,
                          interpret: bool = False):
    """q_u/k/v: (BH, T, dk); u: (BH, T, M) rotated position-query;
    vt: (T, M) static swapped-sinusoid table (shared across BH);
    kv_len: (BH,) int32.  Returns (out (BH, T, dk), lse (BH, T) f32)."""
    BH, T, dk = q_u.shape
    M = u.shape[-1]
    BK = BQ
    Tp = _round_up(T, BQ)
    dkp = _round_up(dk, 128)
    Mp = _round_up(M, 128)

    def pad3(x, T_to, d_to):
        return jnp.pad(x, ((0, 0), (0, T_to - x.shape[1]),
                           (0, d_to - x.shape[2])))

    qu_p = pad3(q_u, Tp, dkp)
    u_p = pad3(u, Tp, Mp)
    k_p = pad3(k, Tp, dkp)
    v_p = pad3(v, Tp, dkp)
    vt_p = jnp.pad(vt, ((0, Tp - T), (0, Mp - M)))[None]

    n_q = Tp // BQ
    n_k = Tp // BK

    grid = (BH, n_q)
    kernel = functools.partial(_fwd_kernel, BQ=BQ, BK=BK, dk=dk,
                               n_kblocks=n_k)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BH, 1), lambda bh, iq: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BQ, dkp), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, BQ, Mp), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, Tp, dkp), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, Tp, dkp), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, Tp, Mp), lambda bh, iq: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, dkp), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, 1, Tp), lambda bh, iq: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dkp), q_u.dtype),
            jax.ShapeDtypeStruct((BH, 1, Tp), jnp.float32),
        ],
        # bh blocks are independent -> megacore-parallel; iq stays
        # arbitrary (the lse row block is revisited across iq).
        # allow_input_fusion folds the 40->128 lane pads of the per-block
        # streamed q/u inputs into the input pipeline; fusing the FULL-T
        # k/v pads trips an XLA allocation-remat RET_CHECK
        # (llo_allocation_rematerialization.cc:134 — same reason the
        # rel_attention kernel fuses only its q inputs), so those pads
        # materialize in HBM.
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            allow_input_fusion=[False, True, True, False, False, False]),
        interpret=interpret,
    )(kv_len[:, None].astype(jnp.int32), qu_p, u_p, k_p, v_p, vt_p)
    return out[:, :T, :dk], lse[:, 0, :T]


def _bwd_kernel(kvlen_ref, qu_ref, u_ref, k_ref, v_ref, vt_ref, do_ref,
                lse_ref, delta_ref,
                dqu_ref, du_ref, dk_ref, dv_ref,
                *, BQ, BK, dk, n_kblocks):
    iq = pl.program_id(1)
    kvlen = kvlen_ref[pl.program_id(0), 0]
    scale = 1.0 / math.sqrt(dk)

    qu = qu_ref[0, :, :]
    uu = u_ref[0, :, :]
    do = do_ref[0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(iq * BQ, BQ)][:, None]
    delta = delta_ref[0, 0, pl.ds(iq * BQ, BQ)][:, None]

    @pl.when(iq == 0)
    def _():
        dk_ref[0, :, :] = jnp.zeros(dk_ref.shape[1:], dk_ref.dtype)
        dv_ref[0, :, :] = jnp.zeros(dv_ref.shape[1:], dv_ref.dtype)

    dqu_acc = jnp.zeros(qu.shape, jnp.float32)
    du_acc = jnp.zeros(uu.shape, jnp.float32)

    def body(jk, carry):
        dqu_acc, du_acc = carry
        k_blk = k_ref[0, pl.ds(jk * BK, BK), :]
        v_blk = v_ref[0, pl.ds(jk * BK, BK), :]
        vt_blk = vt_ref[0, pl.ds(jk * BK, BK), :]

        ac = jax.lax.dot_general(qu, k_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        bd = jax.lax.dot_general(uu, vt_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s = (ac + bd) * scale
        j_idx = jk * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        s = jnp.where(j_idx < kvlen, s, NEG_INF)
        prob = jnp.exp(s - lse)                        # true softmax probs

        probc = prob.astype(do.dtype)
        dv_ref[0, pl.ds(jk * BK, BK), :] += jax.lax.dot_general(
            probc, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        dp_attn = jax.lax.dot_general(
            do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BQ, BK)
        dz = prob * (dp_attn - delta) * scale          # d/d(ac+bd)
        dzc = dz.astype(qu.dtype)

        dqu_acc = dqu_acc + jax.lax.dot_general(
            dzc, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        du_acc = du_acc + jax.lax.dot_general(
            dzc, vt_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, pl.ds(jk * BK, BK), :] += jax.lax.dot_general(
            dzc, qu, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        return dqu_acc, du_acc

    dqu_acc, du_acc = jax.lax.fori_loop(0, n_kblocks, body,
                                        (dqu_acc, du_acc))
    dqu_ref[0, :, :] = dqu_acc.astype(dqu_ref.dtype)
    du_ref[0, :, :] = du_acc.astype(du_ref.dtype)


@functools.partial(jax.jit, static_argnames=("BQ", "interpret"))
def _rot_attention_pallas_bwd(q_u, u, k, v, vt, kv_len, out, lse, dout,
                              BQ: int = 128, interpret: bool = False):
    BH, T, dk = q_u.shape
    M = u.shape[-1]
    BK = BQ
    Tp = _round_up(T, BQ)
    dkp = _round_up(dk, 128)
    Mp = _round_up(M, 128)

    def pad3(x, T_to, d_to):
        return jnp.pad(x, ((0, 0), (0, T_to - x.shape[1]),
                           (0, d_to - x.shape[2])))

    qu_p = pad3(q_u, Tp, dkp)
    u_p = pad3(u, Tp, Mp)
    k_p = pad3(k, Tp, dkp)
    v_p = pad3(v, Tp, dkp)
    do_p = pad3(dout, Tp, dkp)
    vt_p = jnp.pad(vt, ((0, Tp - T), (0, Mp - M)))[None]
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    lse_p = jnp.pad(lse, ((0, 0), (0, Tp - T)))[:, None, :]
    delta_p = jnp.pad(delta, ((0, 0), (0, Tp - T)))[:, None, :]

    n_q = Tp // BQ
    n_k = Tp // BK
    grid = (BH, n_q)
    kernel = functools.partial(_bwd_kernel, BQ=BQ, BK=BK, dk=dk,
                               n_kblocks=n_k)

    blk_q = pl.BlockSpec((1, BQ, dkp), lambda bh, iq: (bh, iq, 0))
    blk_qM = pl.BlockSpec((1, BQ, Mp), lambda bh, iq: (bh, iq, 0))
    blk_full = pl.BlockSpec((1, Tp, dkp), lambda bh, iq: (bh, 0, 0))
    blk_row = pl.BlockSpec((1, 1, Tp), lambda bh, iq: (bh, 0, 0))

    dqu, du, dk_, dv_ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BH, 1), lambda bh, iq: (0, 0),
                         memory_space=pltpu.SMEM),
            blk_q, blk_qM, blk_full, blk_full,
            pl.BlockSpec((1, Tp, Mp), lambda bh, iq: (0, 0, 0)),
            blk_q, blk_row, blk_row,
        ],
        out_specs=[blk_q, blk_qM, blk_full, blk_full],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dkp), q_u.dtype),
            jax.ShapeDtypeStruct((BH, Tp, Mp), u.dtype),
            jax.ShapeDtypeStruct((BH, Tp, dkp), q_u.dtype),
            jax.ShapeDtypeStruct((BH, Tp, dkp), q_u.dtype),
        ],
        # bh is parallel-safe; dk/dv blocks accumulate across iq so iq
        # must stay sequential.  Input fusion: per-block q/u/do only (see
        # the forward's note).
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            allow_input_fusion=[False, True, True, False, False, False,
                                True, False, False]),
        interpret=interpret,
    )(kv_len[:, None].astype(jnp.int32), qu_p, u_p, k_p, v_p, vt_p,
      do_p, lse_p, delta_p)

    return (dqu[:, :T, :dk], du[:, :T, :M],
            dk_[:, :T, :dk], dv_[:, :T, :dk])


def _auto_interpret() -> bool:
    # pallas compiled mode needs a real TPU; CPU (tests, virtual meshes)
    # runs the interpreter
    return jax.default_backend() == "cpu"


@jax.custom_vjp
def rot_attention_context(q_u, u, k, v, vt, kv_len):
    """Fused rotated-fold attention context (BH, T, dk).

    q_u: query + pos_bias_u (bh = b*H + h major); u: rotated
    position-query (q_v-side, already carrying any rotated-space
    positional dropout); k/v: keys/values; vt: static swapped-sinusoid
    table (T, M) — no gradient; kv_len: (BH,) valid key counts.
    """
    out, _ = _rot_attention_pallas(q_u, u, k, v, vt, kv_len,
                                   interpret=_auto_interpret())
    return out


def _fwd(q_u, u, k, v, vt, kv_len):
    out, lse = _rot_attention_pallas(q_u, u, k, v, vt, kv_len,
                                     interpret=_auto_interpret())
    return out, (q_u, u, k, v, vt, kv_len, out, lse)


def _bwd(residuals, g):
    q_u, u, k, v, vt, kv_len, out, lse = residuals
    dqu, du, dk_, dv_ = _rot_attention_pallas_bwd(
        q_u, u, k, v, vt, kv_len, out, lse, g.astype(q_u.dtype),
        interpret=_auto_interpret())
    return dqu, du, dk_, dv_, None, None


rot_attention_context.defvjp(_fwd, _bwd)


def _xla_reference(q_u, u, k, v, vt, kv_len):
    """Blockless XLA reference of the same math (tests)."""
    BH, T, dk = q_u.shape
    s = (jnp.einsum("bqd,bkd->bqk", q_u, k,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("bqm,km->bqk", u, vt,
                      preferred_element_type=jnp.float32)) / math.sqrt(dk)
    mask = jnp.arange(T)[None, None, :] < kv_len[:, None, None]
    s = jnp.where(mask, s, NEG_INF)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", a, v.astype(jnp.float32)
                      ).astype(q_u.dtype)
