"""Fused relative-position multi-head attention — Pallas TPU kernel.

The conformer recipe's rel-pos attention is the hottest op in the model and
the XLA path pays for it dearly: scoring materializes a (B, H, T, 2T-1)
position-score tensor plus several full-size copies for the rel-shift
(profiled at 2.5x the cost of absolute attention, tools/profile_ab.py).
This kernel computes

    softmax_j[ (q_u·k_j + q_v·p_{T-1-i+j}) / sqrt(dk) + mask ] @ v

flash-attention style: blockwise over (q, k) tiles with an online softmax,
never materializing the score matrix.  The position term uses the classic
rel-shift reshape trick — but on a (BQ, 2BQ) VMEM tile instead of the full
(T, 2T-1) HBM tensor.

Forward only; the backward pass runs through the same math via
``jax.custom_vjp`` with a blockwise XLA recompute (see
``rel_attention_context``).  Layout notes: dk pads to 128 lanes, T to BQ
sublanes; the p table is pre-padded so every block's window slice is
in-bounds.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _roll_lanes(y, shift: int):
    """Circular roll along the last (lane) axis by a static amount; uses the
    TPU-native permute in compiled mode and jnp.roll in the interpreter."""
    try:
        return pltpu.roll(y, shift, 1)
    except Exception:  # pragma: no cover - interpreter fallback
        return jnp.roll(y, shift, axis=1)


def _block_rel_shift(w, BQ: int, BK: int):
    """w: (BQ, 2BQ) with w[ii, r] = q_v[ii]·p[r0+r]; returns (BQ, BK)
    bd[ii, jj] = w[ii, (BQ-1) - ii + jj].

    Implemented as a barrel shifter — log2(BQ) conditional circular rolls —
    because Mosaic does not lower the classic odd-width pad-reshape trick.
    Row ii needs a LEFT roll by s = BQ-1-ii; for the kept region
    (jj < BK, s < BQ) the roll never wraps, so circular == linear.
    """
    assert BQ == BK
    n = w.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (BQ, n), 0)
    shift = (BQ - 1) - row
    y = w
    b = 1
    while b < BQ:
        rolled = _roll_lanes(y, n - b)          # left-roll by b
        y = jnp.where((shift & b) != 0, rolled, y)
        b *= 2
    return y[:, :BK]


def _fwd_kernel(kvlen_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref,
                o_ref, lse_ref, *, BQ, BK, T, Tp, dk, n_kblocks, p_off):
    iq = pl.program_id(1)
    kvlen = kvlen_ref[pl.program_id(0), 0]

    qu = qu_ref[0, :, :]              # (BQ, dkp)
    qv = qv_ref[0, :, :]
    scale = 1.0 / math.sqrt(dk)

    m = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((BQ, 1), jnp.float32)
    acc = jnp.zeros((BQ, qu.shape[-1]), jnp.float32)

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(jk * BK, BK), :]          # (BK, dkp)
        v_blk = v_ref[0, pl.ds(jk * BK, BK), :]
        ac = jax.lax.dot_general(
            qu, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)

        # p window: rel index for (ii, jj) is r0 + (BQ-1) - ii + jj with
        # r0 = T-1 - iq*BQ - (BQ-1) + jk*BK; p_ref is pre-padded by p_off,
        # which is chosen so r0 is always a multiple of 8 (Mosaic sublane
        # alignment for dynamic vector loads)
        r0 = pl.multiple_of((T - 1) - iq * BQ - (BQ - 1) + jk * BK + p_off, 8)
        p_win = p_ref[0, pl.ds(r0, BQ + BK), :]          # (2BQ, dkp)
        w = jax.lax.dot_general(
            qv, p_win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, 2BQ)
        bd = _block_rel_shift(w, BQ, BK)

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


@functools.partial(jax.jit, static_argnames=("H", "BQ", "interpret"))
def _rel_attention_pallas(q_u, q_v, k, v, p, kv_len, H: int, BQ: int = 128,
                          interpret: bool = False):
    """q_u/q_v/k/v: (BH, T, dk) head-major (bh = b*H + h); p: (H, 2T-1, dk)
    shared across the batch (indexed by bh % H in the block map — no
    per-batch copy); kv_len: (BH,) int32.
    Returns (out (BH, T, dk), lse (BH, T) f32)."""
    BH, T, dk = q_u.shape
    BK = BQ
    Tp = _round_up(T, BQ)
    dkp = _round_up(dk, 128)
    P = p.shape[1]
    # left pad so window starts are non-negative AND r0 = (T-BQ+p_off) +
    # 128*(jk-iq) stays a multiple of 8 for Mosaic's alignment analysis
    p_off = BQ + (-(T - BQ)) % 8
    Pp = _round_up(p_off + P + 2 * BQ, 128)

    def pad3(x, T_to, d_to):
        return jnp.pad(x, ((0, 0), (0, T_to - x.shape[1]),
                           (0, d_to - x.shape[2])))

    qu_p = pad3(q_u, Tp, dkp)
    qv_p = pad3(q_v, Tp, dkp)
    k_p = pad3(k, Tp, dkp)
    v_p = pad3(v, Tp, dkp)
    p_p = jnp.pad(p, ((0, 0), (p_off, Pp - p_off - P), (0, dkp - dk)))

    n_q = Tp // BQ
    n_k = Tp // BK

    grid = (BH, n_q)
    kernel = functools.partial(
        _fwd_kernel, BQ=BQ, BK=BK, T=T, Tp=Tp, dk=dk, n_kblocks=n_k,
        p_off=p_off)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BH, 1), lambda bh, iq: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BQ, dkp), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, BQ, dkp), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, Tp, dkp), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, Tp, dkp), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, Pp, dkp), lambda bh, iq: (bh % H, 0, 0)),
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
        # arbitrary (the lse row block is revisited across iq)
        # allow_input_fusion folds the 40->128 lane pads (and their
        # producers) into the kernel's input pipeline instead of
        # materializing 3.2x-oversized copies in HBM
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            allow_input_fusion=[False, True, True, False, False, False]),
        interpret=interpret,
    )(kv_len[:, None].astype(jnp.int32), qu_p, qv_p, k_p, v_p, p_p)
    return out[:, :T, :dk], lse[:, 0, :T]


def _inverse_block_rel_shift(ds, BQ: int, BK: int):
    """Scatter dS (BQ, BK) back to dW (BQ, 2BQ): dW[ii, (BQ-1)-ii+jj] =
    dS[ii, jj], zeros elsewhere — the transpose of ``_block_rel_shift``:
    a barrel shifter rolling each row RIGHT by s = BQ-1-ii."""
    assert BQ == BK
    n = 2 * BQ
    z = jnp.pad(ds, ((0, 0), (0, n - BK)))            # (BQ, 2BQ)
    row = jax.lax.broadcasted_iota(jnp.int32, (BQ, n), 0)
    shift = (BQ - 1) - row
    y = z
    b = 1
    while b < BQ:
        rolled = _roll_lanes(y, b)                    # right-roll by b
        y = jnp.where((shift & b) != 0, rolled, y)
        b *= 2
    return y


def _bwd_kernel(kvlen_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, do_ref,
                lse_ref, delta_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref,
                *, BQ, BK, T, Tp, dk, n_kblocks, p_off):
    iq = pl.program_id(1)
    kvlen = kvlen_ref[pl.program_id(0), 0]
    scale = 1.0 / math.sqrt(dk)

    qu = qu_ref[0, :, :]
    qv = qv_ref[0, :, :]
    do = do_ref[0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(iq * BQ, BQ)][:, None]
    delta = delta_ref[0, 0, pl.ds(iq * BQ, BQ)][:, None]

    @pl.when(iq == 0)
    def _():
        dk_ref[0, :, :] = jnp.zeros(dk_ref.shape[1:], dk_ref.dtype)
        dv_ref[0, :, :] = jnp.zeros(dv_ref.shape[1:], dv_ref.dtype)
        dp_ref[0, :, :] = jnp.zeros(dp_ref.shape[1:], dp_ref.dtype)

    dqu_acc = jnp.zeros(qu.shape, jnp.float32)
    dqv_acc = jnp.zeros(qv.shape, jnp.float32)

    def body(jk, carry):
        dqu_acc, dqv_acc = carry
        k_blk = k_ref[0, pl.ds(jk * BK, BK), :]
        v_blk = v_ref[0, pl.ds(jk * BK, BK), :]
        r0 = pl.multiple_of(
            (T - 1) - iq * BQ - (BQ - 1) + jk * BK + p_off, 8)
        p_win = p_ref[0, pl.ds(r0, BQ + BK), :]

        ac = jax.lax.dot_general(qu, k_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        w = jax.lax.dot_general(qv, p_win, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = (ac + _block_rel_shift(w, BQ, BK)) * scale
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

        dqu_acc = dqu_acc + jax.lax.dot_general(
            dz, k_blk.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, pl.ds(jk * BK, BK), :] += jax.lax.dot_general(
            dz, qu.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)

        dw = _inverse_block_rel_shift(dz, BQ, BK)      # (BQ, 2BQ)
        dqv_acc = dqv_acc + jax.lax.dot_general(
            dw, p_win.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_ref[0, pl.ds(r0, BQ + BK), :] += jax.lax.dot_general(
            dw, qv.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dp_ref.dtype)
        return dqu_acc, dqv_acc

    dqu_acc, dqv_acc = jax.lax.fori_loop(0, n_kblocks, body,
                                         (dqu_acc, dqv_acc))
    dqu_ref[0, :, :] = dqu_acc.astype(dqu_ref.dtype)
    dqv_ref[0, :, :] = dqv_acc.astype(dqv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "BQ", "interpret"))
def _rel_attention_pallas_bwd(q_u, q_v, k, v, p, kv_len, out, lse, dout,
                              H: int, BQ: int = 128,
                              interpret: bool = False):
    BH, T, dk = q_u.shape
    BK = BQ
    Tp = _round_up(T, BQ)
    dkp = _round_up(dk, 128)
    P = p.shape[1]
    p_off = BQ + (-(T - BQ)) % 8
    Pp = _round_up(p_off + P + 2 * BQ, 128)

    def pad3(x, T_to, d_to):
        return jnp.pad(x, ((0, 0), (0, T_to - x.shape[1]),
                           (0, d_to - x.shape[2])))

    qu_p = pad3(q_u, Tp, dkp)
    qv_p = pad3(q_v, Tp, dkp)
    k_p = pad3(k, Tp, dkp)
    v_p = pad3(v, Tp, dkp)
    do_p = pad3(dout, Tp, dkp)
    p_p = jnp.pad(p, ((0, 0), (p_off, Pp - p_off - P), (0, dkp - dk)))
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    lse_p = jnp.pad(lse, ((0, 0), (0, Tp - T)))[:, None, :]
    delta_p = jnp.pad(delta, ((0, 0), (0, Tp - T)))[:, None, :]

    n_q = Tp // BQ
    n_k = Tp // BK
    grid = (BH, n_q)
    kernel = functools.partial(
        _bwd_kernel, BQ=BQ, BK=BK, T=T, Tp=Tp, dk=dk, n_kblocks=n_k,
        p_off=p_off)

    blk_q = pl.BlockSpec((1, BQ, dkp), lambda bh, iq: (bh, iq, 0))
    blk_full = pl.BlockSpec((1, Tp, dkp), lambda bh, iq: (bh, 0, 0))
    blk_row = pl.BlockSpec((1, 1, Tp), lambda bh, iq: (bh, 0, 0))

    dqu, dqv, dk_, dv_, dp_ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BH, 1), lambda bh, iq: (0, 0),
                         memory_space=pltpu.SMEM),
            blk_q, blk_q, blk_full, blk_full,
            pl.BlockSpec((1, Pp, dkp), lambda bh, iq: (bh % H, 0, 0)),
            blk_q, blk_row, blk_row,
        ],
        out_specs=[
            blk_q, blk_q, blk_full, blk_full,
            pl.BlockSpec((1, Pp, dkp), lambda bh, iq: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dkp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, dkp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, dkp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, dkp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Pp, dkp), jnp.float32),
        ],
        # bh is parallel-safe; dk/dv/dp blocks accumulate across iq so
        # iq must stay sequential
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            allow_input_fusion=[False, True, True, False, False, False, True, False, False]),
        interpret=interpret,
    )(kv_len[:, None].astype(jnp.int32), qu_p, qv_p, k_p, v_p, p_p,
      do_p, lse_p, delta_p)

    dt = q_u.dtype
    dqu = dqu[:, :T, :dk].astype(dt)
    dqv = dqv[:, :T, :dk].astype(dt)
    dk_ = dk_[:, :T, :dk].astype(dt)
    dv_ = dv_[:, :T, :dk].astype(dt)
    # fold the per-bh p gradients back to per-head and strip padding
    dp_ = dp_.reshape(BH // H, H, Pp, dkp).sum(axis=0)
    dp_ = dp_[:, p_off: p_off + P, :dk].astype(p.dtype)
    return dqu, dqv, dk_, dv_, dp_


def _xla_reference(q_u, q_v, k, v, p, kv_len):
    """Blockless XLA reference of the same math (for tests + backward).
    p: (H, 2T-1, dk) tiled to BH rows here."""
    BH, T, dk = q_u.shape
    H = p.shape[0]
    p = jnp.tile(p, (BH // H, 1, 1))
    ac = jnp.einsum("bqd,bkd->bqk", q_u, k,
                    preferred_element_type=jnp.float32)
    w = jnp.einsum("bqd,bpd->bqp", q_v, p,
                   preferred_element_type=jnp.float32)  # (BH, T, 2T-1)
    # rel shift: keep w[i, T-1-i+j]
    zero = jnp.zeros((BH, T, 1), w.dtype)
    wp = jnp.concatenate([zero, w], axis=-1).reshape(BH, 2 * T, T)
    bd = wp[:, 1:].reshape(BH, T, 2 * T - 1)[..., :T]
    s = (ac + bd) / math.sqrt(dk)
    mask = jnp.arange(T)[None, None, :] < kv_len[:, None, None]
    s = jnp.where(mask, s, NEG_INF)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", a, v.astype(jnp.float32)
                      ).astype(q_u.dtype)


def _auto_interpret() -> bool:
    # pallas compiled mode needs a real TPU; CPU (tests, virtual meshes)
    # runs the interpreter
    return jax.default_backend() == "cpu"


@jax.custom_vjp
def rel_attention_context(q_u, q_v, k, v, p, kv_len):
    """Fused rel-pos attention context (BH, T, dk).

    q_u/q_v: query + u/v position biases (bh = b*H + h major); k/v:
    keys/values; p: per-head projected positional table (H, 2T-1, dk) —
    positive distances first (the RelPositionalEncoding layout);
    kv_len: (BH,) valid key counts.
    """
    out, _ = _rel_attention_pallas(q_u, q_v, k, v, p, kv_len, H=p.shape[0],
                                   interpret=_auto_interpret())
    return out


def _fwd(q_u, q_v, k, v, p, kv_len):
    out, lse = _rel_attention_pallas(q_u, q_v, k, v, p, kv_len, H=p.shape[0],
                                     interpret=_auto_interpret())
    return out, (q_u, q_v, k, v, p, kv_len, out, lse)


def _bwd(residuals, g):
    q_u, q_v, k, v, p, kv_len, out, lse = residuals
    dq_u, dq_v, dk_, dv_, dp_ = _rel_attention_pallas_bwd(
        q_u, q_v, k, v, p, kv_len, out, lse, g.astype(q_u.dtype),
        H=p.shape[0], interpret=_auto_interpret())
    return dq_u, dq_v, dk_, dv_, dp_, None


rel_attention_context.defvjp(_fwd, _bwd)
