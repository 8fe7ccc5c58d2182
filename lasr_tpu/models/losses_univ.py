"""Dual-mode distillation losses for online/offline joint training.

Behavioral ports of ``lasr/modules/criterion/customize_loss.py`` (KL_Loss),
``lasr/modules/criterion/ali_loss.py`` (Align_Loss + ctc_force_align), and
``lasr/model/e2e_ctc_att/e2e_loss_univ.py`` (CTC_CE_Univ_Loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lasr_tpu.models.losses import E2E_Loss, att_accuracy
from lasr_tpu.ops.ctc import ctc_labels_from_padded

_NEG_INF = -1e30


class KL_Loss:
    """KL(student log-softmax ‖ stop-grad teacher softmax), masked, / batch
    (customize_loss.py:4-20)."""

    def __init__(self, size: int, normalize_length: bool = False):
        self.size = size
        self.normalize_length = normalize_length

    def __call__(self, x, y, mask):
        """x: student logits (..., V); y: teacher logits (same shape);
        mask: broadcastable bool, True = EXCLUDED position (the reference
        passes padding masks)."""
        x = x.astype(jnp.float32)
        y = jax.lax.stop_gradient(y.astype(jnp.float32))
        B = x.shape[0]
        logp = jax.nn.log_softmax(x, axis=-1)
        t = jax.nn.softmax(y, axis=-1)
        kl = t * (jnp.log(jnp.maximum(t, 1e-30)) - logp)
        kl = jnp.where(mask[..., None], 0.0, kl)
        if self.normalize_length:
            denom = jnp.maximum(jnp.sum(~mask), 1)
        else:
            denom = B
        return jnp.sum(kl) / denom


def ctc_force_align(log_probs: jnp.ndarray, labels: jnp.ndarray,
                    input_len: jnp.ndarray, label_len: jnp.ndarray,
                    blank: int = 0) -> jnp.ndarray:
    """Viterbi CTC forced alignment → emission frame (1-indexed) per label.

    JAX re-implementation of the reference's numpy DP
    (ali_loss.py:6-76): max-semiring forward over the extended lattice with
    a backtraced emission-position output (B, L) float32 (0 where unused).
    """
    B, T, V = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    s_idx = jnp.arange(S)
    is_lbl = (s_idx % 2) == 1
    lbl_pos = jnp.minimum((s_idx - 1) // 2, L - 1)
    ext = jnp.where(is_lbl[None, :],
                    jnp.take_along_axis(labels, jnp.broadcast_to(
                        lbl_pos[None, :], (B, S)), axis=1), blank)
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :S]
    can_skip = is_lbl[None, :] & (ext != ext_m2) & (s_idx[None, :] >= 2)
    n_states = 2 * label_len + 1

    lp0 = log_probs[:, 0]
    a0 = jnp.full((B, S), _NEG_INF)
    a0 = a0.at[:, 0].set(jnp.take_along_axis(lp0, ext[:, :1], 1)[:, 0])
    a0 = a0.at[:, 1].set(jnp.where(label_len > 0,
                                   jnp.take_along_axis(lp0, ext[:, 1:2], 1)[:, 0],
                                   _NEG_INF))

    def fwd(alpha, t):
        lp = log_probs[:, t]
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :S]
        prev2 = jnp.where(can_skip,
                          jnp.pad(alpha, ((0, 0), (2, 0)),
                                  constant_values=_NEG_INF)[:, :S], _NEG_INF)
        stacked = jnp.stack([alpha, prev1, prev2], axis=-1)   # (B,S,3)
        best = jnp.argmax(stacked, axis=-1)                   # 0=stay,1,2
        val = jnp.max(stacked, axis=-1)
        emit = jnp.take_along_axis(lp, ext, axis=1)
        new = val + emit
        # freeze past input_len and outside valid states
        ok = (t < input_len)[:, None] & (s_idx[None, :] < n_states[:, None])
        new = jnp.where(ok, new, alpha)
        ptr = jnp.where(ok, s_idx[None, :] - best, s_idx[None, :])
        return new, ptr

    alpha, ptrs = jax.lax.scan(fwd, a0, jnp.arange(1, T))  # ptrs (T-1, B, S)

    end1 = 2 * label_len
    end2 = jnp.maximum(2 * label_len - 1, 0)
    a1 = jnp.take_along_axis(alpha, end1[:, None], 1)[:, 0]
    a2 = jnp.take_along_axis(alpha, end2[:, None], 1)[:, 0]
    state_T = jnp.where(a1 > a2, end1, end2)

    # backtrace from the last frame; frames past input_len have identity
    # pointers so starting at T-1 is safe
    def back(state, t):
        ptr_t = ptrs[t - 1]                                   # (B, S)
        prev = jnp.take_along_axis(ptr_t, state[:, None], 1)[:, 0]
        return prev, state

    state0, states_rev = jax.lax.scan(back, state_T,
                                      jnp.arange(T - 1, 0, -1))
    st = jnp.concatenate([state0[None], states_rev[::-1]], axis=0)  # (T, B)

    # emission frame of label l = first (1-indexed) time its odd state is
    # entered; a Viterbi path enters each label state exactly once, so a
    # one-hot scatter-sum recovers it (ali_loss.py:66-76 semantics)
    prev_states = jnp.concatenate([jnp.full((1, B), -1, st.dtype), st[:-1]],
                                  axis=0)
    is_label_state = (st % 2) == 1
    newly = (st != prev_states) & is_label_state
    tt = jnp.arange(T)[:, None]
    within = tt < input_len[None, :]
    lbl_of_state = (st - 1) // 2
    flat_lbl = jnp.where(newly & within, lbl_of_state, L)     # L = dump slot
    one_hot = jax.nn.one_hot(flat_lbl, L + 1, dtype=jnp.float32)
    time_val = (tt + 1).astype(jnp.float32)
    align = jnp.sum(one_hot * time_val[..., None], axis=0)[:, :L]
    return align


class Align_Loss:
    """Attention-alignment supervision (ali_loss.py:85-150): modes
    'mid' / 'beg' / 'end' (expected-position MSE), 'norm', 'qua',
    'google' (window mask), 'ctc' (Viterbi-aligned MSE)."""

    def __init__(self, ali_type: str = "mid", ignore_id: int = -1,
                 exp_dist: int = 3):
        self.ali_type = ali_type
        self.ignore_id = ignore_id
        self.exp_dist = exp_dist

    def __call__(self, ali_out, ali_beg=None, ali_end=None, enc_pad=None,
                 ctc_out=None, ctc_label=None, ctc_len=None):
        """ali_out: (B, layersxH, L+1, T) attention maps; ali_beg/end:
        (B, L) frame labels (ignore_id padded); enc_pad: (B, T) True at
        PADDED frames."""
        ali_out = ali_out.astype(jnp.float32)
        B, layers, olen, T = ali_out.shape

        if self.ali_type in ("mid", "beg", "end", "ctc"):
            pos = jnp.arange(1, T + 1, dtype=jnp.float32)
            expect = jnp.einsum("blot,t->blo", ali_out, pos)[:, :, :-1]
            if self.ali_type == "ctc":
                lpz = jax.nn.log_softmax(ctc_out.astype(jnp.float32), -1)
                labels, label_len = ctc_labels_from_padded(
                    ctc_label, self.ignore_id)
                ali = ctc_force_align(lpz, labels, ctc_len, label_len)
                ylens = label_len
            else:
                ylens = jnp.sum(ali_beg != self.ignore_id, axis=1)
                beg = ali_beg.astype(jnp.float32)
                end = (ali_end if ali_end is not None else ali_beg
                       ).astype(jnp.float32)
                ali = {"mid": (beg + end) / 2, "beg": beg,
                       "end": end}[self.ali_type]
            Lq = expect.shape[-1]
            valid = jnp.arange(Lq)[None, :] < ylens[:, None]
            lat = jnp.where(valid[:, None, :], expect - ali[:, None, :Lq], 0.0)
            total = jnp.maximum(jnp.sum(valid), 1) * layers
            return jnp.sum(lat ** 2) / total / T

        if self.ali_type in ("qua", "norm"):
            ylens = jnp.sum(ali_beg != self.ignore_id, axis=1) + 1
            valid = jnp.arange(olen)[None, :] < ylens[:, None]  # (B, olen)
            masked = jnp.where(valid[:, None, :, None], ali_out, 0.0)
            if self.ali_type == "qua":
                return jnp.sum(ylens[:, None].astype(jnp.float32)
                               - jnp.sum(masked, axis=(2, 3))) / (B * layers)
            tokens = jnp.maximum(jnp.sum(ylens), 1)
            return jnp.sum(jnp.where(valid[:, None, :],
                                     1.0 - jnp.sum(masked, axis=3),
                                     0.0)) / (layers * tokens)

        if self.ali_type == "google":
            ylens = jnp.sum(ali_beg != self.ignore_id, axis=1)
            beg = jnp.clip(ali_beg - self.exp_dist - 1, 0, T)
            end = jnp.clip(ali_end + self.exp_dist, 0, T)
            t_idx = jnp.arange(T)
            win = (t_idx[None, None, :] >= beg[:, :, None]) & \
                  (t_idx[None, None, :] < end[:, :, None])    # (B, L, T)
            # eos row: everything from the last token's window start
            last_beg = jnp.take_along_axis(
                beg, jnp.maximum(ylens - 1, 0)[:, None], axis=1)
            eos_win = t_idx[None, :] >= last_beg                # (B, T)
            Lq = olen - 1
            align = jnp.concatenate(
                [win[:, :Lq], eos_win[:, None, :]], axis=1)     # (B, olen, T)
            row_valid = jnp.arange(olen)[None, :] <= ylens[:, None]
            mask_ok = row_valid[:, :, None] & (~enc_pad[:, None, :])
            loss = jnp.where(mask_ok[:, None],
                             ali_out * (1.0 - align[:, None].astype(
                                 jnp.float32)), 0.0)
            denom = jnp.maximum(jnp.sum(mask_ok), 1)
            return jnp.sum(loss) / denom / layers

        raise ValueError(f"unknown ali_type {self.ali_type!r}")


class CTC_CE_Univ_Loss(E2E_Loss):
    """Joint dual-view loss: att+ctc on both views + KL(on‖off) on att and
    ctc outputs + optional alignment loss (e2e_loss_univ.py:10-72)."""

    def __init__(self, size, padding_idx=-1, smoothing=0.1, rate=0.5,
                 kl_rate=1.0, ali_rate=1.0, ali_type="mid"):
        super().__init__(size, padding_idx, smoothing, rate)
        self.kl_rate = kl_rate
        self.ali_rate = ali_rate
        self.kl = KL_Loss(size)
        self.ali = Align_Loss(ali_type, padding_idx)
        self.padding_idx = padding_idx

    def forward_univ(self, att_on, ctc_on, ali_out, att_off, ctc_off,
                     att_label, ctc_label, hs_len,
                     label_beg=None, label_end=None):
        att_loss = self.att_loss(att_on, att_label)
        att_loss_off = self.att_loss(att_off, att_label)
        kl = self.kl(att_on, att_off, att_label == self.padding_idx)

        labels, label_len = ctc_labels_from_padded(ctc_label, self.ignore_id)
        from lasr_tpu.ops.ctc import ctc_loss
        ctc_l = ctc_loss(ctc_on, hs_len, labels, label_len, self.blank_id)
        ctc_l_off = ctc_loss(ctc_off, hs_len, labels, label_len, self.blank_id)
        T = ctc_on.shape[1]
        enc_pad = jnp.arange(T)[None, :] >= hs_len[:, None]
        kl = kl + self.kl(ctc_on, ctc_off, enc_pad)
        if label_beg is not None or self.ali.ali_type == "ctc":
            ali_l = self.ali(ali_out, label_beg, label_end, enc_pad,
                             ctc_off, ctc_label, hs_len)
        else:
            ali_l = jnp.zeros(())
        main = ((1 - self.rate) * (att_loss + att_loss_off)
                + self.rate * (ctc_l + ctc_l_off)
                + self.ali_rate * ali_l + self.kl_rate * kl)
        return main, att_loss, ctc_l, ali_l, kl

    def train_forward(self, input_dict):
        main, att_l, ctc_l, ali_l, kl_l = self.forward_univ(
            att_on=input_dict["att_out_on"],
            ctc_on=input_dict["ctc_out_on"],
            ali_out=input_dict["ali_out"],
            att_off=input_dict["att_out_off"],
            ctc_off=input_dict["ctc_out_off"],
            att_label=input_dict["att_label"],
            ctc_label=input_dict["ctc_label"],
            hs_len=input_dict["hs_len"],
            label_beg=input_dict.get("y_beg"),
            label_end=input_dict.get("y_end"))
        return {
            "loss_main": main,
            "att_loss": att_l,
            "ctc_loss": ctc_l,
            "ali_loss": ali_l,
            "kl_loss": kl_l,
            "att_corr_on": att_accuracy(input_dict["att_out_on"],
                                        input_dict["att_label"],
                                        self.ignore_id),
            "att_corr_off": att_accuracy(input_dict["att_out_off"],
                                         input_dict["att_label"],
                                         self.ignore_id),
        }

    valid_forward = train_forward
