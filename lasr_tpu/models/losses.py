"""Training criteria — pure jittable functions wrapped in config-friendly
classes.

Behavioral ports of ``lasr/modules/criterion/cross_entropy.py`` and
``lasr/model/e2e_ctc_att/e2e_loss.py``:
  - ``LabelSmoothingLoss``: KLDiv vs a smoothed one-hot, padding-masked,
    divided by batch (or token count when normalize_length) —
    cross_entropy.py:55-97.
  - ``E2E_Loss``: ``rate·ctc + (1-rate)·att`` joint loss (e2e_loss.py:17-22)
    with in-graph att accuracy; the reference's host-side greedy-CTC CER
    proxy (a GPU→CPU sync every step, e2e_loss.py:38-46) is provided
    separately as ``ctc_greedy_cer`` for periodic host-side evaluation.

Criteria are plain callables (no Flax params) so they compose into the
jitted train step; they keep the reference's dict-in/dict-out contract.
"""

from __future__ import annotations

from itertools import groupby
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lasr_tpu.ops.ctc import (ctc_forward_from_logits, ctc_forward_logprob,
                              ctc_labels_from_padded, ctc_loss)
from lasr_tpu.utils.text import edit_distance


class LabelSmoothingLoss:
    def __init__(self, size: int, padding_idx: int = -1, smoothing: float = 0.1,
                 normalize_length: bool = False):
        self.size = size
        self.padding_idx = padding_idx
        self.confidence = 1.0 - smoothing
        self.smoothing = smoothing
        self.normalize_length = normalize_length

    def __call__(self, x: jnp.ndarray, target: jnp.ndarray,
                 utt_valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B, L, V) logits; target: (B, L) ids padded with padding_idx.

        ``utt_valid``: optional (B,) bool — rows marked False are excluded
        entirely and the batch denominator counts only valid rows (used for
        the shape-bucketing dummy rows; with none present this reduces to
        the reference's /B).
        """
        B = x.shape[0]
        V = self.size
        logp = jax.nn.log_softmax(x, axis=-1)
        ignore = target == self.padding_idx
        if utt_valid is not None:
            ignore = ignore | ~utt_valid[:, None]
        tgt = jnp.where(ignore, 0, target)
        true_dist = jnp.full(x.shape, self.smoothing / (V - 1), dtype=logp.dtype)
        true_dist = jnp.where(jax.nn.one_hot(tgt, V, dtype=bool),
                              self.confidence, true_dist)
        # torch KLDivLoss(log_input, target) = target * (log target - log_input)
        safe_log_true = jnp.log(jnp.maximum(true_dist, 1e-30))
        kl = true_dist * (safe_log_true - logp)
        kl = jnp.where(ignore[..., None], 0.0, kl)
        if self.normalize_length:
            denom = jnp.maximum(jnp.sum(~ignore), 1)
        elif utt_valid is not None:
            denom = jnp.maximum(jnp.sum(utt_valid), 1)
        else:
            denom = B
        return jnp.sum(kl) / denom


def att_accuracy(att_out: jnp.ndarray, att_label: jnp.ndarray,
                 ignore_id: int = -1) -> jnp.ndarray:
    """Token accuracy over non-ignored positions (data_utils.py:29-36)."""
    pred = jnp.argmax(att_out, axis=-1)
    ok = (pred == att_label) & (att_label != ignore_id)
    return jnp.sum(ok) / jnp.maximum(jnp.sum(att_label != ignore_id), 1)


class E2E_Loss:
    """Joint CTC + label-smoothed attention loss (dict contract)."""

    def __init__(self, size: int, padding_idx: int = -1, smoothing: float = 0.1,
                 rate: float = 0.5, ctc_type: str = "builtin",
                 ignore_id: int = -1, blank_id: int = 0,
                 log_ctc_cer: bool = True):
        del ctc_type  # single first-party implementation covers both backends
        self.att_loss = LabelSmoothingLoss(size, padding_idx, smoothing, False)
        self.rate = rate
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        # per-step greedy-CTC CER, fully in-graph (reference e2e_loss.py:
        # 38-46 logs it every step; round-1 only had it per validation).
        # The vectorized Levenshtein scan costs ~11 ms/step at recipe
        # shapes (latency-bound), so when the trainer provides a step and
        # ctc_cer_interval > 1, it runs under lax.cond only on the steps
        # whose metrics are actually flushed (the trainer aligns the
        # interval to log_interval); other steps report -1.  Validation
        # (no "step" in the dict) always computes it.
        self.log_ctc_cer = log_ctc_cer
        self.ctc_cer_interval = None  # trainer fills from log_interval

    def __call__(self, att_out, ctc_out, att_label, ctc_label, hs_len):
        # losses always reduce in f32, even under a bf16 compute policy;
        # the CTC branch folds log-softmax into the lattice selection so the
        # (B, T, V) tensor is never cast/materialized in f32 (ops/ctc.py)
        att_out = att_out.astype(jnp.float32)
        utt_valid = hs_len > 0  # dummy bucket-padding rows have hs_len == 0
        n_valid = jnp.maximum(jnp.sum(utt_valid), 1)
        att = self.att_loss(att_out, att_label, utt_valid)
        labels, label_len = ctc_labels_from_padded(ctc_label, self.ignore_id)
        ll = ctc_forward_from_logits(ctc_out, hs_len, labels, label_len,
                                     blank=self.blank_id)
        ctc = -jnp.sum(jnp.where(utt_valid, ll, 0.0)) / n_valid
        main = (1.0 - self.rate) * att + self.rate * ctc
        return main, att, ctc

    def train_forward(self, input_dict: Dict) -> Dict:
        main, att, ctc = self(
            att_out=input_dict["att_out"],
            ctc_out=input_dict["ctc_out"],
            att_label=input_dict["att_label"],
            ctc_label=input_dict["ctc_label"],
            hs_len=input_dict["hs_len"])
        out = {
            "loss_main": main,
            "att_loss": att,
            "ctc_loss": ctc,
            "att_corr": att_accuracy(input_dict["att_out"],
                                     input_dict["att_label"], self.ignore_id),
        }
        if self.log_ctc_cer:
            def compute(_):
                return ctc_greedy_cer_device(
                    input_dict["ctc_out"], input_dict["ctc_label"],
                    input_dict["hs_len"], self.blank_id, self.ignore_id)
            step = input_dict.get("step")
            interval = self.ctc_cer_interval or 1
            if step is not None and interval > 1:
                out["ctc_cer"] = jax.lax.cond(
                    (step + 1) % interval == 0, compute,
                    lambda _: jnp.float32(-1.0), None)
            else:
                out["ctc_cer"] = compute(None)
        return out

    valid_forward = train_forward


def ctc_greedy_cer_device(ctc_out, ctc_label, hs_len, blank_id: int = 0,
                          ignore_id: int = -1):
    """In-graph greedy-CTC CER (reference data_utils.py:38-70, logged every
    training step by e2e_loss.py:38-46).

    The reference syncs the (B, T, V) posteriors to the CPU each step; here
    the whole computation — greedy collapse and a vectorized Levenshtein
    over frames — stays on device as part of the jitted step, so per-step
    CER observability costs no host round-trip.  The insertion recurrence
    of the edit-distance row update is resolved with the prefix-min trick
    ``newD[j] = j + cummin_{i<=j}(E[i] - i)``, making each frame's update a
    pure vector op; frames that emit nothing (blank / repeat / padding)
    leave the DP row unchanged.

    Returns sum(edit errors) / sum(ref lens) over rows with a non-empty
    reference (0 when none).
    """
    B, T, _ = ctc_out.shape
    pred = jnp.argmax(ctc_out, axis=-1).astype(jnp.int32)        # (B, T)
    prev = jnp.concatenate([jnp.full((B, 1), -12345, jnp.int32),
                            pred[:, :-1]], axis=1)
    t_idx = jnp.arange(T)[None, :]
    emit = ((t_idx < hs_len[:, None]) & (pred != blank_id)
            & (pred != prev))                                     # (B, T)

    valid = (ctc_label != blank_id) & (ctc_label != ignore_id)
    L = ctc_label.shape[1]
    order = jnp.argsort(jnp.where(valid, 0, 1), axis=1, stable=True)
    ref = jnp.take_along_axis(ctc_label, order, axis=1).astype(jnp.int32)
    ref_len = jnp.sum(valid, axis=1).astype(jnp.int32)            # (B,)
    ref = jnp.where(jnp.arange(L)[None, :] < ref_len[:, None], ref, -7)

    cols = jnp.arange(L + 1, dtype=jnp.int32)
    D0 = jnp.broadcast_to(cols[None, :], (B, L + 1)).astype(jnp.int32)

    def step(D, inputs):
        c, e = inputs                                             # (B,), (B,)
        sub = D[:, :-1] + (c[:, None] != ref).astype(jnp.int32)
        E = jnp.concatenate(
            [D[:, :1] + 1, jnp.minimum(D[:, 1:] + 1, sub)], axis=1)
        newD = cols[None, :] + jax.lax.cummin(E - cols[None, :], axis=1)
        return jnp.where(e[:, None], newD, D), None

    D, _ = jax.lax.scan(step, D0, (pred.T, emit.T), unroll=8)
    dist = jnp.take_along_axis(D, ref_len[:, None], axis=1)[:, 0]
    has = ref_len > 0
    errs = jnp.sum(jnp.where(has, dist, 0))
    total = jnp.sum(jnp.where(has, ref_len, 0))
    return errs.astype(jnp.float32) / jnp.maximum(total, 1).astype(jnp.float32)


def ctc_greedy_cer(ctc_out: np.ndarray, ctc_label: np.ndarray,
                   hs_len: np.ndarray, blank_id: int = 0,
                   ignore_id: int = -1) -> float:
    """Host-side greedy-CTC CER proxy (data_utils.py:38-70). Call this
    periodically from the trainer, not inside the step (it syncs)."""
    return ctc_greedy_cer_from_pred(np.argmax(ctc_out, axis=-1), ctc_label,
                                    hs_len, blank_id, ignore_id)


def ctc_greedy_cer_from_pred(pred: np.ndarray, ctc_label: np.ndarray,
                             hs_len: np.ndarray, blank_id: int = 0,
                             ignore_id: int = -1) -> float:
    """Same as ``ctc_greedy_cer`` but over precomputed argmax ids (the
    valid step ships ids, not the (B, T, V) posteriors)."""
    errs, total = 0, 0
    for i in range(pred.shape[0]):
        hyp = [k for k, _ in groupby(pred[i, : int(hs_len[i])])
               if k != blank_id and k != ignore_id]
        ref = [int(t) for t in ctc_label[i]
               if t != blank_id and t != ignore_id]
        if ref:
            errs += edit_distance(ref, hyp)
            total += len(ref)
    return errs / total if total else 0.0
