"""First-party CTC loss: log-semiring forward recursion as a ``lax.scan``.

Replaces the reference's delegation to ``torch.nn.CTCLoss`` (ATen native;
``lasr/modules/criterion/cross_entropy.py:15-53`` — log_softmax inside,
``reduction='sum'`` then divided by batch size, cudnn disabled).  Owning the
DP lets the loss live inside the single jitted train step; XLA fuses the
per-step gather + logsumexp onto the VPU, and autodiff through the scan gives
the exact soft-alignment gradient.

Formulation (Graves et al. 2006): extended label sequence
``ext = [b, y1, b, y2, ..., yL, b]`` of length 2L+1; alpha recursion over T
in log space; per-utterance valid lengths handled by freezing alpha past
``input_len`` and reading the two final states at ``2*label_len{-1}``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, _NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))
    return jnp.where(m <= _NEG_INF, _NEG_INF, out)


@partial(jax.jit, static_argnames=("blank",))
def ctc_forward_logprob(log_probs: jnp.ndarray, input_len: jnp.ndarray,
                        labels: jnp.ndarray, label_len: jnp.ndarray,
                        blank: int = 0) -> jnp.ndarray:
    """Per-utterance CTC log-likelihood log p(labels | log_probs).

    Args:
      log_probs: (B, T, V) log-softmaxed output.
      input_len: (B,) valid frame counts.
      labels: (B, L) int labels (padding value irrelevant; masked by len).
      label_len: (B,) valid label counts.
    Returns (B,) log-likelihoods (<= 0).
    """
    return _ctc_forward(log_probs, None, input_len, labels, label_len, blank)


@partial(jax.jit, static_argnames=("blank",))
def ctc_forward_from_logits(logits: jnp.ndarray, input_len: jnp.ndarray,
                            labels: jnp.ndarray, label_len: jnp.ndarray,
                            blank: int = 0) -> jnp.ndarray:
    """Same as ``ctc_forward_logprob`` but from raw (possibly bf16) logits.

    log-softmax is folded into the lattice: the DP only ever needs the S =
    2L+1 per-state emissions, so the normalizer is a (B, T) f32 logsumexp
    reduction and the full (B, T, V) log-prob tensor is never materialized
    (under a bf16 policy the old path wrote it to HBM in f32 — ~250 MB for
    the baseline recipe batch — purely to select S<<V entries from it).
    """
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)  # (B, T)
    return _ctc_forward(logits, lse, input_len, labels, label_len, blank)


def _ctc_forward(scores, lse, input_len, labels, label_len, blank):
    """Core lattice recursion; emissions are ``select(scores) - lse``
    (``lse=None`` means scores are already normalized log-probs)."""
    B, T, V = scores.shape
    log_probs = scores  # emissions are selected below; name kept for clarity
    L = labels.shape[1]
    S = 2 * L + 1

    s_idx = jnp.arange(S)
    lbl_pos = (s_idx - 1) // 2                      # label index for odd s
    is_lbl = (s_idx % 2) == 1
    safe_pos = jnp.minimum(lbl_pos, L - 1)
    ext = jnp.where(is_lbl[None, :], jnp.take_along_axis(
        labels, jnp.broadcast_to(safe_pos[None, :], (B, S)), axis=1), blank)  # (B, S)
    # s positions beyond the utterance's own 2*label_len+1 states are invalid
    state_ok = s_idx[None, :] < (2 * label_len[:, None] + 1)

    # can we skip from s-2? only when ext[s] is a label and != ext[s-2]
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :S]
    can_skip = is_lbl[None, :] & (ext != ext_m2) & (s_idx[None, :] >= 2)

    # hoist the vocab lookup out of the scan as a one-hot contraction:
    # gathers are slow on TPU, but selecting S lattice emissions from V
    # classes is a (B,T,V)x(B,S,V) matmul the MXU eats for free
    ext_onehot = jax.nn.one_hot(ext, V, dtype=log_probs.dtype)  # (B, S, V)
    emit_all = jnp.einsum("btv,bsv->bts", log_probs, ext_onehot,
                          precision=jax.lax.Precision.HIGHEST)
    emit_all = emit_all.astype(jnp.float32)
    if lse is not None:
        emit_all = emit_all - lse[:, :, None]
    lp0 = emit_all[:, 0, :]                         # (B, S) emissions at t=0
    alpha0 = jnp.full((B, S), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp0[:, 0])
    has_lbl = label_len > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_lbl, lp0[:, 1], _NEG_INF))
    alpha0 = jnp.where(state_ok, alpha0, _NEG_INF)

    emit_t = jnp.moveaxis(emit_all, 1, 0)  # (T, B, S)

    def step(alpha, inputs):
        emit, t = inputs
        stay = alpha
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :S]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :S]
        prev2 = jnp.where(can_skip, prev2, _NEG_INF)
        new = _logsumexp3(stay, prev1, prev2) + emit
        new = jnp.where(state_ok, new, _NEG_INF)
        active = (t < input_len)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T)
    # unroll amortizes the sequential-scan launch latency on TPU; per-step
    # compute is tiny (B x 2L+1) so the DP is latency- not FLOP-bound
    alpha_final, _ = jax.lax.scan(step, alpha0, (emit_t[1:], ts), unroll=8)

    end1 = 2 * label_len          # final blank state
    end2 = jnp.maximum(2 * label_len - 1, 0)  # final label state
    a_end1 = jnp.take_along_axis(alpha_final, end1[:, None], axis=1)[:, 0]
    a_end2 = jnp.take_along_axis(alpha_final, end2[:, None], axis=1)[:, 0]
    a_end2 = jnp.where(has_lbl, a_end2, _NEG_INF)
    m = jnp.maximum(a_end1, a_end2)
    m_safe = jnp.maximum(m, _NEG_INF)
    ll = m_safe + jnp.log(jnp.exp(a_end1 - m_safe) + jnp.exp(a_end2 - m_safe))
    return jnp.where(m <= _NEG_INF, _NEG_INF, ll)


def ctc_loss(logits: jnp.ndarray, input_len: jnp.ndarray,
             labels: jnp.ndarray, label_len: jnp.ndarray,
             blank: int = 0) -> jnp.ndarray:
    """Sum-reduced-over-batch / B CTC loss from raw logits.

    Matches the reference reduction: ``CTCLoss(reduction='sum') / B``
    (cross_entropy.py:36-39).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ll = ctc_forward_logprob(log_probs, input_len, labels, label_len, blank=blank)
    return -jnp.sum(ll) / logits.shape[0]


def ctc_labels_from_padded(padded: jnp.ndarray, ignore_id: int = -1):
    """(labels, label_len) from an ignore_id-padded label matrix.

    The reference strips ignore_id per row and concatenates
    (cross_entropy.py:47-50); in fixed-shape JAX we compact each row's valid
    labels to the left instead.
    """
    valid = padded != ignore_id
    label_len = jnp.sum(valid, axis=1).astype(jnp.int32)
    # stable left-compaction: sort by (invalid, position)
    order = jnp.argsort(jnp.where(valid, 0, 1), axis=1, stable=True)
    labels = jnp.take_along_axis(padded, order, axis=1)
    labels = jnp.where(jnp.arange(padded.shape[1])[None, :] < label_len[:, None],
                       labels, 0)
    return labels, label_len
