"""Greedy CTC decoding (on-device argmax + host collapse)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from lasr_tpu.utils.text import greedy_ctc_tokens


def ctc_greedy_decode(ctc_logits: jnp.ndarray, hs_len: jnp.ndarray,
                      blank: int = 0) -> List[List[int]]:
    """ctc_logits: (B, T, V); hs_len: (B,). Returns per-utt token id lists
    (repeats collapsed, blanks removed)."""
    pred = np.asarray(jnp.argmax(ctc_logits, axis=-1))
    lens = np.asarray(hs_len)
    return [greedy_ctc_tokens(pred[i, : int(lens[i])].tolist(), blank=blank)
            for i in range(pred.shape[0])]
