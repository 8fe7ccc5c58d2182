"""Mask construction (JAX, jit-friendly, static shapes).

Semantics match the reference ``lasr/utils/mask.py``:
  - ``make_pad_mask(lengths, maxlen)`` → True at PADDED positions (B, T)
  - ``make_non_pad_mask``              → True at VALID positions
  - ``subsequent_mask(size)``          → lower-triangular causal mask (T, T)
  - ``target_mask(ys_in, ignore_id)``  → valid ∧ causal (B, T, T)

Unlike the reference (which converts lengths to Python lists), everything
here is traced: lengths are arrays, maxlen is static, so these run inside
``jit`` with no host sync.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """True at padded positions. lengths: (B,) int; returns (B, maxlen) bool."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return pos[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """True at valid positions. lengths: (B,) int; returns (B, maxlen) bool."""
    return ~make_pad_mask(lengths, maxlen)


def subsequent_mask(size: int) -> jnp.ndarray:
    """Lower-triangular causal mask (size, size) bool; True = attendable."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))


def target_mask(ys_in: jnp.ndarray, ignore_id: int = -1) -> jnp.ndarray:
    """Decoder self-attention mask: valid-token ∧ causal.

    ys_in: (B, L) int token ids padded with ``ignore_id`` (the reference pads
    ys_in with EOS, so also treat anything equal to ignore_id as pad).
    Returns (B, L, L) bool.
    """
    valid = ys_in != ignore_id  # (B, L)
    causal = subsequent_mask(ys_in.shape[-1])  # (L, L)
    return valid[:, None, :] & causal[None, :, :]


def chunk_attention_mask(size: int, chunk: int, left_chunks: int = -1) -> jnp.ndarray:
    """Block-chunk streaming mask (size, size) bool.

    Frame i may attend to frame j iff j's chunk index <= i's chunk index and
    (if ``left_chunks`` >= 0) within the last ``left_chunks`` chunks. This is
    the TPU-native port of the reference DualEncoder mask construction
    (transformer/encoder.py:206-213): a block-lower-triangular mask in which
    all frames within one chunk see each other.
    """
    idx = jnp.arange(size) // chunk
    ok = idx[None, :] <= idx[:, None]
    if left_chunks >= 0:
        ok = ok & (idx[None, :] > idx[:, None] - left_chunks - 1)
    return ok
