"""SpecAugment — on-device, PRNG-keyed, vmapped over the batch.

TPU-native replacement for the reference's host-side numpy/PIL SpecAugment
(``lasr/utils/specaugment.py:4-106``, applied per-utterance in dataloader
workers via datatrans.py:106-151).  Here the whole padded batch is augmented
inside the jitted train step, keyed by ``jax.random.PRNGKey``.

Semantics vs the reference (defaults W=5, F=27 m_F=2, T=40 m_T=2,
replace_with_zero=False → mean fill):
  - freq/time masks reproduce the reference's quirk exactly: each mask draws
    (bound, width) ~ randint(0, F)², the *bound* only constrains the start
    position and gates a skip when it is 0, while *width* sets the masked run
    (specaugment.py:47-106).
  - time masks only need to touch valid frames (padding is already zero);
    the mean fill is computed over valid frames, like the reference's
    ``cloned.mean()`` over the unpadded utterance.
  - time warp uses bilinear interpolation instead of PIL bicubic (documented
    deviation: PIL is host-side C; WER parity, not bitwise parity, is the
    contract for augmentation randomness — SURVEY.md §7 hard-parts 6).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _randint(key, lo, hi):
    """Uniform integer in [lo, hi) with traced bounds (hi > lo assumed)."""
    u = jax.random.uniform(key)
    return (lo + jnp.floor(u * (hi - lo))).astype(jnp.int32)


def _time_warp_one(x: jnp.ndarray, t_len: jnp.ndarray, key, window: int) -> jnp.ndarray:
    """Warp one utterance (T, F) around a random center, length preserved."""
    T = x.shape[0]
    k1, k2 = jax.random.split(key)
    # reference: skip when t - window <= window
    do_warp = t_len - window > window
    center = _randint(k1, window, jnp.maximum(t_len - window, window + 1))
    warped = _randint(k2, center - window, center + window) + 1

    out_pos = jnp.arange(T, dtype=jnp.float32)
    cf = center.astype(jnp.float32)
    wf = warped.astype(jnp.float32)
    tf = t_len.astype(jnp.float32)
    # PIL-style pixel-center mapping for each of the two resized segments.
    left_src = (out_pos + 0.5) * cf / jnp.maximum(wf, 1.0) - 0.5
    right_src = cf + (out_pos - wf + 0.5) * (tf - cf) / jnp.maximum(tf - wf, 1.0) - 0.5
    src = jnp.where(out_pos < wf, left_src, right_src)
    src = jnp.where(out_pos < tf, src, out_pos)  # identity on padding
    src = jnp.clip(src, 0.0, tf - 1.0)

    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = src - lo.astype(jnp.float32)
    # gather-free interpolation: rows of a (T, T) two-entry mixing matrix
    # select/blend source frames on the MXU (gathers are slow on TPU)
    W = (jax.nn.one_hot(lo, T, dtype=jnp.float32) * (1.0 - frac)[:, None]
         + jax.nn.one_hot(hi, T, dtype=jnp.float32) * frac[:, None])
    warped_x = jnp.dot(W, x.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
    return jnp.where(do_warp, warped_x, x)


def _masks_one(x: jnp.ndarray, t_len: jnp.ndarray, key, *,
               max_freq_width: int, n_freq_mask: int,
               max_time_width: int, n_time_mask: int,
               replace_with_zero: bool) -> jnp.ndarray:
    T, F = x.shape
    valid_t = (jnp.arange(T) < t_len)[:, None]  # (T, 1)
    n_valid = jnp.maximum(t_len * F, 1).astype(jnp.float32)

    def fill_value(cur):
        if replace_with_zero:
            return jnp.zeros((), cur.dtype)
        return jnp.sum(jnp.where(valid_t, cur, 0.0)) / n_valid

    keys = jax.random.split(key, n_freq_mask + n_time_mask)
    cur = x
    for i in range(n_freq_mask):
        kb, kw, ks = jax.random.split(keys[i], 3)
        bound = jax.random.randint(kb, (), 0, max_freq_width)
        width = jax.random.randint(kw, (), 0, max_freq_width)
        start = _randint(ks, 0, jnp.maximum(F - bound, 1))
        cols = jnp.arange(F)
        hit = (cols >= start) & (cols < start + width) & (bound > 0)
        cur = jnp.where(hit[None, :] & valid_t, fill_value(cur), cur)
    for i in range(n_time_mask):
        kb, kw, ks = jax.random.split(keys[n_freq_mask + i], 3)
        bound = jax.random.randint(kb, (), 0, max_time_width)
        width = jax.random.randint(kw, (), 0, max_time_width)
        start = _randint(ks, 0, jnp.maximum(t_len - bound, 1))
        rows = jnp.arange(T)
        hit = (rows >= start) & (rows < start + width) & (bound > 0) & (t_len - bound > 0)
        cur = jnp.where(hit[:, None] & valid_t, fill_value(cur), cur)
    return cur


@partial(jax.jit, static_argnames=(
    "max_time_warp", "max_freq_width", "n_freq_mask",
    "max_time_width", "n_time_mask", "replace_with_zero"))
def spec_augment(feats: jnp.ndarray, feat_len: jnp.ndarray, key,
                 max_time_warp: int = 5,
                 max_freq_width: int = 27, n_freq_mask: int = 2,
                 max_time_width: int = 40, n_time_mask: int = 2,
                 replace_with_zero: bool = False) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch.

    Args:
      feats: (B, T, F) float features, zero past each ``feat_len``.
      feat_len: (B,) int valid frame counts.
      key: PRNGKey; split per-utterance.
    Returns (B, T, F) augmented features (padding stays zero).
    """
    B = feats.shape[0]
    keys = jax.random.split(key, B)

    def one(x, t_len, k):
        kw, km = jax.random.split(k)
        if max_time_warp > 0:
            x = _time_warp_one(x, t_len, kw, max_time_warp)
        x = _masks_one(
            x, t_len, km,
            max_freq_width=max_freq_width, n_freq_mask=n_freq_mask,
            max_time_width=max_time_width, n_time_mask=n_time_mask,
            replace_with_zero=replace_with_zero)
        return x

    out = jax.vmap(one)(feats, feat_len, keys)
    valid = (jnp.arange(feats.shape[1])[None, :] < feat_len[:, None])[..., None]
    return jnp.where(valid, out, 0.0)
