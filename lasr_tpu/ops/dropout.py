"""Seed-recompute dropout: forward-bit-identical to ``flax.linen.Dropout``,
but the backward pass REGENERATES the mask from the saved PRNG key instead
of keeping the mask (or the select's second operand) alive as a residual.

Why this exists (TPU performance, not semantics): on the recipe-size
conformer step the xprof attribution (tools/xprof_detail.py, round 3)
shows 12 `divide_select` loop fusions that each write TWO full
(B, H, T, T) score-shaped bf16 buffers — the dropped attention
probabilities for the AV matmul *plus* a saved copy for the backward
select — ~5.4 ms/step of pure HBM traffic, with matching backward-side
layout copies. The mask is a pure function of the (tiny) PRNG key, and
on TPU the hardware rbg generator re-derives it far cheaper than HBM can
round-trip it (rng-bit-generator is 1.4 ms/step TOTAL for every dropout
site in the model). So: save the 16-byte key, not the 77 MB mask.

MEASURED VERDICT (round 3, on-chip, tools/probe_dropout_impl.py —
interleaved same-process A/B at recipe shapes, remat_attend=1): the
seed-recompute form is 3.8 ms/step SLOWER (117.3 vs 113.5 ms medians).
With the attention interior already rematerialized (remat_attend=1,
the production default), the big (B,H,T,T) masks are never saved in
the first place, so the custom_vjp only adds a second rng-bit-generator
pass for the FF/embedding sites whose saved i1 masks XLA handles
cheaply. The production model therefore keeps plain ``nn.Dropout``;
this module stays as a tested opt-in for memory-tight configs where
remat of the attention interior is off (BASELINE.md round-3 row).

Numerical contract: ``Dropout(rate)(x, deterministic=...)`` is
bit-identical to ``flax.linen.Dropout`` — same ``make_rng('dropout')``
stream (the class is deliberately named ``Dropout`` so flax auto-naming
produces the same module paths), same ``random.bernoulli`` draw, same
``select(mask, x/keep, 0)`` arithmetic. Gradients equal
``mask/keep * g`` exactly, which is what autodiff of the select yields.

Reference parity note: the reference applies torch ``nn.Dropout``
identically (e.g. /root/reference/lasr/modules/net/transformer/
attention.py:84-88, positionwise_feed_forward.py:31); this changes
nothing observable.
"""

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax, random


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def seed_dropout(x, key, rate: float, broadcast_shape: tuple):
    """Apply dropout; bwd recomputes the mask from ``key``."""
    y, _ = _seed_dropout_fwd(x, key, rate, broadcast_shape)
    return y


def _apply(x, key, rate, broadcast_shape):
    keep_prob = 1.0 - rate
    mask = random.bernoulli(key, p=keep_prob, shape=broadcast_shape)
    mask = jnp.broadcast_to(mask, x.shape)
    return lax.select(mask, x / keep_prob, jnp.zeros_like(x))


def _seed_dropout_fwd(x, key, rate, broadcast_shape):
    return _apply(x, key, rate, broadcast_shape), key


def _seed_dropout_bwd(rate, broadcast_shape, key, g):
    # d/dx select(mask, x/keep, 0) == select(mask, g/keep, 0); the mask is
    # regenerated from the key — no score-shaped residual survives the fwd.
    return (_apply(g, key, rate, broadcast_shape), None)


seed_dropout.defvjp(_seed_dropout_fwd, _seed_dropout_bwd)

# Trace-time switch for A/B measurement (tools/probe_dropout_impl.py):
# False routes __call__ through plain autodiff of the select (== what
# flax.linen.Dropout compiles to), so one process can compile and time
# both variants back-to-back with everything else held fixed.
USE_SEED_VJP = True


class Dropout(nn.Module):
    """Drop-in replacement for ``flax.linen.Dropout`` (seed-recompute bwd).

    Named ``Dropout`` on purpose: flax auto-names inline submodules by
    class name (``Dropout_0``…), so swapping ``nn.Dropout`` for this class
    keeps every ``make_rng('dropout')`` path — and therefore every drawn
    mask — bit-identical to the previous builds.
    """

    rate: float
    broadcast_dims: Sequence[int] = ()
    deterministic: bool | None = None
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, inputs, deterministic: bool | None = None,
                 rng=None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        broadcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            broadcast_shape[dim] = 1
        if not USE_SEED_VJP:
            return _apply(inputs, rng, self.rate, tuple(broadcast_shape))
        return seed_dropout(inputs, rng, self.rate, tuple(broadcast_shape))
