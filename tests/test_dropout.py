"""Seed-recompute dropout (lasr_tpu/ops/dropout.py) — the bit-identity
contract vs flax.linen.Dropout, and mask-recompute gradient correctness
(including under jax.checkpoint).

The production model keeps plain nn.Dropout (the on-chip interleaved A/B
measured the seed-recompute form 3.8 ms/step slower at remat_attend=1 —
BASELINE.md round-3 row); this op ships as a tested opt-in for
remat-off memory-tight configs, and these tests pin its drop-in
bit-identity so the opt-in stays safe.

Reference parity: the reference applies plain torch nn.Dropout at the
same sites (/root/reference/lasr/modules/net/transformer/attention.py:88,
positionwise_feed_forward.py:31); the seed-recompute form is a pure
TPU-memory optimization with no observable semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from lasr_tpu.ops.dropout import Dropout, seed_dropout


class _Flax(nn.Module):
    rates = (0.1, 0.3)

    @nn.compact
    def __call__(self, x, det):
        x = x * 2.0
        x = nn.Dropout(self.rates[0])(x, deterministic=det)
        return nn.Dropout(self.rates[1])(x, deterministic=det)


class _Seed(nn.Module):
    rates = (0.1, 0.3)

    @nn.compact
    def __call__(self, x, det):
        x = x * 2.0
        x = Dropout(self.rates[0])(x, deterministic=det)
        return Dropout(self.rates[1])(x, deterministic=det)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bit_identical_to_flax_dropout(dtype):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 8, 16)), dtype)
    dk = jax.random.PRNGKey(7)
    ya = _Flax().apply({}, x, False, rngs={"dropout": dk})
    yb = _Seed().apply({}, x, False, rngs={"dropout": dk})
    # same make_rng paths (class is named Dropout), same bernoulli, same
    # select arithmetic => bit-identical, not merely close
    assert jnp.all(ya == yb)
    assert jnp.all(_Flax().apply({}, x, True) == _Seed().apply({}, x, True))


def test_grad_bit_identical_and_remat_safe():
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 8, 16)), jnp.float32)
    dk = jax.random.PRNGKey(3)
    ga = jax.grad(
        lambda x: _Flax().apply({}, x, False, rngs={"dropout": dk}).sum())(x)
    gb = jax.grad(
        lambda x: _Seed().apply({}, x, False, rngs={"dropout": dk}).sum())(x)
    assert jnp.all(ga == gb)
    gc = jax.grad(jax.checkpoint(
        lambda x: _Seed().apply({}, x, False, rngs={"dropout": dk}).sum()))(x)
    assert jnp.all(ga == gc)


def test_broadcast_dims_and_edge_rates():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 5, 7)), jnp.float32)
    dk = jax.random.PRNGKey(11)
    for bdims in [(), (1,), (0, 2)]:
        ya = nn.Dropout(0.5, broadcast_dims=bdims).apply(
            {}, x, deterministic=False, rngs={"dropout": dk})
        yb = Dropout(0.5, broadcast_dims=bdims).apply(
            {}, x, deterministic=False, rngs={"dropout": dk})
        assert jnp.all(ya == yb)
    # rate 0 => identity (no rng consumed); rate 1 => zeros
    assert jnp.all(Dropout(0.0).apply({}, x, deterministic=False) == x)
    assert jnp.all(Dropout(1.0).apply(
        {}, x, deterministic=False, rngs={"dropout": dk}) == 0)


def test_no_mask_residual_saved():
    """The vjp residual set must contain the key, not a mask-shaped array."""
    x = jnp.ones((64, 64), jnp.float32)
    key = jax.random.PRNGKey(0)
    _, vjp = jax.vjp(
        lambda x: seed_dropout(x, key, 0.1, (64, 64)), x)
    # the residual closure holds only the key (uint32[..]) — nothing of
    # x's shape/dtype may be captured
    leaves = jax.tree.leaves(vjp)
    assert all(l.dtype == jnp.uint32 or l.size < 64 * 64 for l in leaves), \
        [(l.shape, l.dtype) for l in leaves]
