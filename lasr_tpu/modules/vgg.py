"""VGG2L frontend (Flax) — port of ``lasr/modules/net/conv/vgg.py:3-75``.

Two VGG blocks with (3,2) then (2,2) max-pooling → time subsampled x1/6,
optional domain-tag concat before the output projection; the mask follows
the reference's ``::3`` then ``::2`` stride-slicing.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def vgg2l_sub_len(length, T: int):
    """Output length under mask slicing ``[:T-T%3:3]`` then ``[:T'-T'%2:2]``."""
    t1 = (T - T % 3 + 2) // 3  # count of kept positions 0,3,6,...
    l1 = jnp.minimum((length + 2) // 3, t1) if not isinstance(length, int) \
        else min((length + 2) // 3, t1)
    t2 = (t1 - t1 % 2 + 1) // 2
    l2 = jnp.minimum((l1 + 1) // 2, t2) if not isinstance(l1, int) \
        else min((l1 + 1) // 2, t2)
    return l2


class VGG2L(nn.Module):
    idim: int
    odim: int
    domain_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_len, x_tag=None):
        """x: (B, T, idim) → ((B, T/6, odim), lengths)."""
        h = x[..., None].astype(self.dtype)  # NHWC: (B, T, F, 1)
        for ch, pool in ((64, (3, 2)), (128, (2, 2))):
            h = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype)(h))
            h = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype)(h))
            h = nn.max_pool(h, window_shape=pool, strides=pool)
        B, Tp, Fp, C = h.shape
        h = h.reshape(B, Tp, Fp * C)
        if x_tag is not None:
            h = jnp.concatenate(
                [h, jnp.broadcast_to(x_tag[:, None, :],
                                     (B, Tp, x_tag.shape[-1]))], axis=-1)
        h = nn.Dense(self.odim, dtype=self.dtype)(h)
        new_len = vgg2l_sub_len(x_len, x.shape[1])
        new_len = jnp.minimum(new_len, Tp)
        return h, new_len
