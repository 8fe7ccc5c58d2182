"""Sequence distance criteria — ports of
``lasr/modules/criterion/distance.py`` and ``SeqCrossEntorpy``
(cross_entropy.py:4-12).  All are plain jittable callables over
(B, T, D) pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SeqCrossEntropy:
    """Flattened CE: x (B, T, V) logits vs y (B, T) ids."""

    def __call__(self, x, y):
        logp = jax.nn.log_softmax(x.reshape(-1, x.shape[-1]), axis=-1)
        picked = jnp.take_along_axis(logp, y.reshape(-1, 1), axis=1)[:, 0]
        return -jnp.mean(picked)


class SeqCosineSimilarity:
    """Mean (1 - cosine) over flattened time steps (distance.py:4-17)."""

    def __call__(self, f1, f2):
        a = f1.reshape(-1, f1.shape[-1])
        b = f2.reshape(-1, f2.shape[-1])
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        return jnp.mean(1.0 - num / jnp.maximum(den, 1e-8))


class SeqPairwiseDistance:
    """Mean p-norm distance over flattened steps (distance.py:19-32)."""

    def __init__(self, p: float = 2.0, eps: float = 1e-6):
        self.p = p
        self.eps = eps

    def __call__(self, x, y):
        a = x.reshape(-1, x.shape[-1])
        b = y.reshape(-1, y.shape[-1])
        d = jnp.sum(jnp.abs(a - b + self.eps) ** self.p, axis=-1) ** (1 / self.p)
        return jnp.mean(d)


class SeqKLDistance:
    """Symmetric KL over probability sequences (distance.py:34-52);
    'batchmean' semantics of the reference's transposed views: sum / D."""

    def __call__(self, x, y):
        x = jnp.maximum(x.reshape(-1, x.shape[-1]), 1e-30)
        y = jnp.maximum(y.reshape(-1, y.shape[-1]), 1e-30)
        d = x.shape[-1]
        kl_xy = jnp.sum(y * (jnp.log(y) - jnp.log(x))) / d
        kl_yx = jnp.sum(x * (jnp.log(x) - jnp.log(y))) / d
        return (kl_xy + kl_yx) / 2.0


class SeqCEDistance:
    """Cross entropy between probability sequences (distance.py:54-70)."""

    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, x, y):
        x = jnp.maximum(x, 1e-30)
        ce = -jnp.sum(y * jnp.log(x), axis=-1).reshape(-1)
        if self.reduction == "mean":
            return jnp.mean(ce)
        if self.reduction == "sum":
            return jnp.sum(ce)
        return ce
