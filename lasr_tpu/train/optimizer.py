"""Optimizers and LR schedules (optax), YAML-config friendly.

Behavioral ports of the reference's Noam family
(``lasr/modules/optimizer/{optimizer,scheduler}.py``): the Noam curve is
``offset + factor · d_model^-0.5 · min(s^-0.5, s · warm^-1.5)`` with the
step count starting at 1 (torch ``_LRScheduler._step_count`` semantics).

Config usage (same YAML shape as the reference recipes)::

    opti_config:
      name: 'lasr_tpu.train.optimizer:Adam'
      kwargs: {betas: [0.9, 0.98]}
      scheduler:
        name: 'lasr_tpu.train.optimizer:WarmupScheduler'
        kwargs: {factor: 3, warm_step: 25000, model_size: 320, offset: 0}

``BaseConfig`` instantiates these descriptor objects; the Trainer composes
them into the optax chain (clip → adam(schedule) → MultiSteps).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import optax


class WarmupScheduler:
    """Noam warmup curve as an optax-compatible schedule callable
    (reference scheduler.py:3-21)."""

    def __init__(self, model_size: int, factor: float, warm_step: int,
                 offset: float = 0.0, offstep: int = 0):
        self.model_size = model_size
        self.factor = factor
        self.warm_step = warm_step
        self.offset = offset
        self.offstep = offstep

    def __call__(self, count):
        import jax.numpy as jnp
        # optax count starts at 0; the reference's step count starts at 1
        step = count + 1 + self.offstep
        step = jnp.maximum(step.astype(jnp.float32)
                           if hasattr(step, "astype") else float(step), 1.0)
        return (self.offset + self.factor * self.model_size ** -0.5
                * jnp.minimum(step ** -0.5, step * self.warm_step ** -1.5))


class Adam:
    """Adam descriptor; ``make(schedule)`` builds the optax transform."""

    def __init__(self, lr: float = 1e-3,
                 betas: Sequence[float] = (0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.0):
        self.lr = lr
        self.betas = tuple(betas)
        self.eps = eps
        self.weight_decay = weight_decay

    def make(self, schedule=None) -> optax.GradientTransformation:
        lr = schedule if schedule is not None else self.lr
        if self.weight_decay:
            return optax.adamw(lr, b1=self.betas[0], b2=self.betas[1],
                               eps=self.eps, weight_decay=self.weight_decay)
        return optax.adam(lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)


class Noam(Adam):
    """Adam(0.9, 0.98, eps=1e-9) with a built-in Noam schedule
    (reference optimizer.py:22-85)."""

    def __init__(self, model_size: int, factor: float, warm_step: int,
                 offset: float = 0.0, offstep: int = 0):
        super().__init__(lr=0.0, betas=(0.9, 0.98), eps=1e-9)
        self.schedule = WarmupScheduler(model_size, factor, warm_step,
                                        offset, offstep)

    def make(self, schedule=None) -> optax.GradientTransformation:
        return super().make(schedule if schedule is not None else self.schedule)


def build_optimizer(opti_config: dict) -> Tuple[optax.GradientTransformation,
                                                Optional[object]]:
    """Resolve an ``opti_config`` YAML block (with optional nested
    ``scheduler``) into (optax transform, schedule callable or None)."""
    from lasr_tpu.utils.registry import BaseConfig
    desc = BaseConfig(name=opti_config["name"],
                      kwargs=opti_config.get("kwargs", {})).generateExample()
    schedule = None
    if "scheduler" in opti_config and opti_config["scheduler"]:
        schedule = BaseConfig(**opti_config["scheduler"]).generateExample()
    if not hasattr(desc, "make"):
        raise TypeError(f"optimizer {opti_config['name']!r} must provide "
                        f".make(schedule) (got {type(desc)})")
    return desc.make(schedule), schedule or getattr(desc, "schedule", None)
