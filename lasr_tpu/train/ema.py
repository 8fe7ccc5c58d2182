"""Exponential moving average of parameters (pytree-native).

Behavioral port of ``lasr/modules/ema/ema.py:5-91``: shadow parameters with
warmup-capped decay ``min(decay, (1+n)/(10+n))``, updated once per train
batch; validation/decode swap in the shadow tree (the functional equivalents
of ``copy_to``/``store``/``restore`` are trivial here — just use the
returned tree).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def ema_init(params) -> Dict[str, Any]:
    # explicit copy — aliasing the live params would make the train step
    # donate the same buffer twice
    return {"shadow": jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            "num_updates": jnp.zeros((), jnp.int32)}


def ema_update(ema: Dict[str, Any], params, decay: float = 0.9999
               ) -> Dict[str, Any]:
    n = ema["num_updates"] + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree.map(lambda s, p: s - (1.0 - d) * (s - p),
                          ema["shadow"], params)
    return {"shadow": shadow, "num_updates": n}
