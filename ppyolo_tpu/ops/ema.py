"""On-device exponential moving average of parameters.

The reference keeps the EMA shadow in host numpy and round-trips every
iteration (model/EMA.py:16-57; flagged as a train-speed bottleneck in its
README.md:67).  Here the shadow is a device pytree updated inside the jitted
train step — zero host traffic.  Same warmup rule:
decay_t = min(decay, (1+step)/(10+step)) (EMA.py:37).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.asarray, params)


def ema_update(shadow, params, step, decay: float):
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda s, p: d * s + (1.0 - d) * p, shadow, params)
