"""On-device exponential moving average of the TRAINABLE parameters.

The reference keeps the EMA shadow in host numpy and round-trips every
iteration (model/EMA.py:16-57; flagged as a train-speed bottleneck in its
README.md:67).  Here the shadow is a device pytree updated inside the jitted
train step — zero host traffic.  Same warmup rule:
decay_t = min(decay, (1+step)/(10+step)) (EMA.py:37).

Scope parity: the reference registers only ``requires_grad`` params
(EMA.py:24-28, after ``backbone.freeze()`` at train.py:264), so frozen
leaves and BN running statistics are NOT shadowed — `apply()` evals/saves
them at their CURRENT values.  The shadow here is therefore a flat
{dotted-path: leaf} dict over the trainable subset only (same keying as the
optimizer velocity), and :func:`ema_apply` merges it over the live params.
Shadowing running stats with a 0.9998-decay average would lag the BN
statistics the rest of the network was trained against — a real eval-time
deviation early in training, and wasted HBM bandwidth always.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.asarray, params)


def ema_update(shadow, params, step, decay: float):
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda s, p: d * s + (1.0 - d) * p, shadow, params)


def ema_apply(params, shadow_flat):
    """Reference ``EMA.apply`` semantics (EMA.py:45-50): trainable leaves
    come from the shadow, everything else (frozen params, BN running stats)
    stays current.  Returns a full nested param tree for eval/save."""
    from .module import flatten_tree, unflatten_tree

    flat = dict(flatten_tree(params))
    flat.update(shadow_flat)
    return unflatten_tree(flat)
