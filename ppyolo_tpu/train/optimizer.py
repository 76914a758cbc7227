"""Momentum SGD with the reference's per-parameter group policy.

Reproduces torch.optim.SGD(momentum, weight_decay-per-group) as driven by the
reference's ``add_param_group`` scheme (custom_layers.py:167-241 +
train.py:271-280,437-442):

  grad   <- grad + wd_mult * l2_factor * param        (L2 regularizer)
  buf    <- momentum * buf + grad
  param  <- param - lr_t * lr_mult * buf

Frozen parameters (``trainable=False``: freeze_at stages, BN running stats)
are left untouched.  The policy tree is static — it compiles into the jitted
train step with zero runtime branching.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.module import ParamPolicy


def init_momentum(params: Dict[str, Any], policy: Dict[str, Any]):
    """Velocity tree: zeros for trainable leaves, None otherwise."""
    return jax.tree.map(
        lambda p, pol: jnp.zeros_like(p) if pol.trainable else None,
        params, policy,
        is_leaf=lambda v: isinstance(v, ParamPolicy),
    )


def sgd_momentum_update(params, grads, velocity, policy, lr_t,
                        *, momentum: float = 0.9, l2_factor: float = 0.0005):
    def upd(p, g, v, pol: ParamPolicy):
        if not pol.trainable or g is None:
            return p, v
        g = g + pol.wd_mult * l2_factor * p
        v = momentum * v + g
        p = p - lr_t * pol.lr_mult * v
        return p, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_v = treedef.flatten_up_to(velocity)
    flat_pol = treedef.flatten_up_to(policy)
    new_p, new_v = [], []
    for p, g, v, pol in zip(flat_p, flat_g, flat_v, flat_pol):
        np_, nv = upd(p, g, v, pol)
        new_p.append(np_)
        new_v.append(nv)
    return treedef.unflatten(new_p), treedef.unflatten(new_v)
