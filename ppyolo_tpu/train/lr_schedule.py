"""Warmup + piecewise-decay LR as a pure function of step
(reference train.py:172-188 calc_lr — resume-consistent by construction)."""
from __future__ import annotations

import jax.numpy as jnp


def make_lr_fn(learning_rate_cfg):
    base_lr = learning_rate_cfg["base_lr"]
    gamma = learning_rate_cfg["PiecewiseDecay"]["gamma"]
    milestones = list(learning_rate_cfg["PiecewiseDecay"]["milestones"])
    start_factor = learning_rate_cfg["LinearWarmup"]["start_factor"]
    warmup_steps = learning_rate_cfg["LinearWarmup"]["steps"]

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        n_passed = sum(jnp.where(step >= m, 1.0, 0.0) for m in milestones)
        decayed = base_lr * gamma ** n_passed
        k = (1.0 - start_factor) / warmup_steps
        warm = base_lr * (start_factor + k * step)
        in_warmup = (step <= warmup_steps) & (n_passed == 0)
        return jnp.where(in_warmup, warm, decayed)

    return lr_fn
