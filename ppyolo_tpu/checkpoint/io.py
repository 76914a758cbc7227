"""Native checkpoint IO: flat-path .npz for params, full train-state bundles.

Replaces the reference's torch.save/load checkpoints (train.py:460-478) with
a framework-neutral format: an .npz whose keys are the dotted param paths.
Implements the shape-mismatch skip rule of reference train.py:156-169
(enables class-count fine-tuning, README.md:201) and the keep-newest-K GC of
train.py:467-477.
"""
from __future__ import annotations

import os
import re
import glob
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..ops.module import flatten_tree, unflatten_tree


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    flat = {k: np.asarray(v) for k, v in flatten_tree(params).items()}
    np.savez(path, **flat)


def load_params_npz(path: str, params: Dict[str, Any],
                    *, strict: bool = False) -> Dict[str, Any]:
    """Load into an existing param tree, skipping shape mismatches
    (reference train.py:156-169)."""
    data = np.load(path)
    flat = flatten_tree(params)
    loaded, skipped = 0, []
    for k in data.files:
        if k not in flat:
            skipped.append(k)
            continue
        if tuple(flat[k].shape) != tuple(data[k].shape):
            if strict:
                raise ValueError(f"shape mismatch in {k}: "
                                 f"{flat[k].shape} vs {data[k].shape}")
            skipped.append(k)
            continue
        flat[k] = jnp.asarray(data[k])
        loaded += 1
    if skipped:
        print(f"[checkpoint] skipped {len(skipped)} keys "
              f"(shape mismatch / unknown): {skipped[:5]}...")
    return unflatten_tree(flat)


def save_train_state(path: str, state) -> None:
    """Bundle params + velocity + EMA + step in one npz (the reference loses
    optimizer momentum and EMA on resume — SURVEY.md §5 failure-recovery)."""
    out = {}
    for k, v in flatten_tree(state.params).items():
        out[f"params/{k}"] = np.asarray(v)
    for k, v in state.velocity.items():
        out[f"velocity/{k}"] = np.asarray(v)
    if state.ema is not None:
        for k, v in flatten_tree(state.ema).items():
            out[f"ema/{k}"] = np.asarray(v)
    out["step"] = np.asarray(state.step)
    np.savez(path, **out)


def load_train_state(path: str, state):
    from ..train.train_step import TrainState

    data = np.load(path)
    params = dict(flatten_tree(state.params))
    velocity = dict(state.velocity)
    ema = dict(flatten_tree(state.ema)) if state.ema is not None else None
    step = state.step
    for k in data.files:
        if k.startswith("params/"):
            params[k[len("params/"):]] = jnp.asarray(data[k])
        elif k.startswith("velocity/"):
            velocity[k[len("velocity/"):]] = jnp.asarray(data[k])
        elif k.startswith("ema/") and ema is not None:
            ema[k[len("ema/"):]] = jnp.asarray(data[k])
        elif k == "step":
            step = jnp.asarray(data[k])
    return TrainState(unflatten_tree(params), velocity,
                      unflatten_tree(ema) if ema is not None else None, step)


def resume_step_from_filename(path: str) -> Optional[int]:
    """Parse the iter id out of 'step%08d' names (reference train.py:259-261)."""
    m = re.search(r"step(\d{8})", os.path.basename(path))
    return int(m.group(1)) if m else None


def gc_checkpoints(directory: str, keep: int = 10, pattern: str = "step*.npz"):
    """Keep only the newest ``keep`` checkpoints (reference train.py:467-477)."""
    files = sorted(glob.glob(os.path.join(directory, pattern)))
    for f in files[:-keep]:
        os.remove(f)
