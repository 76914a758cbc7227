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
import threading
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..ops.module import flatten_tree, unflatten_tree


def _write_npz_atomic(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write to a tmp name then rename: a crash mid-write never leaves a
    truncated checkpoint under the real name (gc_checkpoints explicitly
    excludes the '.tmp.npz' suffix, so GC never counts or removes one)."""
    tmp = path + ".tmp.npz"  # np.savez appends .npz to other suffixes
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    flat = {k: np.asarray(v) for k, v in flatten_tree(params).items()}
    _write_npz_atomic(path, flat)


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


def _state_to_flat(state) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in flatten_tree(state.params).items():
        out[f"params/{k}"] = np.asarray(v)
    for k, v in state.velocity.items():
        out[f"velocity/{k}"] = np.asarray(v)
    if state.ema is not None:
        for k, v in flatten_tree(state.ema).items():
            out[f"ema/{k}"] = np.asarray(v)
    out["step"] = np.asarray(state.step)
    return out


def save_train_state(path: str, state) -> None:
    """Bundle params + velocity + EMA + step in one npz (the reference loses
    optimizer momentum and EMA on resume — SURVEY.md §5 failure-recovery)."""
    _write_npz_atomic(path, _state_to_flat(state))


class AsyncCheckpointer:
    """Overlap checkpoint serialization/IO with training.

    The device->host fetch stays synchronous (the next step DONATES the
    state buffers, so they must be read before it dispatches), but the npz
    encode + disk write — the bulk of the wall time for a ~180 MB bundle —
    run on a background thread.  One write in flight at a time: a new save
    joins the previous one first, so checkpoints land in order.  Writes are
    atomic (tmp + rename), so a crash mid-write never corrupts the newest
    checkpoint.  Call ``wait()`` before reading a just-saved file.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def _submit(self, fn) -> None:
        self.wait()
        self._thread = threading.Thread(target=fn, daemon=False)
        self._thread.start()

    def save_params(self, path: str, params: Dict[str, Any]) -> None:
        flat = {k: np.asarray(v) for k, v in flatten_tree(params).items()}
        self._submit(lambda: _write_npz_atomic(path, flat))

    def save_state(self, path: str, state) -> None:
        flat = _state_to_flat(state)
        self._submit(lambda: _write_npz_atomic(path, flat))


def load_train_state(path: str, state):
    """Restore a full-state bundle into the structure of ``state``.

    Applies the same unknown-key/shape-mismatch skip rule as
    ``load_params_npz`` to every section: a bundle saved under a different
    config (num_classes, freeze_at, ...) must not inject wrong-shape or
    structurally-unknown leaves — those would only surface later as opaque
    jit shape errors or a treedef mismatch inside the optimizer update.
    """
    from ..train.train_step import TrainState

    data = np.load(path)
    params = dict(flatten_tree(state.params))
    velocity = dict(state.velocity)
    ema = dict(state.ema) if state.ema is not None else None
    step = state.step
    skipped = []

    def take(dst, key, k):
        if dst is None or key not in dst or (
                tuple(np.shape(dst[key])) != tuple(data[k].shape)):
            skipped.append(k)
            return
        dst[key] = jnp.asarray(data[k])

    for k in data.files:
        if k.startswith("params/"):
            take(params, k[len("params/"):], k)
        elif k.startswith("velocity/"):
            take(velocity, k[len("velocity/"):], k)
        elif k.startswith("ema/"):
            # pre-r3 bundles shadowed EVERY leaf (incl. BN stats); the
            # key-membership check keeps only the trainable shadows
            take(ema, k[len("ema/"):], k)
        elif k == "step":
            step = jnp.asarray(data[k])
        else:
            skipped.append(k)
    if skipped:
        print(f"[checkpoint] resume skipped {len(skipped)} keys "
              f"(shape mismatch / unknown): {skipped[:5]}...")
    return TrainState(unflatten_tree(params), velocity, ema, step)


def resume_step_from_filename(path: str) -> Optional[int]:
    """Parse the iter id out of 'step%08d' names (reference train.py:259-261)."""
    m = re.search(r"step(\d{8})", os.path.basename(path))
    return int(m.group(1)) if m else None


def gc_checkpoints(directory: str, keep: int = 10, pattern: str = "step*.npz"):
    """Keep only the newest ``keep`` checkpoints (reference train.py:467-477).

    In-flight/orphaned atomic-write temporaries ('...npz.tmp.npz' — np.savez
    forces the trailing .npz) also match 'step*.npz'; they are excluded so a
    crash-orphaned tmp neither counts toward ``keep`` nor gets a concurrent
    writer's tmp removed out from under its os.replace.
    """
    files = sorted(f for f in glob.glob(os.path.join(directory, pattern))
                   if not f.endswith(".tmp.npz"))
    for f in files[:-keep]:
        os.remove(f)
