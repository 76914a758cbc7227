"""Module-lite: a minimal functional layer system for JAX.

Each layer is a cheap Python descriptor with

    init(key)                          -> nested param dict (pytree)
    apply(params, x, *, ctx)           -> y

All compute is pure jax; descriptors only hold static config.  Params live in
one nested dict whose dotted paths intentionally mirror the reference
PyTorch ``state_dict`` names (e.g. ``backbone.stage2_0.conv1.conv.weight``)
so checkpoint conversion is a pure name/layout map
(cf. reference 1_ppyolo_2x_2pytorch.py, train.py:156-169).

Non-trainable state (BN running stats) lives in the same tree; modules record
freshly-computed statistics into ``ctx.updates`` at trace time and the train
step merges them back — one tree, explicit state, fully functional under jit.

Per-parameter optimizer policy (the reference's ``add_param_group`` scheme,
custom_layers.py:167-241) is produced by ``param_policy()`` as a tree of
(lr_mult, wd_mult, trainable) matching the param tree.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax


@dataclasses.dataclass
class Ctx:
    """Per-call context threaded through ``apply``.

    train:    train-mode flag (BN batch stats, DropBlock active).
    rng:      base PRNG key for stochastic layers (DropBlock); each layer
              folds in a unique static id.
    updates:  dict collecting state updates {dotted_path: new_value} during
              trace; None disables collection (e.g. eval).
    axis_name: data-parallel mesh axis name for sync-BN psum, or None.
    record:   dict collecting per-conv input abs-max {module_path: amax}
              during trace (int8 calibration, eval/optimize.py); None
              disables collection.
    """

    train: bool = False
    rng: Optional[jax.Array] = None
    updates: Optional[Dict[str, jax.Array]] = None
    axis_name: Optional[str] = None
    record: Optional[Dict[str, jax.Array]] = None

    def layer_rng(self, uid: int) -> jax.Array:
        assert self.rng is not None, "stochastic layer needs ctx.rng"
        return jax.random.fold_in(self.rng, uid)


# --------------------------------------------------------------------------
# tree path helpers
# --------------------------------------------------------------------------

def tree_get(tree: Dict[str, Any], path: str):
    node = tree
    for seg in path.split("."):
        node = node[seg]
    return node


def tree_set(tree: Dict[str, Any], path: str, value) -> None:
    segs = path.split(".")
    node = tree
    for seg in segs[:-1]:
        node = node.setdefault(seg, {})
    node[segs[-1]] = value


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, p))
        else:
            out[p] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        tree_set(tree, path, v)
    return tree


def merge_updates(params: Dict[str, Any], updates: Dict[str, Any]) -> Dict[str, Any]:
    """Return a copy of ``params`` with {dotted_path: value} updates applied."""
    flat = flatten_tree(params)
    flat.update(updates)
    return unflatten_tree(flat)


@dataclasses.dataclass(frozen=True)
class ParamPolicy:
    """Optimizer policy for one parameter leaf (reference custom_layers.py:167-241)."""

    lr_mult: float = 1.0
    wd_mult: float = 1.0
    trainable: bool = True


class Module:
    """Base descriptor. Subclasses define ``init``/``apply`` and may carry
    children; ``param_policy`` returns the per-leaf optimizer policy tree."""

    name: str = ""

    def init(self, key: jax.Array) -> Dict[str, Any]:
        raise NotImplementedError

    def apply(self, params: Dict[str, Any], x, ctx: Ctx):
        raise NotImplementedError

    def param_policy(self) -> Dict[str, Any]:
        return {}


_UID_COUNTER = [0]


def next_uid() -> int:
    """Process-global static id generator for stochastic layers."""
    _UID_COUNTER[0] += 1
    return _UID_COUNTER[0]


def make_contextvar_override(name: str, allowed: tuple, default: str):
    """A (ContextVar, context-manager) pair for trace-time mode switches.

    ContextVar (not a module global) so concurrent tracing in another
    thread can't observe a different override mid-trace.  Used for the
    DCN implementation switch (ops/conv.py::dcn_impl) and the head
    virtual-concat mode (models/head.py::head_decompose).
    """
    import contextvars

    var = contextvars.ContextVar(name, default=default)

    class _override:
        def __init__(self, value: str):
            assert value in allowed, (value, allowed)
            self.value = value

        def __enter__(self):
            self._token = var.set(self.value)
            return self

        def __exit__(self, *exc):
            var.reset(self._token)
            return False

    _override.__name__ = _override.__qualname__ = name.lower() + "_override"
    return var, _override
