"""Checkpoint ingestion: reference .pt (torch) and Paddle .pdparams -> pytree.

Implements the exact name contract of the reference converters
(1_ppyolo_2x_2pytorch.py / 1_ppyolo_r18vd_2pytorch.py; SURVEY.md §3.4):

torch .pt:  state_dict paths are IDENTICAL to our param-tree paths by
construction (the module tree mirrors the reference attribute names,
including paramless ModuleList slots); only the weight layout changes —
conv kernels OIHW -> HWIO.

Paddle .pdparams:  Paddle layer names -> our conv modules via each
ConvNormAct's ``paddle_name``:
  backbone   conv:  '<p>_weights'          bn: 'bn'+<p>[3:]+'_scale|_offset|_mean|_variance'
             stem:  'conv1_i' -> bn 'bnv1_i_*'                 (converter :66-88)
             DCN:   '<p>_conv_offset.w_0|b_0', '<p>_weights'    (converter :112-135)
  head       conv:  '<p>.conv.weights'     bn: '<p>.bn.scale|offset|mean|var' (converter :219-316)
  out conv:  'yolo_output.{i}.conv.weights|bias'
"""
from __future__ import annotations

import pickle
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from ..ops.module import flatten_tree, unflatten_tree


_CONV_LEAVES = ("conv.weight", "conv_offset.weight", "dcn_weight")


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_torch_state_dict(sd: Dict[str, np.ndarray], params: Dict[str, Any],
                             *, verbose: bool = True) -> Dict[str, Any]:
    """Map a reference .pt state_dict into our param tree (shape-mismatch skip)."""
    flat = flatten_tree(params)
    loaded, skipped = 0, []
    for k, v in sd.items():
        if k not in flat:
            skipped.append(k)
            continue
        if v.ndim == 4 and any(k.endswith(s) for s in _CONV_LEAVES):
            v = _oihw_to_hwio(v)
        if tuple(v.shape) != tuple(flat[k].shape):
            skipped.append(k)
            continue
        flat[k] = jnp.asarray(np.ascontiguousarray(v, np.float32))
        loaded += 1
    if verbose and skipped:
        print(f"[convert] loaded {loaded}, skipped {len(skipped)}: {skipped[:5]}...")
    return unflatten_tree(flat)


def load_paddle_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pdparams file into {paddle_name: ndarray}.

    Prefers ``paddle.fluid`` when importable (the reference's own path,
    1_ppyolo_2x_2pytorch.py:30-34).  Without paddle, parses the actual
    on-disk layout that ``fluid.io.load_program_state`` consumes: Paddle's
    ``fluid.save`` / ``paddle.save`` write a protocol-2 pickle of
    {name: ndarray}, possibly

      * saved under Python 2 (pre-2020 model-zoo files) -> needs
        ``encoding='latin1'`` and may carry ``bytes`` keys,
      * carrying the dygraph sidecar key ``StructuredToParameterName@@``
        (a {structured_name: parameter_name} dict, not a weight),
      * holding paddle Tensor facades instead of plain ndarrays (anything
        ``__array__``-convertible is accepted).

    Raises ``ValueError`` with a diagnostic instead of silently filtering
    unknown layouts — the first real checkpoint must convert on the first
    try or fail loudly (round-2 VERDICT item #2).
    """
    try:
        import paddle.fluid as fluid  # pragma: no cover - paddle not in image
        return dict(fluid.io.load_program_state(path))
    except ImportError:
        pass
    with open(path, "rb") as f:
        try:
            obj = pickle.load(f, encoding="latin1")
        except Exception as e:
            raise ValueError(
                f"{path}: not a pickle stream ({type(e).__name__}: {e}); "
                "expected the fluid.save/paddle.save .pdparams layout "
                "(protocol-2 pickle of {name: ndarray})") from e
    if not isinstance(obj, dict):
        raise ValueError(
            f"{path}: unpickled to {type(obj).__name__}, expected a dict "
            "of {paddle_name: ndarray}")
    obj.pop("StructuredToParameterName@@", None)
    out: Dict[str, np.ndarray] = {}
    bad = []
    for k, v in obj.items():
        if isinstance(k, bytes):
            k = k.decode("utf-8")
        if isinstance(v, np.ndarray):
            out[k] = v
        elif isinstance(v, (list, tuple, int, float)) or hasattr(v, "__array__"):
            out[k] = np.asarray(v)
        else:
            bad.append((k, type(v).__name__))
    if bad:
        raise ValueError(
            f"{path}: {len(bad)} entries are not array-convertible "
            f"(unknown .pdparams layout?): {bad[:5]}")
    if not out:
        raise ValueError(f"{path}: no weights found in the pickled dict")
    return out


def _iter_convs(model):
    yield from model.backbone.iter_convs()
    yield from model.head.iter_convs()


def convert_paddle_state_dict(sd: Dict[str, np.ndarray], model, params,
                              *, verbose: bool = True) -> Dict[str, Any]:
    """Map Paddle layer names into our tree using each conv's paddle_name."""
    flat = flatten_tree(params)
    missing = []

    def put(tree_key: str, value: np.ndarray, conv_layout: bool):
        if value is None:
            missing.append(tree_key)
            return
        v = np.asarray(value, np.float32)
        if conv_layout and v.ndim == 4:
            v = _oihw_to_hwio(v)
        if tree_key not in flat or tuple(v.shape) != tuple(flat[tree_key].shape):
            missing.append(tree_key)
            return
        flat[tree_key] = jnp.asarray(np.ascontiguousarray(v))

    for conv in _iter_convs(model):
        p = getattr(conv, "paddle_name", "")
        t = conv.name  # dotted tree path of this conv module
        if not p or not t:
            continue
        if p.startswith("yolo_output"):
            put(f"{t}.conv.weight", sd.get(f"{p}.weights"), True)
            put(f"{t}.conv.bias", sd.get(f"{p}.bias"), False)
            continue
        if "." in p:  # head-style naming
            put(f"{t}.conv.weight", sd.get(f"{p}.conv.weights"), True)
            bn = {s: sd.get(f"{p}.bn.{ps}") for s, ps in
                  (("weight", "scale"), ("bias", "offset"),
                   ("running_mean", "mean"), ("running_var", "var"))}
        else:  # backbone-style naming
            bn_base = ("bnv" + p[len("conv"):] if p.startswith("conv1_")
                       else "bn" + p[len("res"):])
            if conv.use_dcn:
                put(f"{t}.conv.conv_offset.weight",
                    sd.get(f"{p}_conv_offset.w_0"), True)
                put(f"{t}.conv.conv_offset.bias",
                    sd.get(f"{p}_conv_offset.b_0"), False)
                put(f"{t}.conv.dcn_weight", sd.get(f"{p}_weights"), True)
            else:
                put(f"{t}.conv.weight", sd.get(f"{p}_weights"), True)
            bn = {s: sd.get(f"{bn_base}_{ps}") for s, ps in
                  (("weight", "scale"), ("bias", "offset"),
                   ("running_mean", "mean"), ("running_var", "variance"))}
        if conv.norm in ("bn", "sync_bn"):
            for leaf, val in bn.items():
                put(f"{t}.bn.{leaf}", val, False)

    if verbose and missing:
        print(f"[convert] {len(missing)} leaves not found/mismatched: "
              f"{missing[:5]}...")
    return unflatten_tree(flat)
