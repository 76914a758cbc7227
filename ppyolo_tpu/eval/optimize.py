"""Inference-time graph optimizations: BN folding + precision casting.

``fold_bn_params`` folds every conv's BatchNorm into the conv kernel
(w' = w * scale/sqrt(var+eps), b' = bias - mean*scale/sqrt(var+eps)) and
rewrites the BN leaves to the identity transform — the tree structure is
unchanged, so the same ``apply`` runs, but the normalize collapses to a
bias-add that XLA fuses into the conv epilogue, halving the HBM-bound
elementwise work.

``cast_params`` casts float leaves to a compute dtype (bf16 doubles MXU
throughput and halves weight/activation HBM traffic on TPU).  The decode +
Matrix-NMS epilogue stays fp32 (head.get_prediction casts raw maps up), so
box coordinates keep full precision.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import BN_EPS
from ..ops.module import Ctx, flatten_tree, unflatten_tree


def fold_bn_params(params: Dict[str, Any], eps: float = BN_EPS) -> Dict[str, Any]:
    """Fold conv+BN pairs in-place-by-copy.  Works on the whole tree: any
    module subtree holding both 'conv' and 'bn' children is folded."""
    flat = flatten_tree(params)
    # group by conv-module path
    bn_mods = sorted({k[: -len(".bn.weight")] for k in flat
                      if k.endswith(".bn.weight")})
    for mod in bn_mods:
        scale = np.asarray(flat[f"{mod}.bn.weight"], np.float64)
        bias = np.asarray(flat[f"{mod}.bn.bias"], np.float64)
        mean = np.asarray(flat[f"{mod}.bn.running_mean"], np.float64)
        var = np.asarray(flat[f"{mod}.bn.running_var"], np.float64)
        k = scale / np.sqrt(var + eps)
        wkey = (f"{mod}.conv.dcn_weight" if f"{mod}.conv.dcn_weight" in flat
                else f"{mod}.conv.weight")
        if wkey not in flat:
            continue
        w = np.asarray(flat[wkey], np.float64)
        flat[wkey] = jnp.asarray((w * k).astype(np.float32))       # HWIO: k over O
        flat[f"{mod}.bn.weight"] = jnp.ones_like(jnp.asarray(scale, jnp.float32))
        flat[f"{mod}.bn.bias"] = jnp.asarray(
            (bias - mean * k).astype(np.float32))
        flat[f"{mod}.bn.running_mean"] = jnp.zeros_like(
            jnp.asarray(mean, jnp.float32))
        flat[f"{mod}.bn.running_var"] = jnp.full_like(
            jnp.asarray(var, jnp.float32), 1.0 - eps)
    return unflatten_tree(flat)


def cast_params(params: Dict[str, Any], dtype,
                keep_fp32_suffixes=()) -> Dict[str, Any]:
    flat = flatten_tree(params)
    for k, v in flat.items():
        if v.dtype == jnp.float32 and not any(
                k.endswith(s) for s in keep_fp32_suffixes):
            flat[k] = v.astype(dtype)
    return unflatten_tree(flat)


# Never int8-quantized: the deep-stem convs (they run through the fused
# Pallas stem kernel, ops/stem_pallas.py, which folds float weights), and —
# implicitly, by the has-BN rule below — the head's output-logit convs
# (bias=True, norm=None) and the DCN offset/weight leaves (different key
# names), both precision-sensitive.
INT8_SKIP_PREFIXES = ("backbone.stage1_conv1_",)


def quantize_params_int8(params: Dict[str, Any],
                         skip_prefixes=INT8_SKIP_PREFIXES,
                         act_scales: Dict[str, float] = None,
                         min_k: int = 128) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 weight quantization for every
    BN-carrying plain conv.  Rewrites ``<mod>.conv.weight`` to int8 and adds
    a ``<mod>.conv.weight_scale`` [O] fp32 leaf; ConvNormAct.apply dispatches
    on the weight dtype (ops/conv.py::quantized_conv2d).  Call AFTER
    fold_bn_params so the BN scale is inside the weight being quantized.

    ``min_k`` skips convs whose contraction dim k*k*cin < 128: they underfill
    the 128-wide MXU and measured SLOWER in int8 than bf16 on v5e (the
    stage-2 cin=64 1x1s: 0.83x, tools/probe_int8.py) — quantizing them would
    cost accuracy for negative speed.

    ``act_scales`` (from ``calibrate_act_scales``) optionally pins static
    per-conv activation scales as ``<mod>.conv.act_scale`` leaves; without
    them the activation scale is computed dynamically per tensor at run
    time (ops/conv.py::quantized_conv2d)."""
    flat = flatten_tree(params)
    for wkey in [k for k in flat if k.endswith(".conv.weight")]:
        mod = wkey[: -len(".conv.weight")]
        if any(mod.startswith(p) for p in skip_prefixes):
            continue
        if f"{mod}.bn.weight" not in flat:
            continue
        w = np.asarray(flat[wkey], np.float32)  # HWIO
        if w.shape[0] * w.shape[1] * w.shape[2] < min_k:
            continue
        s = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        flat[wkey] = jnp.asarray(
            np.clip(np.round(w / s), -127, 127).astype(np.int8))
        flat[f"{mod}.conv.weight_scale"] = jnp.asarray(s.astype(np.float32))
        if act_scales and mod in act_scales:
            flat[f"{mod}.conv.act_scale"] = jnp.asarray(
                np.float32(act_scales[mod]))
    return unflatten_tree(flat)


def calibrate_act_scales(model, params: Dict[str, Any], images,
                         ctx_kwargs=None, preprocess=None) -> Dict[str, float]:
    """Record per-conv input abs-max over a calibration batch set and turn
    it into static activation scales (amax/127) for quantize_params_int8.

    ``params`` should be the BN-folded float (fp32/bf16) params so the
    recorded ranges match what the int8 model will see; ``images`` is an
    iterable of normalized [B,H,W,3] arrays (or raw arrays if ``preprocess``
    is given — it runs inside the jitted record forward).  This is the ONE
    implementation of the amax->scale rule; Detector.calibrate delegates
    here."""
    def fwd(p, x):
        rec: Dict[str, Any] = {}
        if preprocess is not None:
            x = preprocess(x)
        model.outputs(p, x, Ctx(train=False, record=rec,
                                **(ctx_kwargs or {})))
        return rec
    fwd_j = jax.jit(fwd)
    amax: Dict[str, float] = {}
    for x in images:
        rec = jax.device_get(fwd_j(params, jnp.asarray(x)))
        for k, v in rec.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return {k: max(v, 1e-6) / 127.0 for k, v in amax.items()}


def optimize_for_inference(params: Dict[str, Any], *, precision: str = "fp32",
                           fold_bn: bool = True) -> Dict[str, Any]:
    assert precision in ("fp32", "bf16", "int8"), precision
    if fold_bn:
        params = fold_bn_params(params)
    if precision == "int8":
        # int8 MXU matmuls (2x bf16 peak) for the BN-folded convs; bf16
        # activations/other weights; dequant scales stay fp32
        params = quantize_params_int8(params)
        params = cast_params(params, jnp.bfloat16,
                             keep_fp32_suffixes=(".weight_scale", ".act_scale"))
    elif precision == "bf16":
        params = cast_params(params, jnp.bfloat16)
    return params
