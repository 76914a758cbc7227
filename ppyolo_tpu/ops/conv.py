"""ConvNormAct — the universal conv(+DCN) + norm + activation cell.

TPU-native equivalent of the reference ``Conv2dUnit``
(model/custom_layers.py:65-253): one cell used by every backbone/head layer,
carrying the per-parameter optimizer policy (lr multipliers, no-decay rule
for norm params and conv biases — custom_layers.py:167-241) and the freeze
flag (custom_layers.py:142-165) as a static policy tree instead of
``requires_grad`` mutation.

Layout: NHWC activations, HWIO weights.  Norms: bn / sync_bn (real psum
cross-replica sync — the reference silently aliases sync_bn to bn,
custom_layers.py:26-29) / gn / affine_channel (custom_layers.py:46-62).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .module import Ctx, Module, ParamPolicy, make_contextvar_override
from .deform_conv import deform_conv2d

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch convention: running = (1-m)*running + m*batch

# DCN implementation override (read at trace time):
#   auto   — Pallas kernels on TPU, jnp gather elsewhere (the default)
#   pallas — force the Pallas kernels
#   onehot — one-hot-matmul in plain XLA: no custom calls, so the traced
#            program is pure StableHLO (required for jax.export artifacts —
#            serialized mosaic custom-calls fault this runtime's worker)
#   gather — the jnp gather formulation
# Stored in a ContextVar so concurrent tracing in another thread (e.g. the
# in-training eval detector while an export runs) can't observe a different
# thread's override mid-trace.
DCN_IMPL, dcn_impl = make_contextvar_override(
    "DCN_IMPL", ("auto", "pallas", "onehot", "gather"), "auto")


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def apply_act(x, act: Optional[str]):
    if act is None:
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "leaky":
        return jax.nn.leaky_relu(x, negative_slope=0.1)
    if act == "mish":
        return mish(x)
    raise NotImplementedError(f"Activation '{act}' is not implemented.")


def conv2d(x, w, *, stride: int = 1, padding: int = 0, bias=None):
    """Plain NHWC/HWIO conv with symmetric padding.

    For bf16 operands the MXU accumulates in fp32 natively; requesting
    ``preferred_element_type=f32`` there would break the transpose (weight
    gradient) rule with mixed dtypes, so it is only set for fp32 inputs.

    NOTE (r3 measured no-go): the stem conv1_1 (3x3/s2, cin=3) lowers at
    ~0.7% MXU (0.95 ms/batch b8@608 = 11% of the backbone).  Two exact
    space-to-depth rewrites (2x2/s1 conv on packed [.,304,304,12] input)
    halved the conv itself (0.59 ms) but the packing data movement cost
    MORE on this backend: reshape/transpose pack +1.3 ms/batch of layout
    copies, strided-slice+concat pack +4 ms/batch of slice fusions — both
    net regressions (full 12.96 -> 13.41 ms/batch).  Keep the direct
    lowering; see docs/DESIGN.md per-conv table.
    """
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def quantized_conv2d(x, wq, w_scale, *, stride: int = 1, padding: int = 0,
                     bias=None, act_scale=None):
    """int8 conv with per-tensor activation quantization.

    The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 peak (394 vs 197
    TOPS), so in int8 serving mode (eval/optimize.py::quantize_params_int8)
    conv weights are pre-quantized per-output-channel and the activation is
    quantized per tensor: dynamically (s_x = amax(|x|)/127, one reduction +
    an extra read of x) when ``act_scale`` is None, or with a calibrated
    static scale (eval/optimize.py::calibrate_act_scales) — the static form
    is pure elementwise work that XLA fuses into the producer's epilogue,
    so the bf16 tensor is read once and the quantize costs ~nothing.
    Symmetric quantization maps 0 -> 0, so SAME zero-padding is exact.
    Everything outside the conv itself stays in the compute dtype (bf16),
    and the s_x * w_scale dequant product is formed in fp32.
    """
    x32 = x.astype(jnp.float32)
    if act_scale is None:
        s_x = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-6) / 127.0
    else:
        s_x = act_scale.astype(jnp.float32)
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * (s_x * w_scale.astype(jnp.float32))).astype(
        x.dtype)
    if bias is not None:
        y = y + bias
    return y


def batch_norm(x, scale, bias, mean, var, *, train: bool, axis_name=None,
               eps: float = BN_EPS, momentum: float = BN_MOMENTUM):
    """BatchNorm over NHWC.  Returns (y, new_mean, new_var).

    Train mode normalizes with (possibly cross-replica) batch statistics and
    produces torch-convention running-stat updates (unbiased running var).
    ``axis_name`` set => real sync-BN via psum over the data mesh axis.
    """
    if not train:
        inv = lax.rsqrt(var + eps)
        y = (x - mean) * inv * scale + bias
        return y.astype(x.dtype), mean, var
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=(0, 1, 2))
    msq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    if axis_name is not None:
        m = lax.pmean(m, axis_name)
        msq = lax.pmean(msq, axis_name)
        n = n * lax.psum(1, axis_name)
    v = jnp.maximum(msq - jnp.square(m), 0.0)
    inv = lax.rsqrt(v + eps)
    y = (x32 - m) * inv * scale + bias
    unbiased = v * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * mean + momentum * m
    new_var = (1 - momentum) * var + momentum * unbiased
    return y.astype(x.dtype), new_mean, new_var


def group_norm(x, scale, bias, *, groups: int = 32, eps: float = BN_EPS):
    n, h, w, c = x.shape
    g = x.reshape(n, h, w, groups, c // groups).astype(jnp.float32)
    m = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    v = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    g = (g - m) * lax.rsqrt(v + eps)
    return (g.reshape(n, h, w, c) * scale + bias).astype(x.dtype)


class ConvNormAct(Module):
    """conv (or DCNv2) + {bn|sync_bn|gn|affine_channel|none} + {relu|leaky|mish|none}."""

    def __init__(
        self,
        cin: int,
        cout: int,
        ksize: int,
        *,
        stride: int = 1,
        bias: bool = False,
        norm: Optional[str] = None,
        groups: int = 32,
        act: Optional[str] = None,
        use_dcn: bool = False,
        lr_mult: float = 1.0,
        bias_lr_mult: Optional[float] = None,
        freeze_norm: bool = False,
        name: str = "",
    ):
        self.cin, self.cout, self.ksize, self.stride = cin, cout, ksize, stride
        self.padding = (ksize - 1) // 2
        self.has_bias = bias
        assert norm in (None, "bn", "sync_bn", "gn", "affine_channel")
        self.norm = norm
        self.groups = groups
        self.act = act
        self.use_dcn = use_dcn
        self.lr_mult = lr_mult
        self.bias_lr_mult = bias_lr_mult if bias_lr_mult is not None else lr_mult
        self.freeze_norm = freeze_norm
        self.name = name
        self.frozen = False  # set by backbone.freeze()

    # -- init ---------------------------------------------------------------
    def init(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        fan_in = self.cin * self.ksize * self.ksize
        p: Dict[str, Any] = {"conv": {}}
        if self.use_dcn:
            # offset/mask conv zero-init (reference custom_layers.py:510-511);
            # dcn weight xavier-normal (custom_layers.py:520-523)
            p["conv"]["conv_offset"] = {
                "weight": jnp.zeros(
                    (self.ksize, self.ksize, self.cin, 3 * self.ksize * self.ksize),
                    jnp.float32,
                ),
                "bias": jnp.zeros((3 * self.ksize * self.ksize,), jnp.float32),
            }
            std = (2.0 / (fan_in + self.cout * self.ksize * self.ksize)) ** 0.5
            p["conv"]["dcn_weight"] = (
                jax.random.normal(k1, (self.ksize, self.ksize, self.cin, self.cout)) * std
            )
        else:
            std = (2.0 / fan_in) ** 0.5  # kaiming-normal
            p["conv"]["weight"] = (
                jax.random.normal(k1, (self.ksize, self.ksize, self.cin, self.cout)) * std
            )
            if self.has_bias:
                p["conv"]["bias"] = jnp.zeros((self.cout,), jnp.float32)
        if self.norm in ("bn", "sync_bn"):
            p["bn"] = {
                "weight": jnp.ones((self.cout,), jnp.float32),
                "bias": jnp.zeros((self.cout,), jnp.float32),
                "running_mean": jnp.zeros((self.cout,), jnp.float32),
                "running_var": jnp.ones((self.cout,), jnp.float32),
            }
        elif self.norm == "gn":
            p["gn"] = {
                "weight": jnp.ones((self.cout,), jnp.float32),
                "bias": jnp.zeros((self.cout,), jnp.float32),
            }
        elif self.norm == "affine_channel":
            p["af"] = {
                "weight": jnp.ones((self.cout,), jnp.float32),
                "bias": jnp.zeros((self.cout,), jnp.float32),
            }
        return p

    # -- apply --------------------------------------------------------------
    def apply(self, params: Dict[str, Any], x, ctx: Ctx):
        c = params["conv"]
        if ctx.record is not None and not self.use_dcn:
            # int8 calibration: per-conv input abs-max (eval/optimize.py)
            ctx.record[self.name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        if self.use_dcn:
            om = conv2d(
                x,
                c["conv_offset"]["weight"],
                stride=self.stride,
                padding=self.padding,
                bias=c["conv_offset"]["bias"],
            )
            k2 = self.ksize * self.ksize
            impl = DCN_IMPL.get()
            if impl == "auto":
                impl = ("pallas" if jax.default_backend() == "tpu"
                        else "gather")
            if impl == "pallas":
                # Pallas one-hot-matmul kernels, forward AND backward (3-6x
                # the XLA gather lowering; col2im scatters become matmuls)
                from .deform_conv_pallas import deform_conv2d_fast as _dcn
            elif impl == "onehot":
                from .deform_conv_pallas import deform_conv2d_onehot as _dcn
            else:
                _dcn = deform_conv2d
            x = _dcn(
                x,
                c["dcn_weight"],
                om[..., : 2 * k2],
                om[..., 2 * k2 :],
                stride=self.stride,
                padding=self.padding,
                bias=c.get("dcn_bias"),
            )
        elif c["weight"].dtype == jnp.int8:
            # int8 serving mode (eval/optimize.py::quantize_params_int8)
            x = quantized_conv2d(
                x,
                c["weight"],
                c["weight_scale"],
                stride=self.stride,
                padding=self.padding,
                bias=c.get("bias"),
                act_scale=c.get("act_scale"),
            )
        else:
            x = conv2d(
                x,
                c["weight"],
                stride=self.stride,
                padding=self.padding,
                bias=c.get("bias"),
            )
        return self._norm_act(params, x, ctx)

    def _norm_act(self, params: Dict[str, Any], x, ctx: Ctx):
        if self.norm in ("bn", "sync_bn"):
            bn = params["bn"]
            axis = ctx.axis_name if self.norm == "sync_bn" else None
            # fall back to real cross-replica stats for plain bn too when an
            # axis is provided and the caller requested global sync
            # NOTE: freezing stops gradients only — BN stays in batch-stats
            # mode and keeps updating running stats, matching the reference
            # (freeze() flips requires_grad, not module mode;
            # custom_layers.py:142-165).  freeze_norm gates the affine params.
            y, nm, nv = batch_norm(
                x,
                bn["weight"],
                bn["bias"],
                bn["running_mean"],
                bn["running_var"],
                train=ctx.train,
                axis_name=axis,
            )
            if ctx.train and ctx.updates is not None:
                ctx.updates[f"{self.name}.bn.running_mean"] = nm
                ctx.updates[f"{self.name}.bn.running_var"] = nv
            x = y
        elif self.norm == "gn":
            x = group_norm(x, params["gn"]["weight"], params["gn"]["bias"], groups=self.groups)
        elif self.norm == "affine_channel":
            x = x * params["af"]["weight"] + params["af"]["bias"]
        return apply_act(x, self.act)

    def apply_parts(self, params: Dict[str, Any], parts, ctx: Ctx):
        """Apply over a VIRTUAL channel concat: ``parts`` is a list whose
        channels sum to ``cin``; the concat is never materialized.

        A conv is linear over its input channels and zero-padding pads every
        channel identically, so ``conv(concat(parts)) == Σ conv(part_i,
        W[:, :, off_i:off_i+c_i, :])`` exactly (up to fp summation order).
        This removes the head's concat relayouts (route||backbone feed,
        CoordConv's +2 channels, SPP's 4-way pyramid — reference
        head.py:389, custom_layers.py:272,290) — the [N,H,W,ΣC] tensor
        the concat would write and the conv re-read never hits HBM.
        Batch-1 parts (the CoordConv coordinate planes) broadcast through
        the sum instead of being tiled batch-wide.

        Serving-path only (models/head.py gates to eval-mode bf16, the
        same gate as the fused Pallas stem): summation order differs from
        the single fused conv, so the fp32 golden path keeps the concat.
        int8 weights and DCN fall back to the materialized form.
        """
        c = params["conv"]
        w = c.get("weight")
        if len(parts) == 1:
            return self.apply(params, parts[0], ctx)
        if self.use_dcn or w is None or w.dtype == jnp.int8:
            n = max(p.shape[0] for p in parts)
            full = [jnp.broadcast_to(p, (n,) + p.shape[1:]) for p in parts]
            return self.apply(params, jnp.concatenate(full, axis=-1), ctx)
        if ctx.record is not None:
            # int8 calibration: amax of the virtual concat == max of the
            # per-part amaxes
            ctx.record[self.name] = jnp.max(jnp.stack(
                [jnp.max(jnp.abs(p.astype(jnp.float32))) for p in parts]))
        off, y = 0, None
        for p in parts:
            pc = p.shape[-1]
            # fp32 partials: the MXU accumulates each conv in fp32 anyway;
            # asking for f32 output keeps the cross-part sum at ONE final
            # bf16 rounding (like the materialized concat) instead of one
            # per part.  This path is serving-only (never differentiated),
            # so preferred_element_type is safe here — cf. conv2d's
            # transpose-rule note for the general train path.
            yi = lax.conv_general_dilated(
                p, lax.slice_in_dim(w, off, off + pc, axis=2),
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = yi if y is None else y + yi
            off += pc
        assert off == self.cin, (off, self.cin)
        if c.get("bias") is not None:
            y = y + c["bias"].astype(jnp.float32)
        y = y.astype(parts[0].dtype)
        return self._norm_act(params, y, ctx)

    # -- optimizer policy ---------------------------------------------------
    def param_policy(self) -> Dict[str, Any]:
        t = not self.frozen
        pol: Dict[str, Any] = {"conv": {}}
        if self.use_dcn:
            # offset conv weight+bias and dcn weight all get weight decay
            # (reference custom_layers.py:182-200)
            pol["conv"]["conv_offset"] = {
                "weight": ParamPolicy(self.lr_mult, 1.0, t),
                "bias": ParamPolicy(self.lr_mult, 1.0, t),
            }
            pol["conv"]["dcn_weight"] = ParamPolicy(self.lr_mult, 1.0, t)
        else:
            pol["conv"]["weight"] = ParamPolicy(self.lr_mult, 1.0, t)
            if self.has_bias:
                # conv bias: own lr mult, never decayed (custom_layers.py:175-181)
                pol["conv"]["bias"] = ParamPolicy(self.bias_lr_mult, 0.0, t)
        tn = t and not self.freeze_norm
        if self.norm in ("bn", "sync_bn"):
            pol["bn"] = {
                "weight": ParamPolicy(self.lr_mult, 0.0, tn),
                "bias": ParamPolicy(self.lr_mult, 0.0, tn),
                "running_mean": ParamPolicy(0.0, 0.0, False),
                "running_var": ParamPolicy(0.0, 0.0, False),
            }
        elif self.norm == "gn":
            pol["gn"] = {
                "weight": ParamPolicy(self.lr_mult, 0.0, tn),
                "bias": ParamPolicy(self.lr_mult, 0.0, tn),
            }
        elif self.norm == "affine_channel":
            pol["af"] = {
                "weight": ParamPolicy(self.lr_mult, 0.0, tn),
                "bias": ParamPolicy(self.lr_mult, 0.0, tn),
            }
        return pol
