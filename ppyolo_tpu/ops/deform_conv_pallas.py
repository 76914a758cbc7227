"""Pallas TPU kernel for modulated deformable conv v2 (DCNv2).

XLA's gather lowering on TPU is the bottleneck of the jnp formulation
(measured ~25x the cost of the equivalent dense conv at PPYOLO stage-5
shapes).  This kernel reformulates the irregular bilinear gather as a
ONE-HOT MATMUL, which runs on the MXU:

  For output tile P (flattened oH*oW) and tap k, build a selection matrix
  S[P, Q] = sum_c w_c * onehot(idx_c)  (4 bilinear corners, Q = H*W),
  then   sampled[P, C]   = S @ x_flat[Q, C]          (MXU)
         out[P, outC]   += (sampled * mask_k) @ W_k  (MXU)

Grid = (N, k2): the input tile and output accumulator stay VMEM-resident
across the 9 tap iterations; nothing of size [P, k2, C] ever touches HBM
(the jnp version materializes four such corner tensors).

Numerics: S and the matmuls run in bf16 with fp32 accumulation; corner
indices/weights are computed in fp32 on the XLA side with exactly the
reference clamping semantics (custom_layers.py:612-615 in padded coords).

Backward: ``deform_conv2d_fast`` wraps the kernel in a custom_vjp.  The
default backward is a second Pallas kernel over the same (N, k2) grid
(replacing the CUDA col2im/col2im_coord scatter kernels,
dcn_v2_im2col_cuda.cu:197-327, with MXU matmuls):

  d_masked[n,k]  = g @ W_k^T                      (XLA batched matmul)
  d_mod[n,k,p]   = sum_c d_masked * (S @ x)       (kernel, VPU)
  d_sampled      = d_masked * mod                 (kernel)
  d_x[n]        += S^T @ d_sampled                (kernel, MXU — the col2im
                                                   scatter becomes a matmul)
  dS             = d_sampled @ x^T                (kernel, MXU)
  d_wgt[p,c]     = sum_q onehot_c * dS            (kernel, VPU)
  d_W[k]         = (S@x * mod)^T @ g              (XLA, from kernel-saved S@x)
  d_offset/mask  = jax.vjp of the corner tables fed (d_wgt, d_mod)

``bwd="onehot"`` falls back to XLA autodiff of ``deform_conv2d_onehot``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_conv import deform_conv2d


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corner_tables(offset, mask, H, W, oH, oW, kh, kw, stride, padding,
                   dtype=jnp.float32):
    """Per-(n, tap) corner indices/weights + modulation (``dtype`` on XLA side;
    fp32 for the kernel path, fp64 under jax_enable_x64 gradchecks).

    Returns idx [N,k2,P,4] int32, wgt [N,k2,P,4] dtype, mod [N,k2,P] dtype
    with P = oH*oW (unpadded).
    """
    N = offset.shape[0]
    k2 = kh * kw
    f32 = dtype
    iy = jnp.arange(oH, dtype=f32) * stride - padding
    ix = jnp.arange(oW, dtype=f32) * stride - padding
    ky = jnp.arange(kh, dtype=f32)
    kx = jnp.arange(kw, dtype=f32)
    base_y = (iy[:, None, None] + ky[None, :, None])          # [oH,kh,1]
    base_y = jnp.broadcast_to(base_y, (oH, kh, kw)).reshape(oH, k2)
    base_x = jnp.broadcast_to(ix[:, None, None] + kx[None, None, :],
                              (oW, kh, kw)).reshape(oW, k2)
    off = offset.astype(f32).reshape(N, oH, oW, k2, 2)
    pos_y = base_y[None, :, None, :] + off[..., 0]            # [N,oH,oW,k2]
    pos_x = base_x[None, None, :, :] + off[..., 1]
    pos_y = jnp.clip(pos_y, -float(padding), float(H - 1 + padding))
    pos_x = jnp.clip(pos_x, -float(padding), float(W - 1 + padding))
    y0 = jnp.floor(pos_y)
    x0 = jnp.floor(pos_x)
    ly = pos_y - y0
    lx = pos_x - x0

    idxs, wgts = [], []
    for dy, dx, wc in ((0, 0, (1 - ly) * (1 - lx)), (0, 1, (1 - ly) * lx),
                       (1, 0, ly * (1 - lx)), (1, 1, ly * lx)):
        yc = y0 + dy
        xc = x0 + dx
        valid = ((yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1))
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        idxs.append(yi * W + xi)
        wgts.append(wc * valid.astype(f32))
    idx = jnp.stack(idxs, -1)                                  # [N,oH,oW,k2,4]
    wgt = jnp.stack(wgts, -1)
    mod = jax.nn.sigmoid(mask.astype(f32)).reshape(N, oH * oW, k2)
    # -> [N, k2, P, 4] / [N, k2, P]
    idx = idx.reshape(N, oH * oW, k2, 4).transpose(0, 2, 1, 3)
    wgt = wgt.reshape(N, oH * oW, k2, 4).transpose(0, 2, 1, 3)
    mod = mod.transpose(0, 2, 1)[..., None]                    # [N,k2,P,1]
    return idx, wgt, mod


def deform_conv2d_onehot(x, weight, offset, mask, *, stride: int = 1,
                         padding: int = 1, bias=None):
    """Gather-free jnp DCNv2: the one-hot-matmul formulation in plain XLA.

    Same math as the Pallas kernel but with the selection tensors
    materialized ([N,k2,P,Q] bf16 in HBM) so XLA autodiff yields a backward
    made ENTIRELY of matmul transposes + elementwise ops — no gather in the
    forward, no scatter-add in the backward (XLA lowers both poorly on TPU;
    the jnp gather formulation's vjp is the slow path this replaces).
    Offset gradients flow through the bilinear corner weights (ly = p -
    floor(p) has d ly/d p = 1 a.e.), matching the CUDA coordinate-gradient
    semantics (dcn_v2_im2col_cuda.cu:83-124).
    """
    N, H, W, C = x.shape
    kh, kw, _, out_c = weight.shape
    k2 = kh * kw
    oH = (H + 2 * padding - (kh - 1) - 1) // stride + 1
    oW = (W + 2 * padding - (kw - 1) - 1) // stride + 1
    P, Q = oH * oW, H * W

    # accumulate in fp32, or fp64 when the inputs are fp64 (x64 gradchecks)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    idx, wgt, mod = _corner_tables(offset, mask, H, W, oH, oW, kh, kw,
                                   stride, padding, dtype=acc_t)
    row_q = jnp.arange(Q, dtype=jnp.int32)
    onehot = (idx[..., None] == row_q).astype(x.dtype)       # [N,k2,P,4,Q]
    s = jnp.einsum("nkpc,nkpcq->nkpq", wgt.astype(x.dtype), onehot)
    xf = x.reshape(N, Q, C)
    sampled = jnp.einsum("nkpq,nqc->nkpc", s, xf,
                         preferred_element_type=acc_t)        # [N,k2,P,C]
    sampled = sampled * mod                                   # [N,k2,P,1] bcast
    val = sampled.transpose(0, 2, 1, 3).reshape(N * P, k2 * C)
    out = jnp.dot(val.astype(x.dtype), weight.reshape(k2 * C, out_c),
                  preferred_element_type=acc_t)
    out = out.reshape(N, oH, oW, out_c).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _kernel(idx_ref, wgt_ref, mod_ref, x_ref, w_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    P, Q = idx_ref.shape[2], x_ref.shape[1]
    row_q = lax.broadcasted_iota(jnp.int32, (P, Q), 1)
    idx = idx_ref[0, 0]                                        # [P, 4]
    wgt = wgt_ref[0, 0]
    s = jnp.zeros((P, Q), jnp.float32)
    for c in range(4):
        sel = (row_q == idx[:, c:c + 1]).astype(jnp.float32)
        s = s + sel * wgt[:, c:c + 1]
    sampled = jnp.dot(s.astype(jnp.bfloat16), x_ref[0],
                      preferred_element_type=jnp.float32)      # [P, C]
    sampled = sampled * mod_ref[0, 0]                          # [P,1] bcast
    out = jnp.dot(sampled.astype(jnp.bfloat16), w_ref[0],
                  preferred_element_type=jnp.float32)          # [P, outC]
    out_ref[0] += out


def deform_conv2d_pallas(x, weight, offset, mask, *, stride: int = 1,
                         padding: int = 1, bias=None,
                         interpret: Optional[bool] = None):
    """Pallas forward of DCNv2 (same contract as ops.deform_conv.deform_conv2d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, C = x.shape
    kh, kw, _, out_c = weight.shape
    k2 = kh * kw
    oH = (H + 2 * padding - (kh - 1) - 1) // stride + 1
    oW = (W + 2 * padding - (kw - 1) - 1) // stride + 1
    P, Q = oH * oW, H * W
    Pp, Qp = _round_up(P, 8), _round_up(Q, 128)

    idx, wgt, mod = _corner_tables(offset, mask, H, W, oH, oW, kh, kw,
                                   stride, padding)
    idx = jnp.pad(idx, ((0, 0), (0, 0), (0, Pp - P), (0, 0)),
                  constant_values=-1)                      # -1 never matches
    wgt = jnp.pad(wgt, ((0, 0), (0, 0), (0, Pp - P), (0, 0)))
    mod = jnp.pad(mod, ((0, 0), (0, 0), (0, Pp - P), (0, 0)))
    xf = jnp.pad(x.reshape(N, Q, C).astype(jnp.bfloat16),
                 ((0, 0), (0, Qp - Q), (0, 0)))
    wk = weight.reshape(k2, C, out_c).astype(jnp.bfloat16)

    out = pl.pallas_call(
        _kernel,
        grid=(N, k2),
        in_specs=[
            pl.BlockSpec((1, 1, Pp, 4), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, 4), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, 1), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, C), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, out_c), lambda n, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Pp, out_c), lambda n, k: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Pp, out_c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # S@x (2*P*Q*C) + sampled@W_k (2*P*C*out_c), per (n, tap)
            flops=2 * N * k2 * Pp * C * (Qp + out_c),
            bytes_accessed=N * (Qp * C * 2 + k2 * Pp * 40) + k2 * C * out_c * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, wgt, mod, xf, wk)

    out = out[:, :P, :].reshape(N, oH, oW, out_c).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _bwd_kernel(idx_ref, wgt_ref, mod_ref, x_ref, dm_ref,
                dx_ref, dwgt_ref, dmod_ref, samp_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    P, Q = idx_ref.shape[2], x_ref.shape[1]
    row_q = lax.broadcasted_iota(jnp.int32, (P, Q), 1)
    idx = idx_ref[0, 0]                                        # [P, 4]
    wgt = wgt_ref[0, 0]
    x = x_ref[0]                                               # [Q, C] bf16
    dm = dm_ref[0, 0].astype(jnp.float32)                      # [P, C]

    # build S directly in bf16 — the MXU consumes it in bf16 either way
    sb = jnp.zeros((P, Q), jnp.bfloat16)
    for c in range(4):
        sel = (row_q == idx[:, c:c + 1])
        sb = sb + jnp.where(sel, wgt[:, c:c + 1], 0.0).astype(jnp.bfloat16)

    sampled = jnp.dot(sb, x, preferred_element_type=jnp.float32)   # [P, C]
    samp_ref[0, 0] = sampled.astype(jnp.bfloat16)
    dmod_ref[0, 0] = jnp.sum(dm * sampled, axis=-1, keepdims=True)
    dsamp = (dm * mod_ref[0, 0]).astype(jnp.bfloat16)              # [P, C]
    # col2im as a matmul: d_x += S^T @ d_sampled  (contract P)
    dx_ref[0] += lax.dot_general(sb, dsamp, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # col2im_coord: dS = d_sampled @ x^T (contract C), reduce per corner
    ds = lax.dot_general(dsamp, x, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)       # [P, Q]
    dwgt = [jnp.sum((row_q == idx[:, c:c + 1]).astype(jnp.float32) * ds,
                    axis=1) for c in range(4)]
    dwgt_ref[0, 0] = jnp.stack(dwgt, axis=-1)


def _dcn_bwd_pallas(x, weight, offset, mask, g, *, stride: int,
                    padding: int, interpret: Optional[bool] = None):
    """Pallas backward of DCNv2: (dx, dweight, doffset, dmask)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, C = x.shape
    kh, kw, _, out_c = weight.shape
    k2 = kh * kw
    oH = (H + 2 * padding - (kh - 1) - 1) // stride + 1
    oW = (W + 2 * padding - (kw - 1) - 1) // stride + 1
    P, Q = oH * oW, H * W
    Pp, Qp = _round_up(P, 8), _round_up(Q, 128)

    def tables(o, m):
        i_, w_, m_ = _corner_tables(o, m, H, W, oH, oW, kh, kw, stride,
                                    padding)
        return (w_, m_), i_   # idx as aux: one trace, no duplicate tables

    (wgt, mod), tab_vjp, idx = jax.vjp(tables, offset, mask, has_aux=True)
    idx = jnp.pad(idx, ((0, 0), (0, 0), (0, Pp - P), (0, 0)),
                  constant_values=-1)
    wgt_p = jnp.pad(wgt, ((0, 0), (0, 0), (0, Pp - P), (0, 0)))
    mod_p = jnp.pad(mod, ((0, 0), (0, 0), (0, Pp - P), (0, 0)))
    xf = jnp.pad(x.reshape(N, Q, C).astype(jnp.bfloat16),
                 ((0, 0), (0, Qp - Q), (0, 0)))
    gf = jnp.pad(g.reshape(N, P, out_c).astype(jnp.float32),
                 ((0, 0), (0, Pp - P), (0, 0)))
    wk = weight.reshape(k2, C, out_c)
    dm = jnp.einsum("npo,kco->nkpc", gf.astype(jnp.bfloat16),
                    wk.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    dx_p, dwgt_p, dmod_p, samp = pl.pallas_call(
        _bwd_kernel,
        grid=(N, k2),
        in_specs=[
            pl.BlockSpec((1, 1, Pp, 4), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, 4), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, 1), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, C), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, C), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Qp, C), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, 4), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, 1), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp, C), lambda n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Qp, C), jnp.float32),
            jax.ShapeDtypeStruct((N, k2, Pp, 4), jnp.float32),
            jax.ShapeDtypeStruct((N, k2, Pp, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, k2, Pp, C), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * k2 * Pp * (3 * Qp * C + Qp + 2 * C),
            bytes_accessed=N * (Qp * C * 6 + k2 * Pp * (8 * C + 48)),
            transcendentals=0,
        ),
        # stage-5-entry blocks (Qp=1536, C=512) need ~17.5 MB of scoped VMEM;
        # the 16 MB default is a compiler cap, not the v5e's 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, wgt_p, mod_p, xf, dm)

    dx = dx_p[:, :Q, :].reshape(N, H, W, C).astype(x.dtype)
    dw = jnp.einsum("nkpc,npo->kco", (samp * mod_p).astype(jnp.bfloat16),
                    gf.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(kh, kw, C, out_c).astype(weight.dtype)
    doff, dmask = tab_vjp((dwgt_p[:, :, :P, :], dmod_p[:, :, :P, :]))
    return dx, dw, doff.astype(offset.dtype), dmask.astype(mask.dtype)


def _make_dcn_fast(bwd: str):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def fn(x, weight, offset, mask, stride, padding):
        return deform_conv2d_pallas(x, weight, offset, mask, stride=stride,
                                    padding=padding)

    def fwd(x, weight, offset, mask, stride, padding):
        return fn(x, weight, offset, mask, stride, padding), \
            (x, weight, offset, mask)

    def bwd_fn(stride, padding, res, g):
        x, weight, offset, mask = res
        if bwd == "pallas":
            return _dcn_bwd_pallas(x, weight, offset, mask, g,
                                   stride=stride, padding=padding)
        # XLA autodiff of the one-hot formulation: matmul transposes, no
        # scatter-add, but materializes [N,k2,P,4,Q] selection tensors in HBM
        _, vjp = jax.vjp(
            lambda x_, w_, o_, m_: deform_conv2d_onehot(
                x_, w_, o_, m_, stride=stride, padding=padding),
            x, weight, offset, mask)
        return vjp(g)

    fn.defvjp(fwd, bwd_fn)
    return fn


_dcn_fast = _make_dcn_fast("pallas")
_dcn_fast_onehot_bwd = _make_dcn_fast("onehot")


def deform_conv2d_fast(x, weight, offset, mask, *, stride: int = 1,
                       padding: int = 1, bias=None, bwd: str = "pallas"):
    """Differentiable DCNv2, Pallas forward + Pallas backward kernels.

    ``bwd``: "pallas" (default) or "onehot" (XLA autodiff fallback).
    """
    fn = _dcn_fast if bwd == "pallas" else _dcn_fast_onehot_bwd
    out = fn(x, weight, offset, mask, stride, padding)
    if bias is not None:
        out = out + bias
    return out
