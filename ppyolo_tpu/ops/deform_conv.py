"""Modulated deformable convolution v2 (DCNv2) for TPU, NHWC.

Re-derivation of the reference's vectorized pure-tensor DCNv2 math
(reference model/custom_layers.py:486-677, validated there against Paddle's
CUDA op via 1_test_dcn.py) as an XLA-friendly gather + one large matmul:

  1. A regular conv produces per-output-position offsets (y,x per tap) and a
     modulation mask (sigmoid), zero-initialised (custom_layers.py:506-511).
  2. Sampling position of tap (ki,kj) at output (i,j):
         p_y = i*stride - padding + ki + offset_y
         p_x = j*stride - padding + kj + offset_x
     clamped to the padded field [-padding, H-1+padding] exactly like the
     reference clamps to [0, H+2p-1] in padded coordinates
     (custom_layers.py:612-615).
  3. 4-corner bilinear sampling with zeros outside the true image (the
     reference samples a zero-padded copy; we instead mask out-of-bounds
     corners — bitwise the same values, no padded HBM copy).
  4. value * sigmoid(mask), then one [N*oH*oW, k2*C] x [k2*C, outC] matmul on
     the MXU (the reference's "equivalent 1x1 conv" trick,
     custom_layers.py:672-676).

Gradients are free via JAX autodiff (the reference needed a hand-written
CUDA backward, external/DCNv2/src/cuda/dcn_v2_cuda.cu:206-335).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def deform_conv2d(
    x: jax.Array,
    weight: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    *,
    stride: int = 1,
    padding: int = 1,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Apply modulated deformable conv.

    Args:
      x:      [N, H, W, C] input.
      weight: [kh, kw, C, outC] (HWIO).
      offset: [N, oH, oW, 2*kh*kw] raw offsets, channel order (y0,x0,y1,x1,...)
              per tap in row-major tap order (matches reference
              custom_layers.py:559,603-605).
      mask:   [N, oH, oW, kh*kw] raw (pre-sigmoid) modulation logits.
      stride, padding: conv geometry (padding = (k-1)//2 in PPYOLO).
      bias:   optional [outC].

    Returns: [N, oH, oW, outC].
    """
    N, H, W, C = x.shape
    kh, kw, _, out_c = weight.shape
    oH = (H + 2 * padding - (kh - 1) - 1) // stride + 1
    oW = (W + 2 * padding - (kw - 1) - 1) // stride + 1
    k2 = kh * kw
    f32 = jnp.float32

    # --- sampling positions --------------------------------------------------
    # base grid of tap centres (output position * stride - padding + tap index)
    iy = jnp.arange(oH, dtype=f32) * stride - padding          # [oH]
    ix = jnp.arange(oW, dtype=f32) * stride - padding          # [oW]
    ky = jnp.arange(kh, dtype=f32)                             # [kh]
    kx = jnp.arange(kw, dtype=f32)                             # [kw]
    base_y = iy[:, None, None] + ky[None, :, None]             # [oH, kh, 1]
    base_x = ix[:, None, None] + kx[None, None, :]             # [oW, 1, kw] -> fix below
    base_y = jnp.broadcast_to(base_y, (oH, kh, kw)).reshape(oH, k2)
    base_x = jnp.broadcast_to(ix[:, None, None] + kx[None, None, :], (oW, kh, kw)).reshape(oW, k2)

    off = offset.reshape(N, oH, oW, k2, 2)
    pos_y = base_y[None, :, None, :] + off[..., 0]             # [N, oH, oW, k2]
    pos_x = base_x[None, None, :, :] + off[..., 1]
    # clamp to the padded field (reference custom_layers.py:614-615)
    pos_y = jnp.clip(pos_y, -float(padding), float(H - 1 + padding))
    pos_x = jnp.clip(pos_x, -float(padding), float(W - 1 + padding))

    y0 = jnp.floor(pos_y)
    x0 = jnp.floor(pos_x)
    ly = pos_y - y0
    lx = pos_x - x0

    xf = x.reshape(N, H * W, C)

    def corner(yc, xc):
        """Bilinear corner value with zeros outside the true image."""
        valid = ((yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1))
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        idx = (yi * W + xi).reshape(N, oH * oW * k2)
        v = jnp.take_along_axis(xf, idx[:, :, None], axis=1)   # [N, oS*k2, C]
        v = v.reshape(N, oH, oW, k2, C)
        return v * valid[..., None].astype(x.dtype)

    w1 = ((1.0 - ly) * (1.0 - lx))[..., None]
    w2 = ((1.0 - ly) * lx)[..., None]
    w3 = (ly * (1.0 - lx))[..., None]
    w4 = (ly * lx)[..., None]
    val = (
        w1 * corner(y0, x0)
        + w2 * corner(y0, x0 + 1)
        + w3 * corner(y0 + 1, x0)
        + w4 * corner(y0 + 1, x0 + 1)
    )                                                           # [N,oH,oW,k2,C]

    m = jax.nn.sigmoid(mask)[..., None]                         # [N,oH,oW,k2,1]
    val = val * m

    # --- contraction: one big MXU matmul ------------------------------------
    # val tap-major (kh,kw) then channel — matches HWIO flatten order.
    lhs = val.astype(x.dtype).reshape(N * oH * oW, k2 * C)
    rhs = weight.reshape(k2 * C, out_c)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    out = lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())), preferred_element_type=pet
    ).astype(x.dtype)
    out = out.reshape(N, oH, oW, out_c)
    if bias is not None:
        out = out + bias
    return out
