"""Small functional ops: pooling, CoordConv, SPP, DropBlock, upsample.

TPU-native equivalents of reference model/custom_layers.py:256-342 plus the
torch pooling/upsample layers used by the backbone and head.  All pure
functions over NHWC tensors; DropBlock draws from an explicit PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(x, ksize: int, stride: int, padding: int):
    """NHWC max pool, torch semantics (pad with -inf).

    Large stride-1 windows (SPP's 5/9/13) are decomposed into separable
    (k,1)+(1,k) passes — max is exactly separable, and 2k taps/element beats
    k^2 (13x13: 169 -> 26)."""
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    if stride == 1 and ksize > 3:
        y = lax.reduce_window(
            x, init, lax.max, (1, ksize, 1, 1), (1, 1, 1, 1),
            [(0, 0), (padding, padding), (0, 0), (0, 0)])
        return lax.reduce_window(
            y, init, lax.max, (1, 1, ksize, 1), (1, 1, 1, 1),
            [(0, 0), (0, 0), (padding, padding), (0, 0)])
    return lax.reduce_window(
        x,
        init,
        lax.max,
        (1, ksize, ksize, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def avg_pool2d(x, ksize: int, stride: int):
    """NHWC average pool, no padding (torch AvgPool2d(k, s, 0))."""
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, ksize, ksize, 1), (1, stride, stride, 1), "VALID"
    )
    return s / (ksize * ksize)


def upsample_nearest_2x(x):
    """Nearest-neighbour 2x upsample (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def coord_planes(h: int, w: int, dtype):
    """The CoordConv coordinate planes as one batch-1 [1,h,w,2] tensor.

    Values identical to the channels ``coord_conv`` appends; batch-1 so a
    decomposed conv over them broadcasts instead of materializing the
    [N,H,W,C+2] concat (ops/conv.py::ConvNormAct.apply_parts).
    """
    gx = jnp.arange(w, dtype=dtype) / (w - 1) * 2.0 - 1.0
    gy = jnp.arange(h, dtype=dtype) / (h - 1) * 2.0 - 1.0
    gx = jnp.broadcast_to(gx[None, None, :, None], (1, h, w, 1))
    gy = jnp.broadcast_to(gy[None, :, None, None], (1, h, w, 1))
    return jnp.concatenate([gx, gy], axis=-1)


def coord_conv(x):
    """Append normalized x/y coordinate channels (reference custom_layers.py:256-272).

    x-channel varies along W in [-1, 1]; y-channel along H.
    """
    n, h, w, _ = x.shape
    g = jnp.broadcast_to(coord_planes(h, w, x.dtype), (n, h, w, 2))
    return jnp.concatenate([x, g], axis=-1)


def spp_parts(x, seq: str = "asc"):
    """The SPP pyramid as a list (virtual concat) — see ``spp``."""
    x2 = max_pool2d(x, 5, 1, 2)
    x3 = max_pool2d(x, 9, 1, 4)
    x4 = max_pool2d(x, 13, 1, 6)
    return [x, x2, x3, x4] if seq == "asc" else [x4, x3, x2, x]


def spp(x, seq: str = "asc"):
    """Spatial pyramid pooling: concat [x, mp5, mp9, mp13] (custom_layers.py:275-290)."""
    return jnp.concatenate(spp_parts(x, seq), axis=-1)


def drop_block(x, rng: jax.Array, *, block_size: int = 3, keep_prob: float = 0.9,
               is_test: bool = False):
    """Block-wise dropout (reference custom_layers.py:293-342).

    Bernoulli seeds with rate gamma are dilated into block_size x block_size
    zero regions via max-pool, and the surviving activations are re-scaled by
    numel/kept-count.  The seed draw covers the full NHWC tensor including
    channels, matching the reference's ``torch.rand(input.shape)``.

    Note the reference pools with padding=1 regardless of block_size; we keep
    that exact behaviour (block_size==3 in every PPYOLO config).
    """
    if is_test:
        return x
    n, h, w, c = x.shape
    feat_area = float(h) ** 2
    useful = float(max(h - block_size + 1, 1)) ** 2  # guard tiny test grids
    gamma = feat_area * (1.0 - keep_prob) / (block_size * block_size * useful)
    seeds = (jax.random.uniform(rng, x.shape) < gamma).astype(x.dtype)
    dil = max_pool2d(seeds, block_size, 1, 1)
    mask = 1.0 - dil
    numel = float(n * h * w * c)
    return x * mask * numel / jnp.sum(mask)
