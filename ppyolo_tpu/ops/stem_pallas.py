"""Pallas TPU kernel fusing the ResNet-vd deep stem for inference.

The serving backbone's three stem convs (reference model/resnet_vd.py:100-108:
conv1_1 3->32/s2, conv1_2 32->32, conv1_3 32->64, then maxpool 3/s2) are its
worst-lowered ops: at b8@608 bf16 they cost ~2.25 ms/batch at 0.7-30% MXU
(docs/DESIGN.md per-conv table) because XLA pads the tiny contraction dims
(K=27/288) onto the 128-wide MXU and a space-to-depth rewrite at the XLA
level loses more to HBM packing copies than the conv saves (measured no-go,
ops/conv.py:82-89).

This kernel does the packing IN VMEM instead, so it never hits HBM:

  grid = (N, S4/R row blocks); each step computes R rows of the final
  pooled [S/4, S/4, 64] output from a (2R+6)-pair-row halo slab of the
  even/odd input row planes (whole planes resident in VMEM, revisited
  across row blocks).

  Each conv becomes a PIXEL-PACKED im2col matmul that fills the MXU's
  N dimension with adjacent output pixels:
    conv1_1: 16 px/row -> [M, 136] @ [136, 16*32=512]  (stride-2 via
             even/odd input-row planes; inputs channel-padded 3->4 so one
             sublane-row = 32 cols x 4ch = 128 lanes exactly)
    conv1_2:  4 px/row -> [M, 192] @ [192, 4*32=128]
    conv1_3:  4 px/row -> [M, 192] @ [192, 4*64=256]
  The im2col tensors are built with jnp.roll over the (row, group) sublane
  axis + lane concats on VMEM-resident values, with iota masks zeroing the
  group-edge/image-edge taps; the three k_h row taps of each conv are
  contiguous sublane slices of one im2col buffer, accumulated in fp32.

  The 3x3/s2 maxpool folds in at the end: column pooling via a sublane
  roll on the (4 px x 64 ch) layout, row pooling via pair reshapes whose
  lane dims are multiples of 128 (relu makes all values non-negative, so
  zero padding == -inf padding).

Mosaic layout rules this obeys (probed on this runtime, r3):
  * lane<->sublane reshapes only when BOTH lane dims are multiples of 128
  * ``pltpu.roll`` rejects bf16 — use ``jnp.roll`` (lowers cleanly)
  * dynamic sublane-slice offsets provably divisible by 8 (R multiple of 4)
  * static sublane/lane slices and iota/where masks are unrestricted

Eval-mode only (BN running stats fold into per-conv scale/bias; see
``fused_stem_reference`` for the exact math) and bf16-compute only (the
fp32 working set exceeds VMEM at 608; fp32 falls back to XLA).  Certified
against the unfused conv chain in tests/test_stem_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_TOP = 7   # input halo above row 0 (3 convs + pool of receptive field)
PAD_BOT = 5   # below row S-1 (4 needed; 5 keeps the padded height even)

# Implementation override (read at trace time, ContextVar for thread-safe
# tracing like ops.conv.DCN_IMPL):
#   auto   — the Pallas kernel on TPU eval-mode bf16 stems, XLA otherwise
#   pallas — force the kernel (interpret-mode off-TPU; used by tests)
#   xla    — always the unfused conv chain
import contextvars as _contextvars

STEM_IMPL = _contextvars.ContextVar("STEM_IMPL", default="auto")

# Per-grid-step output row count cap (tuning knob; see _largest_block_rows).
# Larger blocks amortize per-step overhead and halo recompute but grow the
# VMEM working set (~16 MB/core on v5e).
BLOCK_ROWS_CAP = _contextvars.ContextVar("BLOCK_ROWS_CAP", default=20)


class stem_impl:
    """Context manager pinning the stem implementation during tracing."""

    def __init__(self, name: str):
        assert name in ("auto", "pallas", "xla"), name
        self.name = name

    def __enter__(self):
        self._token = STEM_IMPL.set(self.name)
        return self

    def __exit__(self, *exc):
        STEM_IMPL.reset(self._token)
        return False


def _largest_block_rows(s4: int, cap: int = None) -> int:
    """Largest divisor of S4 (pooled rows) not exceeding ``cap`` — the
    per-grid-step output row count.  Must be a multiple of 4 so the input
    slab's dynamic sublane offset (2*R*rb) is provably divisible by 8
    (a Mosaic vector.load requirement).  Bounds the VMEM slab sizes."""
    if cap is None:
        cap = BLOCK_ROWS_CAP.get()
    for r in range(cap - cap % 4, 0, -4):
        if s4 % r == 0:
            return r
    return 0


def stem_shapes(size: int):
    s2, s4 = size // 2, size // 4
    return s2, s4, _largest_block_rows(s4)


def supports(size: int, dtype) -> bool:
    """Kernel preconditions: 32-divisible size (one sublane-row of the
    channel-padded input = 32 cols x 4 ch = exactly 128 lanes, the only
    lane->sublane reshape granularity Mosaic accepts), bf16 compute (fp32
    slabs exceed VMEM at 608), a useful block size."""
    if dtype != jnp.bfloat16:
        return False
    if size % 32 != 0:
        return False
    return _largest_block_rows(size // 4) >= 4


# -- weight packing (trace-time jnp; tiny tensors) ---------------------------

def _pack_w1(w1):
    """[3,3,3,32] HWIO -> [3, 136, 512] block-banded for 16-px packing.

    Output pixel p (0..15) in a 32-col quad reads quad-relative input cols
    2p-1+kw (stride 2); im2col lane layout is 4*(col+1) + channel (4th
    channel is zero padding), so tap (p, kw) lands at rows 4*(2p+kw)..+2,
    output lanes 32p..32p+31.  Rows 132..135 pad K to a sublane multiple
    of 8."""
    w1 = w1.astype(jnp.float32)
    out = jnp.zeros((3, 136, 512), jnp.float32)
    for p in range(16):
        for kw in range(3):
            r = 4 * (2 * p + kw)
            out = out.at[:, r:r + 3, 32 * p:32 * (p + 1)].set(w1[:, kw])
    return out


def _pack_w2(w2):
    """[3,3,32,32] -> [3, 192, 128].  Pixel p (0..3) at col 4g+p reads cols
    4g+p-1+kw; im2col lane layout 32*(col_offset+1) + channel with offset
    -1..4 relative to the group (left neighbor px, 4 group px, right)."""
    w2 = w2.astype(jnp.float32)
    out = jnp.zeros((3, 192, 128), jnp.float32)
    for p in range(4):
        for kw in range(3):
            r = 32 * (p + kw)
            out = out.at[:, r:r + 32, 32 * p:32 * (p + 1)].set(w2[:, kw])
    return out


def _pack_w3(w3):
    """[3,3,32,64] -> [3, 192, 256].  Same 4-px im2col as conv1_2 (6 cols x
    32 ch = 192 lanes); N = 4 px x 64 out channels = 256 lanes."""
    w3 = w3.astype(jnp.float32)
    out = jnp.zeros((3, 192, 256), jnp.float32)
    for p in range(4):
        for kw in range(3):
            r = 32 * (p + kw)
            out = out.at[:, r:r + 32, 64 * p:64 * (p + 1)].set(w3[:, kw])
    return out


# -- kernel ------------------------------------------------------------------

def _stem_kernel(xe_ref, xo_ref, w1_ref, w2_ref, w3_ref, b_ref, out_ref, *,
                 size: int, rows: int):
    """One (image, row-block) grid step.

    xe_ref/xo_ref [1, S/2+6, S*4]  channel-padded even/odd input row planes
                  (plane row i = padded row 2i / 2i+1 = image row 2i-7 / 2i-6)
    w*_ref packed weights (fp32), b_ref [8, 512] rows 0..2 = tiled biases
    out_ref [1, 1, rows, (size//4)*64]
    """
    S, R = size, rows
    S2, NQ = S // 2, S // 32        # conv1 out cols, 32-col quads per row
    G = S2 // 4                     # 4-px groups per row (= 4*NQ)
    npairs = 2 * R + 6
    rb = pl.program_id(1)
    cdt = xe_ref.dtype

    def w(ref, rows_used, kh):
        return ref[kh, 0:rows_used, :].astype(cdt)

    # conv1_1 im2col per plane: [npairs*NQ, 136]; quad q needs quad-relative
    # cols -1..31 (lane 4*(col+1)+ch); col -1 = previous quad's col 31.
    def im1(plane_ref):
        slab = plane_ref[0, pl.ds(2 * R * rb, npairs), :]  # [npairs, 4S]
        q = slab.reshape(npairs * NQ, 128)
        left = jnp.roll(q, 1, axis=0)[:, 124:128]
        qi = jax.lax.broadcasted_iota(jnp.int32, (npairs * NQ, 1), 0) % NQ
        left = jnp.where(qi == 0, jnp.zeros_like(left), left)
        pad = jnp.zeros((npairs * NQ, 4), cdt)
        return jnp.concatenate([left, q, pad], axis=1)     # [., 136]

    ime = im1(xe_ref)
    imo = im1(xo_ref)
    # conv1 out row k reads image rows 2k-1 (even-plane slab row r), 2k
    # (odd-plane r), 2k+1 (even-plane r+1) where k = 2*R*rb - 3 + r.
    m1q = (2 * R + 5) * NQ
    acc = jnp.dot(ime[0:m1q, :], w(w1_ref, 136, 0),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(imo[0:m1q, :], w(w1_ref, 136, 1),
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(ime[NQ:m1q + NQ, :], w(w1_ref, 136, 2),
                   preferred_element_type=jnp.float32)
    c1 = jax.nn.relu(acc + b_ref[0:1, :].astype(jnp.float32))
    # zero rows whose abs conv1 row is outside [0, S2): they are conv1_2's
    # zero padding, not relu(bias).
    r1 = jax.lax.broadcasted_iota(jnp.int32, (m1q, 1), 0) // NQ
    k1 = 2 * R * rb - 3 + r1
    c1 = jnp.where((k1 >= 0) & (k1 < S2), c1, 0.0).astype(cdt)  # [m1q, 512]
    m1 = (2 * R + 5) * G
    c1 = c1.reshape(m1, 128)        # rows -> (conv1 row, 4-px group)

    # conv1_2 im2col: 6 cols x 32 ch = 192 lanes; left/right neighbor pixels
    # via sublane rolls over the (row, group) axis with group-edge masks.
    def im_4px(c, m):
        gi = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % G
        left = jnp.roll(c, 1, axis=0)[:, 96:128]
        left = jnp.where(gi == 0, jnp.zeros_like(left), left)
        right = jnp.roll(c, -1, axis=0)[:, 0:32]
        right = jnp.where(gi == G - 1, jnp.zeros_like(right), right)
        return jnp.concatenate([left, c, right], axis=1)   # [m, 192]

    im2 = im_4px(c1, m1)
    m2 = (2 * R + 3) * G
    acc = jnp.dot(im2[0:m2, :], w(w2_ref, 192, 0),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(im2[G:m2 + G, :], w(w2_ref, 192, 1),
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(im2[2 * G:m2 + 2 * G, :], w(w2_ref, 192, 2),
                   preferred_element_type=jnp.float32)
    c2 = jax.nn.relu(acc + b_ref[1:2, 0:128].astype(jnp.float32))
    r2 = jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) // G
    k2 = 2 * R * rb - 2 + r2
    c2 = jnp.where((k2 >= 0) & (k2 < S2), c2, 0.0).astype(cdt)  # [m2, 128]

    # conv1_3: same 4-px im2col; N = 4 px x 64 ch = 256.
    im3 = im_4px(c2, m2)
    m3 = (2 * R + 1) * G
    acc = jnp.dot(im3[0:m3, :], w(w3_ref, 192, 0),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(im3[G:m3 + G, :], w(w3_ref, 192, 1),
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(im3[2 * G:m3 + 2 * G, :], w(w3_ref, 192, 2),
                   preferred_element_type=jnp.float32)
    c3 = jax.nn.relu(acc + b_ref[2:3, 0:256].astype(jnp.float32))
    r3 = jax.lax.broadcasted_iota(jnp.int32, (m3, 1), 0) // G
    k3 = 2 * R * rb - 1 + r3
    c3 = jnp.where((k3 >= 0) & (k3 < S2), c3, 0.0).astype(cdt)  # [m3, 256]

    # maxpool 3x3/s2/p1.  Columns: group g (cols 4g..4g+3) yields pooled
    # cols 2g (cols 4g-1,4g,4g+1) and 2g+1 (cols 4g+1..4g+3); col 4g-1 is
    # the previous group's last pixel (lanes 192:256).  relu output is
    # >= 0, so zero padding is equivalent to -inf padding.
    gi3 = jax.lax.broadcasted_iota(jnp.int32, (m3, 1), 0) % G
    lcol = jnp.roll(c3, 1, axis=0)[:, 192:256]
    lcol = jnp.where(gi3 == 0, jnp.zeros_like(lcol), lcol)
    v0 = jnp.maximum(jnp.maximum(lcol, c3[:, 0:64]), c3[:, 64:128])
    v1 = jnp.maximum(jnp.maximum(c3[:, 64:128], c3[:, 128:192]),
                     c3[:, 192:256])
    cm = jnp.concatenate([v0, v1], axis=1)                 # [m3, 128]
    # Rows: pooled row jj = max(c3 rows 2jj, 2jj+1, 2jj+2) (slab-relative).
    L = G * 128                                            # = S4 * 64
    cmr = cm.reshape(2 * R + 1, L)
    cmr = jnp.concatenate([cmr, jnp.zeros((1, L), cdt)], axis=0)
    paired = cmr.reshape(R + 1, 2 * L)
    evens = paired[:, 0:L]
    odds = paired[:, L:2 * L]
    pooled = jnp.maximum(jnp.maximum(evens[0:R, :], odds[0:R, :]),
                         evens[1:R + 1, :])                # [R, S4*64]
    out_ref[0, 0, :, :] = pooled


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_stem_call(xe, xo, w1p, w2p, w3p, b, *, interpret=False):
    B, hpp, lanes = xe.shape
    S = lanes // 4
    S2, S4, R = stem_shapes(S)
    grid = (B, S4 // R)
    kern = functools.partial(_stem_kernel, size=S, rows=R)
    flops = 2 * B * S2 * S2 * (27 * 32 + 9 * 32 * 32 + 9 * 32 * 64)
    plane_spec = pl.BlockSpec((1, hpp, lanes), lambda b_, r_: (b_, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            plane_spec,
            plane_spec,
            pl.BlockSpec((3, 136, 512), lambda b_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 192, 128), lambda b_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 192, 256), lambda b_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 512), lambda b_, r_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # 4D output (batch, row block, R, S4*64) so the block's trailing two
        # dims equal the array dims (Mosaic block-shape divisibility rule)
        out_specs=pl.BlockSpec((1, 1, R, S4 * 64),
                               lambda b_, r_: (b_, r_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S4 // R, R, S4 * 64), xe.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xe.size * 4 + B * S4 * S4 * 64 * 2,
            transcendentals=0),
        interpret=interpret,
    )(xe, xo, w1p, w2p, w3p, b)
    return out.reshape(B, S4, S4, 64)


def fused_stem(x, w1, b1, w2, b2, w3, b3, *, interpret: bool = False):
    """Fused conv1_1/conv1_2/conv1_3 (+bias +relu each) + maxpool 3x3/s2/p1.

    x [B,S,S,3] normalized input in the compute dtype; w_i HWIO with the
    eval-mode BN already folded to (w_i, b_i).  Returns [B,S/4,S/4,64].
    """
    B, S, _, _ = x.shape
    # Channel-pad 3->4 (one sublane-row = 32 cols x 4 ch = 128 lanes), pad
    # rows, split even/odd row planes.  Built as two strided-slice+pad
    # chains so XLA emits ONE fusable copy per plane (pad-whole-then-split
    # costs a third copy and 2x the movement — measured 2.17 ms/batch
    # standalone vs ~1.0 for this form; in-model both fuse into the
    # normalize producer).  Padded row j = image row j - PAD_TOP, so
    # even-plane row i = image row 2i-7 (odd image rows, 4 pad rows on
    # top) and odd-plane row i = image row 2i-6 (even image rows, 3 pad).
    hpp = (S + PAD_TOP + PAD_BOT) // 2
    xe = jnp.pad(x[:, 1::2], ((0, 0), (4, hpp - 4 - S // 2), (0, 0), (0, 1)))
    xo = jnp.pad(x[:, 0::2], ((0, 0), (3, hpp - 3 - S // 2), (0, 0), (0, 1)))
    xe = xe.reshape(B, hpp, S * 4)
    xo = xo.reshape(B, hpp, S * 4)
    b = jnp.zeros((8, 512), jnp.float32)
    b = b.at[0, :].set(jnp.tile(b1.astype(jnp.float32), 16))
    b = b.at[1, 0:128].set(jnp.tile(b2.astype(jnp.float32), 4))
    b = b.at[2, 0:256].set(jnp.tile(b3.astype(jnp.float32), 4))
    return _fused_stem_call(xe, xo, _pack_w1(w1), _pack_w2(w2), _pack_w3(w3),
                            b, interpret=interpret)


def _fold_eval_bn(mod, p):
    """Eval-mode conv+BN of one stem ConvNormAct as (w_eff, b_eff fp32).

    BN in eval mode is a per-channel affine, so it folds exactly:
    w' = w * scale/sqrt(var+eps), b' = bias - mean*scale/sqrt(var+eps)
    (+ conv bias if present).  On already-BN-folded serving params
    (eval/optimize.py) var == 1-eps and mean == 0, so this is the identity.
    """
    from .conv import BN_EPS
    w = p["conv"]["weight"]
    bn = p["bn"]
    k = (bn["weight"].astype(jnp.float32)
         * jax.lax.rsqrt(bn["running_var"].astype(jnp.float32) + BN_EPS))
    w_eff = (w.astype(jnp.float32) * k).astype(w.dtype)
    b_eff = (bn["bias"].astype(jnp.float32)
             - bn["running_mean"].astype(jnp.float32) * k)
    if "bias" in p["conv"]:
        b_eff = b_eff + p["conv"]["bias"].astype(jnp.float32)
    return w_eff, b_eff


def stem_eligible(mods, x, train: bool) -> bool:
    """Can the fused kernel replace these three stem ConvNormActs?"""
    impl = STEM_IMPL.get()
    if impl == "xla" or train:
        return False
    if x.shape[1] != x.shape[2] or not supports(x.shape[1], x.dtype):
        return False
    for i, m in enumerate(mods):
        if (m.norm not in ("bn", "sync_bn") or m.use_dcn or m.ksize != 3
                or m.act != "relu"):
            return False
    if [m.stride for m in mods] != [2, 1, 1]:
        return False
    if [(m.cin, m.cout) for m in mods] != [(3, 32), (32, 32), (32, 64)]:
        return False
    if impl == "auto" and jax.default_backend() != "tpu":
        return False
    return True


def apply_fused_stem(mods, params_list, x):
    """conv1_1..conv1_3 (+BN +relu) + maxpool via the fused kernel.
    Caller must have checked ``stem_eligible``."""
    ws = []
    for m, p in zip(mods, params_list):
        ws.extend(_fold_eval_bn(m, p))
    interpret = jax.default_backend() != "tpu"
    return fused_stem(x, *ws, interpret=interpret)


def fused_stem_reference(x, w1, b1, w2, b2, w3, b3):
    """jnp oracle: the exact unfused op chain the kernel replaces."""
    from .conv import conv2d
    from .blocks import max_pool2d
    y = jax.nn.relu(conv2d(x, w1.astype(x.dtype), stride=2, padding=1)
                    + b1.astype(x.dtype))
    y = jax.nn.relu(conv2d(y, w2.astype(x.dtype), stride=1, padding=1)
                    + b2.astype(x.dtype))
    y = jax.nn.relu(conv2d(y, w3.astype(x.dtype), stride=1, padding=1)
                    + b3.astype(x.dtype))
    return max_pool2d(y, 3, 2, 1)
