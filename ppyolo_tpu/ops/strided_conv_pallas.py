"""Strided 3x3 conv (stride 2, SAME) — Pallas/phase-decomposed attempts.

The serving backbone's two non-floor convs are the strided 3x3s
stage3_0/stage4_0 (reference model/resnet_vd.py:19-22 places the stride in
the 3x3 when downsample_in3x3): b8@608 bf16 they run at 26.6%/46% MXU
(~0.41 ms/batch combined, docs/DESIGN.md conv table).  r4 VERDICT #4 asked
for a stem-kernel-rigor measured attempt.  Three implementations, all
tap-for-tap exact vs ``lax.conv_general_dilated`` (fp32) / bf16-rounding
equal (bf16):

  xla    — the baseline strided conv (what ops/conv.py emits today)
  phase  — XLA-level phase decomposition: pad, 4 strided phase planes
           (row/col parity), 9 accumulated 1x1 convs (XLA lowers 1x1 convs
           as dense matmuls at high MXU fill); stride never reaches the
           conv op
  pallas — the same phase planes fed to a Pallas kernel: planes VMEM-
           resident per image, output row-blocked, each tap a static
           slab slice -> [rows*S, C] @ [C, Co] MXU matmul, fp32 accum

Measured on TPU by tools/probe_strided_conv.py (see DESIGN.md for the
verdict).  Standalone op — wired into nothing unless the probe wins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def conv_s2_xla(x, w):
    """Baseline: lax strided conv, NHWC/HWIO, stride 2, pad 1."""
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _phase_planes(x):
    """Pad 1 and split into the 4 (row, col) parity planes.

    Tap (i, j) of the 3x3 kernel at output (y, x) reads padded pixel
    (2y+i, 2x+j) = plane[i%2][j%2] at (y + i//2, x + j//2); each plane is
    [B, S+1, S+1, C] where S = H/2 (H even).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return [[xp[:, r::2, c::2, :] for c in (0, 1)] for r in (0, 1)]


def conv_s2_phase(x, w):
    """XLA phase decomposition: 9 accumulated 1x1 convs on parity planes."""
    b, h, _, c = x.shape
    s = h // 2
    planes = _phase_planes(x)
    out = None
    for i in range(3):
        for j in range(3):
            p = planes[i % 2][j % 2][:, i // 2:i // 2 + s,
                                     j // 2:j // 2 + s, :]
            t = lax.conv_general_dilated(
                p, w[i:i + 1, j:j + 1], window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    return out.astype(x.dtype)


def _pick_block_rows(s: int, cap: int = 32) -> int:
    """Largest divisor of S <= cap (output rows per grid step)."""
    for r in range(min(cap, s), 0, -1):
        if s % r == 0:
            return r
    return 1


def _kernel(ee, eo, oe, oo, wref, out, *, R, S, use_3d_dot):
    planes = ((ee, eo), (oe, oo))
    y0 = pl.program_id(1) * R
    acc = jnp.zeros((R, S, out.shape[-1]), jnp.float32)
    for i in range(3):
        for j in range(3):
            p = planes[i % 2][j % 2]
            slab = p[0, pl.dslice(y0 + i // 2, R)]       # [R, S+1, C]
            seg = slab[:, j // 2:j // 2 + S, :]          # [R, S, C]
            wj = wref[i, j]                              # [C, Co]
            if use_3d_dot:
                acc = acc + lax.dot_general(
                    seg, wj, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                for r in range(R):
                    acc = acc.at[r].add(jnp.dot(
                        seg[r], wj, preferred_element_type=jnp.float32))
    out[0] = acc.astype(out.dtype)


def conv_s2_pallas(x, w, *, block_rows: int = None, use_3d_dot: bool = True,
                   interpret: bool = None):
    """Pallas phase-plane kernel; exact same math as conv_s2_phase."""
    b, h, _, c = x.shape
    co = w.shape[-1]
    s = h // 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = block_rows or _pick_block_rows(s)
    planes = _phase_planes(x)
    flat = [planes[0][0], planes[0][1], planes[1][0], planes[1][1]]
    plane_spec = pl.BlockSpec((1, s + 1, s + 1, c), lambda n, r: (n, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, S=s, use_3d_dot=use_3d_dot),
        grid=(b, s // R),
        in_specs=[plane_spec] * 4 + [
            pl.BlockSpec((3, 3, c, co), lambda n, r: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, R, s, co), lambda n, r: (n, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, s, co), x.dtype),
        interpret=interpret,
    )(*flat, w)
    return out
