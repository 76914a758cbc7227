"""Deformable position-sensitive ROI pooling (jnp, NHWC).

Capability-parity port of the reference's vendored CUDA op
(external/DCNv2/src/cuda/dcn_v2_psroi_pooling_cuda.cu:59-148 +
python wrapper external/DCNv2/dcn_v2.py:132-303).  PPYOLO itself never uses
it (SURVEY.md §2.2 N6 — only R-FCN-style heads do), but the reference ships
and binds it, so the TPU build carries the equivalent.

Semantics mirrored exactly: rounded ROI corners scaled by spatial_scale with
the -0.5 shift, 0.1-clamped extents, per-part learned offsets scaled by
trans_std, sample_per_part x sample_per_part bilinear samples averaged over
the in-bounds count, position-sensitive group channel selection.  Static
shapes + vmap over ROIs; gradients via autodiff (the reference needed a
hand-written backward kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_psroi_pool(
    x: jax.Array,             # [N, H, W, C]
    rois: jax.Array,          # [R, 5] (batch_idx, x1, y1, x2, y2)
    trans: jax.Array | None,  # [R, part, part, num_classes*2] or None
    *,
    spatial_scale: float,
    output_dim: int,
    group_size: int,
    pooled_size: int,
    part_size: int | None = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jax.Array:
    """Returns pooled [R, pooled_size, pooled_size, output_dim]."""
    n, height, width, channels = x.shape
    part_size = part_size or pooled_size
    num_classes = 1 if trans is None else trans.shape[-1] // 2
    channels_each_class = output_dim // num_classes
    f32 = jnp.float32

    def one_roi(roi, tr):
        batch_ind = roi[0].astype(jnp.int32)
        start_w = jnp.round(roi[1]) * spatial_scale - 0.5
        start_h = jnp.round(roi[2]) * spatial_scale - 0.5
        end_w = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        end_h = (jnp.round(roi[4]) + 1.0) * spatial_scale - 0.5
        roi_w = jnp.maximum(end_w - start_w, 0.1)
        roi_h = jnp.maximum(end_h - start_h, 0.1)
        bin_w = roi_w / pooled_size
        bin_h = roi_h / pooled_size
        sub_w = bin_w / sample_per_part
        sub_h = bin_h / sample_per_part

        ph = jnp.arange(pooled_size, dtype=f32)
        pw = jnp.arange(pooled_size, dtype=f32)
        part_h = jnp.floor(ph / pooled_size * part_size).astype(jnp.int32)
        part_w = jnp.floor(pw / pooled_size * part_size).astype(jnp.int32)
        ctop = jnp.arange(output_dim)
        class_id = ctop // channels_each_class                     # [D]

        if tr is None:
            tx = jnp.zeros((pooled_size, pooled_size, output_dim), f32)
            ty = jnp.zeros((pooled_size, pooled_size, output_dim), f32)
        else:
            tr = tr.astype(f32)                                     # [P,P,2K]
            txy = tr[part_h[:, None], part_w[None, :], :]           # [p,p,2K]
            tx = txy[..., 2 * class_id] * trans_std                 # [p,p,D]
            ty = txy[..., 2 * class_id + 1] * trans_std

        wstart = pw[None, :, None] * bin_w + start_w + tx * roi_w   # [p,p,D]
        hstart = ph[:, None, None] * bin_h + start_h + ty * roi_h

        gw = jnp.clip(jnp.floor(pw * group_size / pooled_size), 0,
                      group_size - 1).astype(jnp.int32)
        gh = jnp.clip(jnp.floor(ph * group_size / pooled_size), 0,
                      group_size - 1).astype(jnp.int32)
        # position-sensitive channel: (ctop*G + gh)*G + gw
        chan = (ctop[None, None, :] * group_size + gh[:, None, None]) \
            * group_size + gw[None, :, None]                        # [p,p,D]

        img = jax.lax.dynamic_index_in_dim(x, batch_ind, 0, keepdims=False)
        img = img.astype(f32)                                       # [H,W,C]
        imgf = img.reshape(height * width, channels)

        def sample(w, h):
            """Bilinear sample img[..., chan] at (h, w) [p,p,D] grids."""
            inb = ((w >= -0.5) & (w <= width - 0.5)
                   & (h >= -0.5) & (h <= height - 0.5))
            w = jnp.clip(w, 0.0, width - 1.0)
            h = jnp.clip(h, 0.0, height - 1.0)
            w0 = jnp.floor(w)
            h0 = jnp.floor(h)
            w1 = jnp.minimum(w0 + 1, width - 1.0)
            h1 = jnp.minimum(h0 + 1, height - 1.0)
            lw = w - w0
            lh = h - h0

            def at(hi, wi):
                idx = (hi.astype(jnp.int32) * width + wi.astype(jnp.int32))
                return imgf[idx, chan]

            v = ((1 - lh) * (1 - lw) * at(h0, w0)
                 + (1 - lh) * lw * at(h0, w1)
                 + lh * (1 - lw) * at(h1, w0)
                 + lh * lw * at(h1, w1))
            return jnp.where(inb, v, 0.0), inb.astype(f32)

        total = jnp.zeros((pooled_size, pooled_size, output_dim), f32)
        cnt = jnp.zeros((pooled_size, pooled_size, output_dim), f32)
        for ih in range(sample_per_part):
            for iw in range(sample_per_part):
                v, c = sample(wstart + iw * sub_w, hstart + ih * sub_h)
                total = total + v
                cnt = cnt + c
        return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1.0), 0.0)

    if trans is None:
        return jax.vmap(lambda r: one_roi(r, None))(rois)
    return jax.vmap(one_roi)(rois, trans)
