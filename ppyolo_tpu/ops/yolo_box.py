"""Grid-Sensitive YOLO box decode + IoU-Aware score fusion, NHWC, on-device.

Equivalent math to reference model/head.py:21-141 (yolo_box,
get_iou_aware_score/_de_sigmoid/_postprocess_output) and the anchor-major
variant model/losses.py:22-81 (paddle_yolo_box), with the reference's
hardcoded-CUDA anchor constants (head.py:43) replaced by traced arrays and
the square-grid assumption (head.py:24-27) kept.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def de_sigmoid(x, eps: float = 1e-7):
    """Inverse sigmoid with the reference's double clamp (head.py:97-109)."""
    x = jnp.clip(x, eps, 1.0 / eps)
    x = 1.0 / x - 1.0
    x = jnp.clip(x, eps, 1.0 / eps)
    return -jnp.log(x)


def iou_aware_score(output, an_num: int, num_classes: int, factor: float):
    """Fuse predicted-IoU into the objectness logit (head.py:112-141).

    output: [N, S, S, an_num + an_num*(5+C)] raw head output (NHWC).
    Returns [N, S, S, an_num*(5+C)] with channel 4 of each anchor block
    replaced by de_sigmoid(obj^(1-f) * ioup^f).
    """
    n, h, w, _ = output.shape
    # the fuse itself runs in fp32 on the SMALL [N,S,S,an] slices (log/pow
    # precision), regardless of the map dtype — for bf16 serving only the
    # bulk map stays half-width; fp32 inputs are bitwise unchanged
    ioup = jax.nn.sigmoid(output[..., :an_num].astype(jnp.float32))    # [N,S,S,an]
    rest = output[..., an_num:].reshape(n, h, w, an_num, 5 + num_classes)
    obj = jax.nn.sigmoid(rest[..., 4].astype(jnp.float32))
    new_obj = de_sigmoid(jnp.power(obj, 1.0 - factor) * jnp.power(ioup, factor))
    rest = rest.at[..., 4].set(new_obj.astype(rest.dtype))
    return rest.reshape(n, h, w, an_num * (5 + num_classes))


def _rescale_clip(boxes, im_size, net: float, clip_bbox: bool):
    """Rescale [N,A,4] boxes from network-input to original-image pixels."""
    imh = im_size[:, 0:1].astype(jnp.float32)
    imw = im_size[:, 1:2].astype(jnp.float32)
    sx = (imw / net)[:, :, None]                                       # [N,1,1]
    sy = (imh / net)[:, :, None]
    x0 = boxes[:, :, 0:1] * sx
    y0 = boxes[:, :, 1:2] * sy
    x1 = boxes[:, :, 2:3] * sx
    y1 = boxes[:, :, 3:4] * sy
    if clip_bbox:
        x0 = jnp.maximum(x0, 0.0)
        y0 = jnp.maximum(y0, 0.0)
        x1 = jnp.minimum(x1, imw[:, :, None])
        y1 = jnp.minimum(y1, imh[:, :, None])
    return jnp.concatenate([x0, y0, x1, y1], axis=-1)


def yolo_box_serving(output, anchors, stride: int, num_classes: int,
                     scale_x_y: float, im_size, clip_bbox: bool, *,
                     iou_aware_factor=None):
    """Layout-friendly decode of one level: iou_aware_score + yolo_box in a
    single pass over per-anchor CONTIGUOUS channel slices of the raw map.

    The composed reference path ([N,S,S,an,5+C] reshape + 1-wide channel-4
    scatter + minor-dim-85 slices) forces T(4,128) minor-dim layouts that
    cost ~0.55 ms/batch of pure copies at b8@608 (tools/profile_serving.py
    r3 source attribution).  This form slices each anchor's 5+C channel
    block contiguously from the lane dimension, so every read fuses into
    the producer; the only materialization left is the final anchor-
    interleaved stack each for boxes/scores.  The math is op-for-op
    identical to iou_aware_score -> yolo_box — including the de_sigmoid ->
    sigmoid clip round-trip of the fused objectness and its cast to the
    map dtype — so results are bit-identical (tests/test_ops.py).
    """
    n, s, s2, _ = output.shape
    assert s == s2, "decode assumes a square grid (reference head.py:24-27)"
    an = anchors.shape[0]
    c5 = 5 + num_classes
    base = an if iou_aware_factor is not None else 0
    grid = jnp.arange(s, dtype=jnp.float32)
    gx = grid[None, None, :]                           # varies along W
    gy = grid[None, :, None]                           # varies along H
    boxes_a, scores_a = [], []
    for a in range(an):
        blk = output[..., base + a * c5: base + (a + 1) * c5]  # [N,S,S,5+C]
        box_raw = blk[..., 0:4].astype(jnp.float32)
        sig_xy = jax.nn.sigmoid(box_raw[..., 0:2])
        px = (scale_x_y * sig_xy[..., 0] + gx - (scale_x_y - 1.0) * 0.5) * stride
        py = (scale_x_y * sig_xy[..., 1] + gy - (scale_x_y - 1.0) * 0.5) * stride
        pwh = jnp.exp(box_raw[..., 2:4]) * anchors[a].astype(jnp.float32)
        pxy = jnp.stack([px, py], axis=-1)
        boxes_a.append(jnp.concatenate([pxy - pwh * 0.5, pxy + pwh * 0.5],
                                       axis=-1))                   # [N,S,S,4]
        if iou_aware_factor is not None:
            f = float(iou_aware_factor)
            ioup = jax.nn.sigmoid(output[..., a].astype(jnp.float32))
            obj = jax.nn.sigmoid(blk[..., 4].astype(jnp.float32))
            fused = de_sigmoid(jnp.power(obj, 1.0 - f) * jnp.power(ioup, f))
            conf = jax.nn.sigmoid(fused.astype(output.dtype))[..., None]
        else:
            conf = jax.nn.sigmoid(blk[..., 4:5])       # score path: map dtype
        scores_a.append(conf * jax.nn.sigmoid(blk[..., 5:]))       # [N,S,S,C]
    boxes = jnp.stack(boxes_a, axis=3).reshape(n, s * s * an, 4)
    scores = jnp.stack(scores_a, axis=3).reshape(n, s * s * an, num_classes)
    return _rescale_clip(boxes, im_size, float(s * stride), clip_bbox), scores


def yolo_box(
    output,
    anchors,
    stride: int,
    num_classes: int,
    scale_x_y: float,
    im_size,
    clip_bbox: bool,
    *,
    anchor_major: bool = False,
):
    """Decode one head level into image-space boxes + class scores.

    Args:
      output:  [N, S, S, an*(5+C)] raw (post IoU-aware fuse) head map, NHWC.
      anchors: [an, 2] (w, h) pixel anchors for this level.
      stride:  downsample ratio of this level.
      im_size: [N, 2] per-image (h, w) of the ORIGINAL image.
      clip_bbox: clip boxes into the image.
      anchor_major: flatten as (an, S, S) instead of (S, S, an) — the Paddle
        in-loss ordering (losses.py:56-57) vs the inference ordering
        (head.py:58-59).

    Returns (boxes [N, S*S*an, 4] xyxy, scores [N, S*S*an, C]).
    """
    n, s, s2, _ = output.shape
    assert s == s2, "decode assumes a square grid (reference head.py:24-27)"
    an = anchors.shape[0]
    out = output.reshape(n, s, s, an, 5 + num_classes)

    # Box math is ALWAYS fp32 (exp(wh) + image-pixel coords need the range);
    # bf16 serving keeps only the bulk score tensor [N,A,C] half-width —
    # fp32 inputs are bitwise unchanged (every cast below is a no-op).
    box_raw = out[..., 0:4].astype(jnp.float32)
    grid = jnp.arange(s, dtype=jnp.float32)
    gx = grid[None, None, :, None]                     # varies along W
    gy = grid[None, :, None, None]                     # varies along H
    sig_xy = jax.nn.sigmoid(box_raw[..., 0:2])
    px = (scale_x_y * sig_xy[..., 0] + gx - (scale_x_y - 1.0) * 0.5) * stride
    py = (scale_x_y * sig_xy[..., 1] + gy - (scale_x_y - 1.0) * 0.5) * stride
    pwh = jnp.exp(box_raw[..., 2:4]) * anchors.astype(jnp.float32)     # [N,S,S,an,2]
    pxy = jnp.stack([px, py], axis=-1)
    xy0 = pxy - pwh * 0.5
    xy1 = pxy + pwh * 0.5
    boxes = jnp.concatenate([xy0, xy1], axis=-1)                       # [N,S,S,an,4]

    conf = jax.nn.sigmoid(out[..., 4:5])               # score path: map dtype
    prob = jax.nn.sigmoid(out[..., 5:])
    scores = conf * prob                                               # [N,S,S,an,C]

    if anchor_major:
        boxes = boxes.transpose(0, 3, 1, 2, 4)
        scores = scores.transpose(0, 3, 1, 2, 4)
    boxes = boxes.reshape(n, s * s * an, 4)
    scores = scores.reshape(n, s * s * an, num_classes)

    # rescale from network-input pixels to original-image pixels
    return _rescale_clip(boxes, im_size, float(s * stride), clip_bbox), scores
