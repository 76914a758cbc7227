"""Vectorized Gt2YoloTarget: static anchor assignment, numpy scatter.

Replaces the reference's per-image Python triple loop
(tools/transform.py:1211-1421, O(levels x 50 boxes) interpreted code per
image — a host-side bottleneck at TPU step rates, SURVEY.md §7 hard-part 6)
with one numpy scatter per level.  Semantics are identical:

  * best anchor per gt by wh-IoU against anchors normalized by image size
    (transform.py:1363-1372)
  * a gt writes into a level only if its best anchor belongs to that level's
    mask (transform.py:1379-1395); with iou_thresh<1, additional same-level
    anchors above the threshold also receive the target (transform.py:1397-1419)
  * tx,ty = cell-relative offsets; tw,th = log(g*size/anchor);
    tscale = 2 - gw*gh; tobj = gt_score; one-hot class

Output layout is NHWC-style [gh, gw, an, 6+C] (the reference uses
[an, 6+C, gh, gw]); the loss stack consumes this layout directly.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _wh_iou(gw, gh, aw, ah):
    """IoU of corner-anchored boxes [0,0,w,h] (transform.py:1192-1208)."""
    inter = np.minimum(gw, aw) * np.minimum(gh, ah)
    union = gw * gh + aw * ah - inter
    return inter / np.maximum(union, 1e-12)


def _gt2yolo_native(gt_bbox, gt_class, gt_score, best_idx, valid, anchors,
                    anchor_masks, downsample_ratios, im_hw, num_classes):
    """C++ scatter path; returns None when the lib is unavailable."""
    import ctypes
    from ..native import get_lib, _ptr

    lib = get_lib()
    if lib is None:
        return None
    h, w = im_hw
    b, m = gt_class.shape
    bbox = np.ascontiguousarray(gt_bbox, np.float32)
    cls = np.ascontiguousarray(gt_class, np.int32)
    score = np.ascontiguousarray(np.where(valid, gt_score, 0.0), np.float32)
    best = np.ascontiguousarray(best_idx, np.int32)
    anc = np.asarray(anchors, np.float32)
    # tw/th precomputed HERE with numpy's f32 log so the native path is
    # bitwise-identical to the numpy builder and the reference (the C++
    # libm logf rounds the last ulp differently); invalid rows are never
    # written by the scatter, so guard them out of the log
    bw = np.where(valid, gt_bbox[..., 2], 1.0).astype(np.float32)
    bh = np.where(valid, gt_bbox[..., 3], 1.0).astype(np.float32)
    aw = anc[best_idx, 0]
    ah = anc[best_idx, 1]
    tw = np.ascontiguousarray(np.log(bw * w / aw), np.float32)
    th = np.ascontiguousarray(np.log(bh * h / ah), np.float32)
    out = []
    for mask, ds in zip(anchor_masks, downsample_ratios):
        gh, gw = int(h // ds), int(w // ds)
        an = len(mask)
        target = np.zeros((b, gh, gw, an, 6 + num_classes), np.float32)
        mask_arr = np.ascontiguousarray(mask, np.int32)
        lib.gt2yolo_scatter(
            _ptr(bbox, ctypes.c_float), _ptr(cls, ctypes.c_int32),
            _ptr(score, ctypes.c_float), _ptr(best, ctypes.c_int32),
            b, m, _ptr(mask_arr, ctypes.c_int32), an,
            _ptr(tw, ctypes.c_float), _ptr(th, ctypes.c_float), gh, gw,
            6 + num_classes, _ptr(target, ctypes.c_float))
        out.append(target)
    return out


def gt2yolo_targets(
    gt_bbox: np.ndarray,      # [B, M, 4] normalized xywh (cx, cy, w, h)
    gt_class: np.ndarray,     # [B, M] int
    gt_score: np.ndarray,     # [B, M] float
    im_hw: Tuple[int, int],   # network input (h, w)
    anchors: Sequence[Sequence[float]],      # [[w, h], ...] pixel anchors
    anchor_masks: Sequence[Sequence[int]],
    downsample_ratios: Sequence[int],
    num_classes: int,
    iou_thresh: float = 1.0,
    use_native: bool = True,
) -> List[np.ndarray]:
    """Returns per-level float32 targets [B, gh, gw, an, 6+C].

    When the C++ host library is built and iou_thresh==1 (every PPYOLO
    recipe), the scatter runs natively (ppyolo_tpu/native.py); the numpy
    path is the always-available fallback and the parity oracle.
    """
    h, w = im_hw
    anchors = np.asarray(anchors, np.float32)                # [A, 2]
    an_hw = anchors / np.array([[w, h]], np.float32)         # normalized
    b, m = gt_class.shape

    gx, gy = gt_bbox[..., 0], gt_bbox[..., 1]
    gw, gh_ = gt_bbox[..., 2], gt_bbox[..., 3]
    valid = (gw > 0) & (gh_ > 0) & (gt_score > 0)            # [B, M]

    # best anchor per gt (strict > with init 0 => argmax over positive ious)
    ious = _wh_iou(gw[..., None], gh_[..., None],
                   an_hw[None, None, :, 0], an_hw[None, None, :, 1])  # [B,M,A]
    best_idx = np.argmax(ious, axis=-1)                      # [B, M]

    if use_native and iou_thresh >= 1.0:
        native_out = _gt2yolo_native(gt_bbox, gt_class, gt_score, best_idx,
                                     valid, anchors, anchor_masks,
                                     downsample_ratios, (h, w), num_classes)
        if native_out is not None:
            return native_out

    out = []
    bidx, midx = np.meshgrid(np.arange(b), np.arange(m), indexing="ij")
    for mask, ds in zip(anchor_masks, downsample_ratios):
        grid_h, grid_w = int(h // ds), int(w // ds)
        target = np.zeros((b, grid_h, grid_w, len(mask), 6 + num_classes),
                          np.float32)
        gi = np.clip((gx * grid_w).astype(np.int64), 0, grid_w - 1)
        gj = np.clip((gy * grid_h).astype(np.int64), 0, grid_h - 1)

        def write(sel, an_slot, aidx):
            if not np.any(sel):
                return
            bi, mi = bidx[sel], midx[sel]
            gii, gjj = gi[sel], gj[sel]
            sl = an_slot[sel] if isinstance(an_slot, np.ndarray) else np.full(
                len(bi), an_slot)
            ai = aidx[sel] if isinstance(aidx, np.ndarray) else np.full(
                len(bi), aidx)
            target[bi, gjj, gii, sl, 0] = (gx[sel] * grid_w) - gii
            target[bi, gjj, gii, sl, 1] = (gy[sel] * grid_h) - gjj
            target[bi, gjj, gii, sl, 2] = np.log(
                gw[sel] * w / anchors[ai, 0])
            target[bi, gjj, gii, sl, 3] = np.log(
                gh_[sel] * h / anchors[ai, 1])
            target[bi, gjj, gii, sl, 4] = 2.0 - gw[sel] * gh_[sel]
            target[bi, gjj, gii, sl, 5] = gt_score[sel]
            # NOTE: on a cell/slot collision the reference keeps the earlier
            # gt's class bit (it only ever sets 6+cls to 1, never clears —
            # transform.py:1395), so colliding gts leave a multi-hot class.
            target[bi, gjj, gii, sl, 6 + gt_class[sel].astype(np.int64)] = 1.0

        # The reference loop is purely CHRONOLOGICAL: gt b+1's write (best OR
        # extra) overwrites gt b's at a colliding (cell, slot) — a later gt's
        # multi-anchor extra beats an earlier gt's best-anchor write
        # (transform.py:1383-1419; proven by the directed collision case in
        # tests/test_reference_transform_parity.py).  One merged fancy write
        # per slot reproduces it: numpy fancy assignment is last-occurrence-
        # wins and sel flattens in ascending gt order.  Within one gt, best
        # and extra target different slots, so merging the two categories
        # cannot conflict.
        for slot, a in enumerate(mask):
            sel = valid & (best_idx == a)
            if iou_thresh < 1.0:
                iou_a = _wh_iou(gw, gh_, an_hw[a, 0], an_hw[a, 1])
                sel = sel | (valid & (best_idx != a) & (iou_a > iou_thresh))
            write(sel, slot, a)
        out.append(target)
    return out


def gt2yolo_targets_device(gt_bbox, gt_class, gt_score, im_hw, anchors,
                           anchor_masks, downsample_ratios, num_classes,
                           iou_thresh: float = 1.0):
    """Gt2YoloTarget ON DEVICE, scatter-free (jnp; jit-safe, static shapes).

    The host-built target tensors are [B,gh,gw,an,6+C] and ~24x the image
    bytes at 608 (mostly zeros: <=50 boxes/image) — shipping them dominates
    H2D.  This builds them inside the jitted step from the tiny padded gt
    arrays with a DENSE formulation: every (cell, slot) finds its winning gt
    by an argmax over the 50 match priorities (no scatter — TPU-friendly),
    and the multi-hot class plane is one [cells x M] @ [M x C] matmul.

    Semantics match ``gt2yolo_targets`` (and the reference loop) exactly:
      * collisions are CHRONOLOGICAL — the later gt index wins a cell/slot
        collision regardless of best-anchor vs multi-anchor-extra category
        (reference transform.py:1383-1419 write order; cross-checked in
        tests/test_reference_transform_parity.py),
      * colliding gts leave a multi-hot class plane (bits never clear).
    """
    import jax
    import jax.numpy as jnp

    h, w = im_hw
    anchors_j = jnp.asarray(anchors, jnp.float32).reshape(-1, 2)
    an_hw = anchors_j / jnp.asarray([[w, h]], jnp.float32)
    b, m = gt_class.shape

    gx, gy = gt_bbox[..., 0], gt_bbox[..., 1]
    gw_, gh_ = gt_bbox[..., 2], gt_bbox[..., 3]
    valid = (gw_ > 0) & (gh_ > 0) & (gt_score > 0)               # [B, M]

    inter = (jnp.minimum(gw_[..., None], an_hw[None, None, :, 0])
             * jnp.minimum(gh_[..., None], an_hw[None, None, :, 1]))
    union = (gw_ * gh_)[..., None] + (an_hw[:, 0] * an_hw[:, 1]) - inter
    ious = inter / jnp.maximum(union, 1e-12)                     # [B, M, A]
    best_idx = jnp.argmax(ious, axis=-1)                         # [B, M]

    cls_oh = (gt_class[..., None] ==
              jnp.arange(num_classes)).astype(jnp.float32)

    # per-gt value table for the winner-onehot matmul (no gathers on TPU)
    vals = jnp.stack([gx, gy, gw_, gh_, gt_score], axis=-1)      # [B, M, 5]

    out = []
    for mask, ds in zip(anchor_masks, downsample_ratios):
        grid_h, grid_w = int(h // ds), int(w // ds)
        an = len(mask)
        p = grid_h * grid_w * an
        mask_j = jnp.asarray(mask)
        gi = jnp.clip((gx * grid_w).astype(jnp.int32), 0, grid_w - 1)
        gj = jnp.clip((gy * grid_h).astype(jnp.int32), 0, grid_h - 1)

        is_best = valid[..., None] & (best_idx[..., None] == mask_j)  # [B,M,an]
        if iou_thresh < 1.0:
            iou_lvl = jnp.take(ious, mask_j, axis=-1)                 # [B,M,an]
            extra = (valid[..., None] & (best_idx[..., None] != mask_j)
                     & (iou_lvl > iou_thresh))
            assigned = is_best | extra
        else:
            assigned = is_best

        # priority per (gt, slot): 0 = unassigned, else 1 + gt index — the
        # later gt wins a collision outright (chronological reference
        # parity; best and extra writes of ONE gt target different slots so
        # no intra-gt tie exists).  bf16 halves the HBM traffic of the
        # [B, cells, an, M] broadcast below but is only exact for integers
        # <= 256 — beyond that adjacent priorities would collapse and
        # colliding gts would BOTH win (their field rows would sum), so
        # fall back to fp32 when the padded gt count exceeds it.
        pdt = jnp.bfloat16 if m + 1 <= 256 else jnp.float32
        pri_gt = jnp.broadcast_to(
            1 + jnp.arange(m)[None, :, None], is_best.shape)          # [B,M,an]
        pri_gt = jnp.where(assigned, pri_gt, 0).astype(pdt)

        # match via one flat-cell-key equality: pri[b,yx,s,m] > 0 iff gt m
        # writes cell yx slot s, and its value encodes the winner priority
        key = (gj * grid_w + gi)                                      # [B, M]
        yx = jnp.arange(grid_h * grid_w, dtype=jnp.int32)
        eq = (key[:, None, :] == yx[None, :, None])                   # [B,YX,M]
        pri = (eq[:, :, None, :].astype(pdt)
               * pri_gt.transpose(0, 2, 1)[:, None])                  # [B,YX,an,M]
        win = jnp.max(pri, axis=-1)                                   # [B,YX,an]
        has = win > 0
        # priorities are exact integers in pdt, so == finds the unique winner
        oh = ((pri == win[..., None]) & has[..., None])               # winner 1-hot
        # winner gather as a selection matmul — fp32 values (bf16 would cost
        # up to 0.15 cells on tx/ty); the one-hot lhs makes each output an
        # exact copy of one value row up to matmul rounding
        ohf = oh.reshape(b, p, m).astype(jnp.float32)
        matf = (pri > 0).reshape(b, p, m).astype(jnp.bfloat16)

        # HIGHEST: the default TPU f32 matmul is one bf16 pass, which would
        # round gx/gy enough to move tx/ty by ~0.15 cells; K=5 keeps it cheap
        g = jnp.einsum("bpm,bmk->bpk", ohf, vals,
                       precision=jax.lax.Precision.HIGHEST)           # [B,P,5]
        g = g.reshape(b, grid_h, grid_w, an, 5)
        gx_s, gy_s, gw_s, gh_s, score_s = [g[..., i] for i in range(5)]
        hasf = has.reshape(b, grid_h, grid_w, an).astype(jnp.float32)
        aw = anchors_j[mask_j, 0]
        ah = anchors_j[mask_j, 1]
        tx = gx_s * grid_w - jnp.arange(grid_w)[None, None, :, None]
        ty = gy_s * grid_h - jnp.arange(grid_h)[None, :, None, None]
        tw = jnp.log(jnp.maximum(gw_s * w / aw, 1e-30))
        th = jnp.log(jnp.maximum(gh_s * h / ah, 1e-30))
        tscale = 2.0 - gw_s * gh_s
        fields = jnp.stack([tx, ty, tw, th, tscale, score_s],
                           axis=-1) * hasf[..., None]

        # multi-hot classes: OR over ALL matching gts (bits never clear)
        cls_plane = jnp.einsum("bpm,bmc->bpc", matf,
                               cls_oh.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        cls_plane = jnp.minimum(cls_plane, 1.0).reshape(
            b, grid_h, grid_w, an, num_classes)
        out.append(jnp.concatenate([fields, cls_plane], axis=-1))
    return out
