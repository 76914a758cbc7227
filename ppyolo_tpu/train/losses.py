"""PP-YOLO fine-grained YOLOv3 loss stack, NHWC, fully jittable.

Parity with reference model/losses.py:85-356 and model/iou_losses.py:15-246:
  * xy loss: BCE when scale_x_y==1 else Grid-Sensitive L1 (losses.py:177-193)
  * wh loss: L1 (losses.py:196-199)
  * IoU loss: decode pred+gt to normalized xyxy, loss=(1-iou^2)*w
    (iou_losses.py:39-98), weighted by tscale*tobj
  * IoU-Aware loss: BCE-style iouk * -log(ioup) on the (detached) actual IoU
    (iou_losses.py:207-246), weighted by tobj.  NOTE: the reference applies a
    ``sum(-1).unsqueeze(-1)`` then broadcasts against tobj — a transliteration
    artifact of Paddle's soft-label cross_entropy; we compute the intended
    elementwise form, and stop gradients through iouk.
  * obj loss with ignore mask: decode ALL predictions (normalized, im_size=1,
    clip off), IoU against the 50 padded gt boxes, max_iou<=ignore_thresh
    marks candidate negatives (losses.py:292-356)
  * cls loss: per-class BCE masked by tobj (losses.py:220-224)

Layouts: head output [N,S,S,an*(5+C)] (+an leading ioup channels when
iou_aware), target [N,S,S,an,6+C], gt_box [N,50,4] normalized xywh.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax


# The reference guards its BCE with +1e-9 inside the logs
# (model/losses.py:179-183,221,351-352).  That form is UNSAFE under the TPU
# XLA pipeline: with --xla_allow_excess_precision the compiler may
# reassociate ``1.0 - sig + 1e-9`` into ``(1.0 + 1e-9) - sig`` and fold the
# two constants to 1.0 — the guard vanishes and a sigmoid that rounds to
# exactly 1.0f (any logit >= ~17) yields log(0) = -inf, then 0*inf = NaN
# under the target mask.  We therefore compute BCE from LOGITS via softplus
# (exact and eps-free), capped at -log(1e-9) so the saturation behaviour
# matches the reference's eps-as-loss-cap semantics.
_EPS_CAP = 20.72326583694641  # -log(1e-9)


def _bce_logits(logit, target, cap: float = _EPS_CAP):
    """Binary cross entropy from logits, reassociation-proof.

    Equals the reference's ``t*(-log(s+1e-9)) + (1-t)*(-log(1-s+1e-9))``
    (s = sigmoid(logit)) up to the eps smoothing, including its cap.
    """
    pos = jnp.minimum(jax.nn.softplus(-logit), cap)   # -log(sigmoid(x))
    neg = jnp.minimum(jax.nn.softplus(logit), cap)    # -log(1-sigmoid(x))
    return target * pos + (1.0 - target) * neg


def _grids(s: int, dtype):
    gx = jnp.arange(s, dtype=dtype)[None, None, :, None]   # varies along W
    gy = jnp.arange(s, dtype=dtype)[None, :, None, None]   # varies along H
    return gx, gy


def _bbox_transform(dx, dy, dw, dh, anchors_wh, downsample, scale_x_y,
                    *, is_gt: bool, eps: float = 1e-10):
    """Decode encoded xywh into normalized corner boxes
    (reference iou_losses.py:135-191).  Inputs [N,S,S,an]."""
    n, s, _, an = dx.shape
    gx, gy = _grids(s, dx.dtype)
    if is_gt:
        cx = (dx + gx) / s
        cy = (dy + gy) / s
    else:
        sx = jax.nn.sigmoid(dx)
        sy = jax.nn.sigmoid(dy)
        if abs(scale_x_y - 1.0) > eps:
            sx = scale_x_y * sx - 0.5 * (scale_x_y - 1.0)
            sy = scale_x_y * sy - 0.5 * (scale_x_y - 1.0)
        cx = (sx + gx) / s
        cy = (sy + gy) / s
    aw = anchors_wh[:, 0][None, None, None, :]
    ah = anchors_wh[:, 1][None, None, None, :]
    pw = jnp.exp(dw) * aw / (s * downsample)
    ph = jnp.exp(dh) * ah / (s * downsample)
    out = (cx - 0.5 * pw, cy - 0.5 * ph, cx + 0.5 * pw, cy + 0.5 * ph)
    if is_gt:
        out = tuple(lax.stop_gradient(v) for v in out)
    return out


def _elementwise_iou(pred, gt, eps: float = 1e-10):
    """Same-position IoU of decoded boxes (iou_losses.py:76-98)."""
    x1, y1, x2, y2 = pred
    x1g, y1g, x2g, y2g = gt
    x2 = jnp.maximum(x1, x2)
    y2 = jnp.maximum(y1, y2)
    xi1 = jnp.maximum(x1, x1g)
    yi1 = jnp.maximum(y1, y1g)
    xi2 = jnp.minimum(x2, x2g)
    yi2 = jnp.minimum(y2, y2g)
    inter = jnp.clip(xi2 - xi1, 0.0) * jnp.clip(yi2 - yi1, 0.0)
    union = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - inter + eps
    return inter / union


def _ciou_term(pred, gt, iouk, eps: float = 1e-10):
    """DIoU+CIoU penalty (reference iou_losses.py:100-133)."""
    x1, y1, x2, y2 = pred
    x1g, y1g, x2g, y2g = gt
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    w = (x2 - x1) + ((x2 - x1) == 0).astype(x1.dtype)
    h = (y2 - y1) + ((y2 - y1) == 0).astype(y1.dtype)
    cxg, cyg = (x1g + x2g) / 2, (y1g + y2g) / 2
    wg, hg = x2g - x1g, y2g - y1g
    xc1, yc1 = jnp.minimum(x1, x1g), jnp.minimum(y1, y1g)
    xc2, yc2 = jnp.maximum(x2, x2g), jnp.maximum(y2, y2g)
    dist_inter = (cx - cxg) ** 2 + (cy - cyg) ** 2
    dist_union = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2
    diou = (dist_inter + eps) / (dist_union + eps)
    arctan = jnp.arctan(wg / hg) - jnp.arctan(w / h)
    ar_loss = 4.0 / (jnp.pi ** 2) * arctan * arctan
    # maximum() guard instead of +eps: XLA excess precision may fold the two
    # constants (1.0 + eps -> 1.0) and expose a 0/0 for identical boxes
    alpha = lax.stop_gradient(
        ar_loss / jnp.maximum(1.0 - iouk + ar_loss, eps))
    return diou + alpha * ar_loss


class IouLoss:
    """loss = (1 - iou^2) * weight, optional CIoU term
    (reference iou_losses.py:15-133)."""

    def __init__(self, loss_weight=2.5, max_height=608, max_width=608,
                 ciou_term=False, loss_square=True):
        self.loss_weight = loss_weight
        self.loss_square = loss_square
        self.ciou_term = ciou_term

    def __call__(self, x, y, w, h, tx, ty, tw, th, anchors_wh, downsample,
                 scale_x_y):
        pred = _bbox_transform(x, y, w, h, anchors_wh, downsample, scale_x_y,
                               is_gt=False)
        gt = _bbox_transform(tx, ty, tw, th, anchors_wh, downsample, scale_x_y,
                             is_gt=True)
        iouk = _elementwise_iou(pred, gt)
        if self.ciou_term:
            iouk = iouk - _ciou_term(pred, gt, iouk)
        loss = 1.0 - iouk * iouk if self.loss_square else 1.0 - iouk
        return loss * self.loss_weight


class IouAwareLoss(IouLoss):
    """BCE of predicted-IoU vs (detached) actual IoU (iou_losses.py:194-246)."""

    def __init__(self, loss_weight=1.0, max_height=608, max_width=608):
        super().__init__(loss_weight=loss_weight)

    def __call__(self, ioup_logit, x, y, w, h, tx, ty, tw, th, anchors_wh,
                 downsample, scale_x_y):
        pred = _bbox_transform(x, y, w, h, anchors_wh, downsample, scale_x_y,
                               is_gt=False)
        gt = _bbox_transform(tx, ty, tw, th, anchors_wh, downsample, scale_x_y,
                             is_gt=True)
        iouk = lax.stop_gradient(_elementwise_iou(pred, gt))
        # -log(sigmoid(ioup_logit) + 1e-9) via the stable capped softplus
        nlog_ioup = jnp.minimum(jax.nn.softplus(-ioup_logit), _EPS_CAP)
        return iouk * nlog_ioup * self.loss_weight


class YOLOv3Loss:
    """Combined fine-grained loss (reference losses.py:85-241)."""

    def __init__(self, ignore_thresh=0.7, label_smooth=True,
                 use_fine_grained_loss=True, iou_loss: Optional[IouLoss] = None,
                 iou_aware_loss: Optional[IouAwareLoss] = None,
                 downsample: Sequence[int] = (32, 16, 8), scale_x_y=1.0,
                 match_score=False):
        self.ignore_thresh = ignore_thresh
        self.iou_loss = iou_loss
        self.iou_aware_loss = iou_aware_loss
        self.downsample = list(downsample)
        self.scale_x_y = scale_x_y
        self.match_score = match_score

    def __call__(self, outputs: List[jax.Array], targets: List[jax.Array],
                 gt_box: jax.Array, mask_anchors: List[List[float]],
                 num_classes: int) -> Dict[str, jax.Array]:
        assert len(outputs) == len(targets)
        # loss math always in fp32 (mixed-precision training keeps the
        # forward in bf16; the decode-heavy loss epilogue must not)
        outputs = [o.astype(jnp.float32) for o in outputs]
        losses = {k: 0.0 for k in ("loss_xy", "loss_wh", "loss_obj", "loss_cls")}
        if self.iou_loss is not None:
            losses["loss_iou"] = 0.0
        if self.iou_aware_loss is not None:
            losses["loss_iou_aware"] = 0.0

        for i, (output, target) in enumerate(zip(outputs, targets)):
            downsample = self.downsample[i]
            anchors_wh = jnp.asarray(mask_anchors[i], jnp.float32).reshape(-1, 2)
            an = anchors_wh.shape[0]
            n, s, _, _ = output.shape
            scale_x_y = (self.scale_x_y if not isinstance(self.scale_x_y, (list, tuple))
                         else self.scale_x_y[i])

            ioup_logit = None
            if self.iou_aware_loss is not None:
                ioup_logit = output[..., :an]                  # [N,S,S,an]
                output = output[..., an:]
            out = output.reshape(n, s, s, an, 5 + num_classes)
            x, y = out[..., 0], out[..., 1]
            w, h = out[..., 2], out[..., 3]
            obj = out[..., 4]
            cls = out[..., 5:]
            tx, ty = target[..., 0], target[..., 1]
            tw, th = target[..., 2], target[..., 3]
            tscale, tobj = target[..., 4], target[..., 5]
            tcls = target[..., 6:]
            tscale_tobj = tscale * tobj

            if abs(scale_x_y - 1.0) < 1e-10:
                loss_x = _bce_logits(x, tx) * tscale_tobj
                loss_y = _bce_logits(y, ty) * tscale_tobj
            else:
                dx = scale_x_y * jax.nn.sigmoid(x) - 0.5 * (scale_x_y - 1.0)
                dy = scale_x_y * jax.nn.sigmoid(y) - 0.5 * (scale_x_y - 1.0)
                loss_x = jnp.abs(dx - tx) * tscale_tobj
                loss_y = jnp.abs(dy - ty) * tscale_tobj
            loss_w = jnp.abs(w - tw) * tscale_tobj
            loss_h = jnp.abs(h - th) * tscale_tobj
            losses["loss_xy"] += jnp.mean(jnp.sum(loss_x + loss_y, axis=(1, 2, 3)))
            losses["loss_wh"] += jnp.mean(jnp.sum(loss_w + loss_h, axis=(1, 2, 3)))

            if self.iou_loss is not None:
                li = self.iou_loss(x, y, w, h, tx, ty, tw, th, anchors_wh,
                                   downsample, scale_x_y) * tscale_tobj
                losses["loss_iou"] += jnp.mean(jnp.sum(li, axis=(1, 2, 3)))
            if self.iou_aware_loss is not None:
                la = self.iou_aware_loss(ioup_logit, x, y, w, h, tx, ty, tw,
                                         th, anchors_wh, downsample,
                                         scale_x_y) * tobj
                losses["loss_iou_aware"] += jnp.mean(jnp.sum(la, axis=(1, 2, 3)))

            pos, neg = self._obj_loss(x, y, w, h, obj, tobj, gt_box, anchors_wh,
                                      downsample, scale_x_y, cls)
            losses["loss_obj"] += jnp.mean(pos + neg)

            loss_cls = jnp.sum(_bce_logits(cls, tcls), axis=-1) * tobj
            losses["loss_cls"] += jnp.mean(jnp.sum(loss_cls, axis=(1, 2, 3)))
        return losses

    def _obj_loss(self, x, y, w, h, obj, tobj, gt_box, anchors_wh, downsample,
                  scale_x_y, cls):
        """Objectness with IoU-ignore mask (reference losses.py:292-356)."""
        n, s, _, an = x.shape
        # decode all preds to normalized xyxy (im_size=1, no clip)
        px1, py1, px2, py2 = _bbox_transform(
            x, y, w, h, anchors_wh, downsample, scale_x_y, is_gt=False)
        pred = lax.stop_gradient(
            jnp.stack([px1, py1, px2, py2], -1).reshape(n, s * s * an, 4))
        # gt xywh -> xyxy  [N, 50, 4]
        gx, gy, gw, gh = (gt_box[..., 0], gt_box[..., 1],
                          gt_box[..., 2], gt_box[..., 3])
        gt = jnp.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1)

        def one(p, g):
            from ..ops.iou import pairwise_iou
            return pairwise_iou(p, g)                     # [A, 50]

        iou = jax.vmap(one)(pred, gt)                     # [N, A, 50]
        max_iou = jnp.max(iou, axis=-1)                   # [N, A]
        iou_mask = (max_iou <= self.ignore_thresh).astype(jnp.float32)
        if self.match_score:
            prob = jax.nn.sigmoid(obj)[..., None] * jax.nn.sigmoid(cls)
            max_prob = jnp.max(prob.reshape(n, s * s * an, -1), axis=-1)
            iou_mask = iou_mask * (max_prob <= 0.25).astype(jnp.float32)
        iou_mask = iou_mask.reshape(n, s, s, an)
        iou_mask = lax.stop_gradient(iou_mask)

        obj_mask = (tobj > 0.0).astype(jnp.float32)
        noobj_mask = (1.0 - obj_mask) * iou_mask
        # capped softplus == the reference's eps-guarded logs (losses.py:351-352)
        nlog_sig = jnp.minimum(jax.nn.softplus(-obj), _EPS_CAP)
        nlog_one_minus = jnp.minimum(jax.nn.softplus(obj), _EPS_CAP)
        pos = jnp.sum(tobj * nlog_sig, axis=(1, 2, 3))
        neg = jnp.sum(noobj_mask * nlog_one_minus, axis=(1, 2, 3))
        return pos, neg


def total_loss(loss_dict: Dict[str, jax.Array]) -> jax.Array:
    """Sum of all components (reference train.py:428-434)."""
    return sum(loss_dict.values())
