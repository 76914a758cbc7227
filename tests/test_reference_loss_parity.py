"""Cross-framework parity of the TRAINING OBJECTIVE against the reference's
actual torch loss stack (model/losses.py YOLOv3Loss + model/iou_losses.py
IouLoss/IouAwareLoss, cuda-stubbed).

With the model forward (test_reference_parity), the target assigner and the
whole data layer (test_reference_transform_parity) already cross-checked,
this closes the last training-pipeline surface: identical raw head outputs
+ targets + gt boxes must produce the same 6-component loss dict.

Known intentional numeric deviation: our BCEs are logit-space capped
softplus (the reference's ``log(sigmoid+1e-9)`` NaNs on TPU under XLA
excess-precision folding — docs/DESIGN.md); at unsaturated logits the two
forms agree to ~1e-6 relative, so this test uses moderate logits and a
1e-4 tolerance.  Everything else (grid-sensitive L1, wh L1, IoU/CIoU math,
ignore-mask decode + IoU vs gt, tscale/tobj weighting, per-level sums and
batch means) must line up.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ppyolo_tpu.data.targets import gt2yolo_targets
from ppyolo_tpu.train.losses import (YOLOv3Loss, IouLoss, IouAwareLoss,
                                     total_loss)

pytestmark = pytest.mark.slow

REFERENCE_ROOT = "/root/reference"

ANCHORS = [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
           [116, 90], [156, 198], [373, 326]]
MASKS = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
DOWNS = [32, 16, 8]
MASK_ANCHORS = [[float(v) for a in m for v in ANCHORS[a]] for m in MASKS]


@pytest.fixture(scope="module")
def ref_losses():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "tools" or k.startswith("tools.")
             or k == "model" or k.startswith("model.")}
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import model.losses as ref_losses_mod
    import model.iou_losses as ref_iou_mod

    yield types.SimpleNamespace(YOLOv3Loss=ref_losses_mod.YOLOv3Loss,
                                IouLoss=ref_iou_mod.IouLoss,
                                IouAwareLoss=ref_iou_mod.IouAwareLoss)
    while REFERENCE_ROOT in sys.path:
        sys.path.remove(REFERENCE_ROOT)
    for k in list(sys.modules):
        if (k == "tools" or k.startswith("tools.")
                or k == "model" or k.startswith("model.")):
            sys.modules.pop(k)
    sys.modules.update(saved)


def _make_inputs(seed, n=2, size=160, num_classes=6, iou_aware=True):
    """Random raw head outputs (reference NCHW layout) + real targets."""
    r = np.random.RandomState(seed)
    m = 50
    gt = np.zeros((n, m, 4), np.float32)
    nval = 6
    gt[:, :nval, 0:2] = r.uniform(0.1, 0.9, (n, nval, 2))
    gt[:, :nval, 2:4] = r.uniform(0.05, 0.5, (n, nval, 2))
    cls = np.zeros((n, m), np.int32)
    cls[:, :nval] = r.randint(0, num_classes, (n, nval))
    score = np.zeros((n, m), np.float32)
    score[:, :nval] = 1.0
    targets = gt2yolo_targets(gt, cls, score, (size, size), ANCHORS, MASKS,
                              DOWNS, num_classes, use_native=False)
    outputs = []
    for mask, ds in zip(MASKS, DOWNS):
        g = size // ds
        an = len(mask)
        ch = an * (5 + num_classes) + (an if iou_aware else 0)
        outputs.append(r.normal(0.0, 1.2, (n, ch, g, g)).astype(np.float32))
    return outputs, targets, gt


@pytest.mark.parametrize("seed,iou_aware", [(0, True), (1, True), (2, False)])
def test_loss_dict_matches_reference(ref_losses, seed, iou_aware):
    import jax.numpy as jnp

    num_classes, scale_x_y = 6, 1.05
    outputs, targets, gt = _make_inputs(seed, iou_aware=iou_aware)

    ref_loss = ref_losses.YOLOv3Loss(
        ignore_thresh=0.7, label_smooth=False, use_fine_grained_loss=True,
        iou_loss=ref_losses.IouLoss(loss_weight=2.5, max_height=608,
                                    max_width=608, ciou_term=False),
        iou_aware_loss=(ref_losses.IouAwareLoss(loss_weight=1.0,
                                                max_height=608, max_width=608)
                        if iou_aware else None),
        downsample=DOWNS, scale_x_y=scale_x_y, match_score=False)
    ref_out = ref_loss(
        [torch.from_numpy(o) for o in outputs],
        torch.from_numpy(gt), None, None,
        [torch.from_numpy(np.ascontiguousarray(
            t.transpose(0, 3, 4, 1, 2))) for t in targets],
        None, None, MASK_ANCHORS, num_classes)
    ref_out = {k: float(v.detach().numpy()) for k, v in ref_out.items()}

    our_loss = YOLOv3Loss(
        ignore_thresh=0.7, label_smooth=False,
        iou_loss=IouLoss(loss_weight=2.5, ciou_term=False),
        iou_aware_loss=IouAwareLoss(loss_weight=1.0) if iou_aware else None,
        downsample=DOWNS, scale_x_y=scale_x_y, match_score=False)
    our_out = our_loss(
        [jnp.asarray(o.transpose(0, 2, 3, 1)) for o in outputs],
        [jnp.asarray(t) for t in targets],
        jnp.asarray(gt), MASK_ANCHORS, num_classes)
    our_out = {k: float(np.asarray(v)) for k, v in our_out.items()}

    match_keys = {"loss_xy", "loss_wh", "loss_obj", "loss_cls", "loss_iou"}
    assert match_keys <= set(our_out), our_out.keys()
    for k in sorted(match_keys):
        assert np.isfinite(our_out[k]) and np.isfinite(ref_out[k]), k
        np.testing.assert_allclose(
            our_out[k], ref_out[k], rtol=2e-4,
            err_msg=f"{k}: ours {our_out[k]} vs reference {ref_out[k]}")

    if iou_aware:
        # loss_iou_aware is the ONE documented deviation (train/losses.py
        # module docstring): the reference transliterates Paddle's soft-label
        # cross_entropy as ``sum(-1).unsqueeze(-1)`` — summing the BCE over
        # the W axis and broadcasting that row sum against tobj — while ours
        # computes the intended elementwise form.  Prove the deviation is
        # EXACTLY that artifact: applying the reference's reduction to our
        # elementwise tensor must reproduce the reference's value.
        assert "loss_iou_aware" in our_out
        ref_artifact = 0.0
        for i, (output, target) in enumerate(zip(outputs, targets)):
            an = len(MASKS[i])
            o = jnp.asarray(output.transpose(0, 2, 3, 1))      # [N,H,W,ch]
            ioup_logit = o[..., :an]
            body = o[..., an:]
            n, s = body.shape[0], body.shape[1]
            b = body.reshape(n, s, s, an, 5 + num_classes)
            t = jnp.asarray(targets[i])
            elem = our_loss.iou_aware_loss(
                ioup_logit, b[..., 0], b[..., 1], b[..., 2], b[..., 3],
                t[..., 0], t[..., 1], t[..., 2], t[..., 3],
                jnp.asarray(MASK_ANCHORS[i], jnp.float32).reshape(-1, 2),
                DOWNS[i], scale_x_y)                           # [N,H,W,an]
            rowsum = jnp.sum(elem, axis=2, keepdims=True)      # sum over W
            tobj = t[..., 5]
            lvl = jnp.mean(jnp.sum(rowsum * tobj, axis=(1, 2, 3)))
            ref_artifact += float(np.asarray(lvl))
        np.testing.assert_allclose(
            ref_artifact, ref_out["loss_iou_aware"], rtol=2e-4,
            err_msg="artifact-form reproduction")

    # the scalar the optimizer follows (matching components only)
    tot_ref = sum(ref_out[k] for k in match_keys)
    np.testing.assert_allclose(
        float(np.asarray(total_loss(
            {k: our_out[k] for k in match_keys}))), tot_ref, rtol=2e-4)


def test_loss_scale_xy_unity_branch(ref_losses):
    """scale_x_y == 1.0 switches xy to BCE (reference losses.py:177-186) —
    check that branch too (r18vd-style, no iou_aware)."""
    import jax.numpy as jnp

    num_classes = 6
    outputs, targets, gt = _make_inputs(4, iou_aware=False)
    ref_loss = ref_losses.YOLOv3Loss(
        ignore_thresh=0.7, label_smooth=False, use_fine_grained_loss=True,
        iou_loss=ref_losses.IouLoss(loss_weight=2.5, max_height=608,
                                    max_width=608, ciou_term=False),
        iou_aware_loss=None, downsample=DOWNS, scale_x_y=1.0,
        match_score=False)
    ref_out = ref_loss(
        [torch.from_numpy(o) for o in outputs],
        torch.from_numpy(gt), None, None,
        [torch.from_numpy(np.ascontiguousarray(
            t.transpose(0, 3, 4, 1, 2))) for t in targets],
        None, None, MASK_ANCHORS, num_classes)
    our_loss = YOLOv3Loss(
        ignore_thresh=0.7, label_smooth=False,
        iou_loss=IouLoss(loss_weight=2.5, ciou_term=False),
        iou_aware_loss=None, downsample=DOWNS, scale_x_y=1.0,
        match_score=False)
    our_out = our_loss(
        [jnp.asarray(o.transpose(0, 2, 3, 1)) for o in outputs],
        [jnp.asarray(t) for t in targets],
        jnp.asarray(gt), MASK_ANCHORS, num_classes)
    for k in ("loss_xy", "loss_wh", "loss_obj", "loss_cls", "loss_iou"):
        np.testing.assert_allclose(float(np.asarray(our_out[k])),
                                   float(ref_out[k].detach().numpy()),
                                   rtol=2e-4, err_msg=k)
