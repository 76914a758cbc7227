"""Cross-framework parity of the DATA layer against the reference's actual
``tools/transform.py`` (the last surface that was validated only against
self-written oracles; the model, eval stack, and converters already have
this treatment in test_reference_parity / test_reference_eval_parity /
test_converter_groundtruth).

Technique: the reference draws randomness from the GLOBAL legacy numpy RNG
(``np.random.*``), which is a ``RandomState`` under the hood; this repo's
transforms take an explicit ``np.random.RandomState``.  Seeding both with
the same seed yields identical draw streams, and since the ports are
draw-order-faithful, every stochastic op must produce BITWISE-identical
sample dicts.  Reference ops mutate CHW/HWC conventions identically at this
stage (all pre-Permute ops are HWC).

Covers: PhotometricDistort, ColorDistort, RandomExpand, RandomCrop,
RandomFlipImage, MixupImage, RandomShapeSingle, NormalizeBox,
BboxXYXY2XYWH, PadBox, NormalizeImage, and — most importantly —
Gt2YoloTargetSingle (the target assigner that defines training
correctness) at both iou_thresh=1.0 and the multi-anchor iou_thresh<1
branch, for the numpy, C++-native, and on-device builders.
"""
import copy
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ppyolo_tpu.data import transforms as T
from ppyolo_tpu.data.targets import gt2yolo_targets, gt2yolo_targets_device

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_tf():
    """Import the reference's tools/transform.py (regular package beats this
    repo's ``tools`` namespace dir; purge + restore around the module)."""
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "tools" or k.startswith("tools.")}
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import tools.transform as ref_transform

    yield ref_transform
    while REFERENCE_ROOT in sys.path:
        sys.path.remove(REFERENCE_ROOT)
    for k in list(sys.modules):
        if k == "tools" or k.startswith("tools."):
            sys.modules.pop(k)
    sys.modules.update(saved)


def make_sample(seed, n=4, h=100, w=120):
    """Sample dict in the reference's conventions: HWC uint8 RGB image,
    pixel-space xyxy gt_bbox [n,4] f32, [n,1] class/score/is_crowd."""
    r = np.random.RandomState(seed + 1000)
    img = r.randint(0, 256, (h, w, 3)).astype(np.uint8)
    x0 = r.uniform(0, w - 30, n)
    y0 = r.uniform(0, h - 30, n)
    bw = r.uniform(8, min(60, w - 1), n)
    bh = r.uniform(8, min(60, h - 1), n)
    gt_bbox = np.stack([x0, y0, np.minimum(x0 + bw, w - 1),
                        np.minimum(y0 + bh, h - 1)], 1).astype(np.float32)
    return {
        "image": img,
        "gt_bbox": gt_bbox,
        "gt_class": r.randint(0, 3, (n, 1)).astype(np.int32),
        "gt_score": np.ones((n, 1), np.float32),
        "is_crowd": np.zeros((n, 1), np.int32),
        "h": h, "w": w,
    }


def assert_samples_equal(ours, ref, keys=("image", "gt_bbox", "gt_class",
                                          "gt_score", "h", "w")):
    for k in keys:
        a, b = ours.get(k), ref.get(k)
        assert (a is None) == (b is None), k
        if isinstance(b, np.ndarray):
            assert a.shape == b.shape, (k, a.shape, b.shape)
            np.testing.assert_array_equal(np.asarray(a, b.dtype), b, err_msg=k)
        elif b is not None:
            assert int(a) == int(b), (k, a, b)


def run_pair(our_op, ref_op, sample, seed, ref_context=None):
    ref_s = copy.deepcopy(sample)
    our_s = copy.deepcopy(sample)
    np.random.seed(seed)
    ref_out = ref_op(ref_s, ref_context)
    our_out = our_op(our_s, np.random.RandomState(seed))
    return our_out, ref_out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
def test_photometric_distort(ref_tf, seed):
    ours, ref = run_pair(T.PhotometricDistort(), ref_tf.PhotometricDistort(),
                         make_sample(seed), seed)
    assert_samples_equal(ours, ref, keys=("image",))


@pytest.mark.parametrize("seed", range(6))
def test_color_distort(ref_tf, seed):
    ours, ref = run_pair(T.ColorDistort(), ref_tf.ColorDistort(),
                         make_sample(seed), seed)
    # the hue rotation is the one DELIBERATE deviation: ours casts the 3x3
    # color matrix to f32 (a f64 matrix promotes the whole image dot to f64,
    # 2x host cost — transforms.py::_hue); everything else is bitwise.
    np.testing.assert_allclose(ours["image"], ref["image"].astype(np.float32),
                               rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("seed", range(8))
def test_random_expand(ref_tf, seed):
    ours, ref = run_pair(T.RandomExpand(), ref_tf.RandomExpand(),
                         make_sample(seed), seed)
    assert_samples_equal(ours, ref)


@pytest.mark.parametrize("seed", range(8))
def test_random_crop(ref_tf, seed):
    ours, ref = run_pair(T.RandomCrop(), ref_tf.RandomCrop(),
                         make_sample(seed), seed)
    assert_samples_equal(ours, ref)


@pytest.mark.parametrize("seed", range(4))
def test_random_flip(ref_tf, seed):
    ours, ref = run_pair(T.RandomFlipImage(), ref_tf.RandomFlipImage(),
                         make_sample(seed), seed)
    assert_samples_equal(ours, ref)
    assert ours.get("flipped") == ref.get("flipped")


@pytest.mark.parametrize("seed", range(5))
def test_mixup(ref_tf, seed):
    sample = make_sample(seed)
    sample["mixup"] = make_sample(seed + 50, n=3, h=80, w=140)
    ours, ref = run_pair(T.MixupImage(), ref_tf.MixupImage(), sample, seed)
    assert_samples_equal(ours, ref)
    assert ("mixup" in ours) == ("mixup" in ref)


@pytest.mark.parametrize("seed", range(4))
def test_random_shape_single(ref_tf, seed):
    sample = make_sample(seed)
    ref_s, our_s = copy.deepcopy(sample), copy.deepcopy(sample)
    np.random.seed(seed)
    ref_out = ref_tf.RandomShapeSingle(random_inter=True)(128, ref_s)
    our_out = T.RandomShapeSingle(random_inter=True)(
        128, our_s, np.random.RandomState(seed))
    assert_samples_equal(our_out, ref_out, keys=("image",))


def test_normalize_box_xywh_padbox_chain(ref_tf):
    sample = make_sample(11)
    ref_s, our_s = copy.deepcopy(sample), copy.deepcopy(sample)
    ref_s = ref_tf.NormalizeBox()(ref_s, None)
    ref_s = ref_tf.BboxXYXY2XYWH()(ref_s)
    ref_s = ref_tf.PadBox(num_max_boxes=50)(
        ref_s, context={"fields": ["gt_class", "gt_score"]})
    rng = np.random.RandomState(0)
    our_s = T.NormalizeBox()(our_s, rng)
    our_s = T.BboxXYXY2XYWH()(our_s, rng)
    our_s = T.PadBox(num_max_boxes=50)(our_s, rng)
    assert_samples_equal(our_s, ref_s,
                         keys=("gt_bbox", "gt_class", "gt_score"))


def test_normalize_image(ref_tf):
    sample = make_sample(13)
    ref_s, our_s = copy.deepcopy(sample), copy.deepcopy(sample)
    mean, std = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
    ref_s = ref_tf.NormalizeImage(mean=mean, std=std, is_scale=True,
                                  is_channel_first=False)(ref_s)
    our_s = T.NormalizeImage(mean=mean, std=std, is_scale=True)(
        our_s, np.random.RandomState(0))
    # same math; the reference's in-place -=/ /= against f64 mean/std arrays
    # compute in f64 then cast back to f32 per element, ours stays f32
    assert ref_s["image"].dtype == np.float32
    np.testing.assert_allclose(our_s["image"], ref_s["image"],
                               rtol=0, atol=1e-6)


ANCHORS = [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
           [116, 90], [156, 198], [373, 326]]
MASKS = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
DOWNS = [32, 16, 8]


def _target_sample(seed, size=320, n=8, num_classes=6):
    """Post-pipeline sample: normalized cxcywh gt padded to 50, incl.
    degenerate rows (zero-size, zero-score) and duplicate-cell boxes."""
    r = np.random.RandomState(seed)
    gt = np.zeros((50, 4), np.float32)
    cls = np.zeros((50,), np.int32)
    score = np.zeros((50,), np.float32)
    cx = r.uniform(0.05, 0.95, n)
    cy = r.uniform(0.05, 0.95, n)
    gw = r.uniform(0.01, 0.6, n)
    gh = r.uniform(0.01, 0.6, n)
    if n >= 2:  # force two boxes into the same coarse cell (overwrite order)
        cx[1], cy[1] = cx[0] + 0.004, cy[0] + 0.004
    gt[:n] = np.stack([cx, cy, gw, gh], 1)
    cls[:n] = r.randint(0, num_classes, n)
    score[:n] = r.uniform(0.2, 1.0, n)
    if n >= 4:
        gt[2, 2] = 0.0        # zero-width -> skipped
        score[3] = 0.0        # zero-score -> skipped
    return gt, cls, score, size


@pytest.mark.parametrize("seed,iou_thresh", [(0, 1.0), (1, 1.0), (2, 1.0),
                                             (0, 0.213), (3, 0.213),
                                             (5, 0.4)])
def test_gt2yolo_target_vs_reference(ref_tf, seed, iou_thresh):
    """The target assigner IS training correctness: drive the reference's
    own Gt2YoloTargetSingle (transform.py:1318-1421) and require bitwise
    agreement from the vectorized numpy builder AND the on-device dense
    builder, on both the best-anchor and multi-anchor (iou_thresh<1)
    branches."""
    gt, cls, score, size = _target_sample(seed)
    ref_sample = {
        "image": np.zeros((3, size, size), np.float32),  # reference is CHW here
        "gt_bbox": gt.copy(), "gt_class": cls.copy(), "gt_score": score.copy(),
    }
    ref_op = ref_tf.Gt2YoloTargetSingle(
        anchors=ANCHORS, anchor_masks=MASKS, downsample_ratios=DOWNS,
        num_classes=6, iou_thresh=iou_thresh)
    ref_out = ref_op(ref_sample)
    ref_targets = [ref_out[f"target{i}"] for i in range(3)]

    ours = gt2yolo_targets(gt[None], cls[None], score[None], (size, size),
                           ANCHORS, MASKS, DOWNS, 6, iou_thresh=iou_thresh,
                           use_native=False)
    for i, (r_t, o_t) in enumerate(zip(ref_targets, ours)):
        # reference [an, 6+C, gh, gw] -> ours [gh, gw, an, 6+C]
        np.testing.assert_array_equal(o_t[0].transpose(2, 3, 0, 1), r_t,
                                      err_msg=f"level {i} numpy")

    if iou_thresh >= 1.0:  # native path covers the shipping recipes only
        native = gt2yolo_targets(gt[None], cls[None], score[None],
                                 (size, size), ANCHORS, MASKS, DOWNS, 6,
                                 iou_thresh=iou_thresh, use_native=True)
        for i, (r_t, o_t) in enumerate(zip(ref_targets, native)):
            np.testing.assert_array_equal(o_t[0].transpose(2, 3, 0, 1), r_t,
                                          err_msg=f"level {i} native")

    dev = gt2yolo_targets_device(
        gt[None], cls[None], score[None], (size, size),
        np.asarray(ANCHORS, np.float32), MASKS, DOWNS, 6,
        iou_thresh=iou_thresh)
    for i, (r_t, d_t) in enumerate(zip(ref_targets, dev)):
        np.testing.assert_allclose(
            np.asarray(d_t)[0].transpose(2, 3, 0, 1), r_t, rtol=1e-5,
            atol=1e-5, err_msg=f"level {i} device")


def test_gt2yolo_chronological_collision(ref_tf):
    """Directed regression for the ordering rule this test suite uncovered:
    a LATER gt's multi-anchor extra write must overwrite an EARLIER gt's
    best-anchor write at the same (cell, slot) — the reference loop is
    purely chronological (transform.py:1383-1419).  The builders previously
    let best-category writes win regardless of gt order."""
    size = 320
    gt = np.zeros((50, 4), np.float32)
    cls = np.zeros((50,), np.int32)
    score = np.zeros((50,), np.float32)
    gt[0] = [0.505, 0.505, 116 / 320, 90 / 320]   # exactly anchor 6: best
    gt[1] = [0.508, 0.508, 0.20, 0.37]            # best elsewhere; extra @6
    cls[:2] = [1, 2]
    score[:2] = [0.9, 0.8]
    ref_sample = {"image": np.zeros((3, size, size), np.float32),
                  "gt_bbox": gt.copy(), "gt_class": cls.copy(),
                  "gt_score": score.copy()}
    ref_out = ref_tf.Gt2YoloTargetSingle(
        anchors=ANCHORS, anchor_masks=MASKS, downsample_ratios=DOWNS,
        num_classes=6, iou_thresh=0.213)(ref_sample)
    r0 = ref_out["target0"]
    assert r0[0, 5, 5, 5] == np.float32(0.8), "precondition: gt1 must win"
    assert r0[0, 7, 5, 5] == 1.0 and r0[0, 8, 5, 5] == 1.0  # multi-hot

    ours = gt2yolo_targets(gt[None], cls[None], score[None], (size, size),
                           ANCHORS, MASKS, DOWNS, 6, iou_thresh=0.213,
                           use_native=False)
    np.testing.assert_array_equal(ours[0][0].transpose(2, 3, 0, 1), r0)
    dev = gt2yolo_targets_device(gt[None], cls[None], score[None],
                                 (size, size), np.asarray(ANCHORS, np.float32),
                                 MASKS, DOWNS, 6, iou_thresh=0.213)
    np.testing.assert_allclose(np.asarray(dev[0])[0].transpose(2, 3, 0, 1),
                               r0, rtol=1e-5, atol=1e-5)


class _FakeCoco:
    """pycocotools-COCO shim over CocoJson, enough for the reference's
    data_clean (tools/data_process.py:19-86)."""

    def __init__(self, cj):
        self.cj = cj

    def loadImgs(self, img_id):
        return [self.cj.imgs[img_id]]

    def getAnnIds(self, imgIds, iscrowd=None):
        anns = self.cj.load_anns_of(imgIds, iscrowd=iscrowd)
        return [a["id"] for a in anns]

    def loadAnns(self, ids):
        by_id = {a["id"]: a for anns in self.cj.img_anns.values()
                 for a in anns}
        return [dict(by_id[i]) for i in ids]


def _coco_json(tmp_path):
    imgs = [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.jpg", "width": 64, "height": 64},
            {"id": 3, "file_name": "c.jpg", "width": 50, "height": 50}]
    annos = [
        # normal box
        {"id": 1, "image_id": 1, "category_id": 5,
         "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0},
        # out-of-bounds box -> clipped
        {"id": 2, "image_id": 1, "category_id": 7,
         "bbox": [-5, -3, 200, 200], "area": 4000, "iscrowd": 0},
        # zero-area -> dropped
        {"id": 3, "image_id": 2, "category_id": 5,
         "bbox": [5, 5, 10, 10], "area": 0, "iscrowd": 0},
        # crowd -> excluded by the iscrowd=False ann query
        {"id": 4, "image_id": 2, "category_id": 7,
         "bbox": [1, 1, 20, 20], "area": 400, "iscrowd": 1},
        # degenerate width -> clean_bbox still valid (x2 == x1)
        {"id": 5, "image_id": 3, "category_id": 5,
         "bbox": [49.5, 10, 0.2, 5], "area": 1, "iscrowd": 0},
    ]
    import json as _json
    p = tmp_path / "anno.json"
    p.write_text(_json.dumps({
        "images": imgs, "annotations": annos,
        "categories": [{"id": 5, "name": "x"}, {"id": 7, "name": "y"}]}))
    return str(p)


def test_data_clean_vs_reference(ref_tf, tmp_path):
    """Record cleaning (clip + validity filter) decides which gts train —
    prove it against the reference's own data_clean over a fake
    pycocotools shim (edge boxes: out-of-bounds, zero-area, crowd,
    degenerate width)."""
    import tools.data_process as ref_dp  # resolves into /root/reference
    from ppyolo_tpu.data import CocoJson, data_clean, category_maps

    cj = CocoJson(_coco_json(tmp_path))
    catid2clsid, _, _ = category_maps(cj)
    ref_recs = ref_dp.data_clean(_FakeCoco(cj), cj.get_img_ids(),
                                 catid2clsid, "imgs")
    our_recs = data_clean(cj, cj.get_img_ids(), catid2clsid, "imgs")
    assert len(our_recs) == len(ref_recs)
    for o, r in zip(our_recs, ref_recs):
        for k in ("im_file", "h", "w", "anno_id"):
            assert o[k] == r[k], k
        for k in ("im_id", "is_crowd", "gt_class", "gt_bbox", "gt_score"):
            np.testing.assert_array_equal(o[k], r[k], err_msg=k)


def test_get_samples_vs_reference(ref_tf, tmp_path):
    """Batch slice + mixup/cutmix partner indices (data_process.py:88-113),
    with identical RNG streams."""
    import tools.data_process as ref_dp
    from ppyolo_tpu.data import CocoJson, data_clean, category_maps
    from ppyolo_tpu.data.coco import get_samples

    cj = CocoJson(_coco_json(tmp_path))
    catid2clsid, _, _ = category_maps(cj)
    recs = data_clean(cj, cj.get_img_ids(), catid2clsid, "imgs")
    idxs = [2, 0, 1]
    for seed, iter_id in [(0, 1), (1, 5), (2, 9)]:
        np.random.seed(seed)
        ref_s = ref_dp.get_samples(recs, idxs, step=0, batch_size=2,
                                   iter_id=iter_id, with_mixup=True,
                                   with_cutmix=True, mixup_steps=6,
                                   cutmix_steps=3)
        our_s = get_samples(recs, idxs, 0, 2, iter_id, True, True, 6, 3,
                            np.random.RandomState(seed))
        assert len(our_s) == len(ref_s)
        for o, r in zip(our_s, ref_s):
            assert o["curr_iter"] == r["curr_iter"]
            assert ("mixup" in o) == ("mixup" in r)
            assert ("cutmix" in o) == ("cutmix" in r)
            if "mixup" in r:
                np.testing.assert_array_equal(o["mixup"]["im_id"],
                                              r["mixup"]["im_id"])
            if "cutmix" in r:
                np.testing.assert_array_equal(o["cutmix"]["im_id"],
                                              r["cutmix"]["im_id"])
            np.testing.assert_array_equal(o["im_id"], r["im_id"])
