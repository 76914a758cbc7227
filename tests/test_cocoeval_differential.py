"""Differential fuzz of eval/coco_metric.py against the real COCOeval.

The repo re-implements the pycocotools bbox protocol (the reference
delegates to the library: /root/reference/tools/cocotools.py:44-75).  Every
prior expectation in tests/test_coco_metric.py is hand-derived; this file
closes the self-referential gap by fuzzing ``evaluate_map`` against a
vendored reconstruction of the published pure-Python ``cocoeval.py``
(tests/vendor/cocoeval_vendored.py) on randomized gt/dt worlds covering
crowds, area bands, segmentation-style gt areas, score ties (within and
across images), empty images, gt-only and dt-only categories, degenerate
boxes, >100-dt maxDets truncation, explicit ``ignore`` flags, and unsorted
image-id orderings.  All 12 COCO stats must agree to 1e-9.

Divergences this fuzz found (now fixed in coco_metric.py, pinned below in
``test_named_regressions``):
  * image-id iteration order: pycocotools evaluates sorted(imgIds); the
    repo used gt-file order, which flips cross-image score-tie ordering in
    the global mergesort.
  * gt ``ignore`` field: pycocotools honours ``ann['ignore']`` in addition
    to iscrowd/area; the repo ignored it.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from vendor.cocoeval_vendored import reference_stats  # noqa: E402

from ppyolo_tpu.eval.coco_metric import evaluate_map  # noqa: E402


def _make_world(seed):
    """Random COCO-format gt dict + detections list."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n_imgs = int(rng.integers(1, 7))
    img_ids = rng.choice(np.arange(1, 1000), size=n_imgs, replace=False)
    rng.shuffle(img_ids)  # deliberately NOT sorted in the images list
    n_cats = int(rng.integers(1, 5))
    cat_ids = sorted(rng.choice(np.arange(1, 91), size=n_cats, replace=False))

    def rand_box():
        kind = rng.random()
        if kind < 0.3:
            w, h = rng.uniform(1, 30, 2)        # small
        elif kind < 0.65:
            w, h = rng.uniform(20, 80, 2)       # medium
        else:
            w, h = rng.uniform(60, 300, 2)      # large
        if rng.random() < 0.03:
            w = 0.0                              # degenerate
        x, y = rng.uniform(0, 400, 2)
        return [float(x), float(y), float(w), float(h)]

    def rand_score():
        if rng.random() < 0.5:
            return float(rng.integers(1, 10)) / 10.0  # force ties
        return round(float(rng.uniform(0, 1)), 6)

    anns, dets = [], []
    ann_id = 1
    big_world = rng.random() < 0.15  # exercise >100-dt maxDets truncation
    for img_id in img_ids:
        if rng.random() < 0.15:
            continue  # empty image: no gt, no dt
        for cat in cat_ids:
            role = rng.random()
            n_gt = 0 if role < 0.15 else int(rng.integers(0, 7))
            n_dt = 0 if 0.15 <= role < 0.3 else int(rng.integers(0, 9))
            if big_world and rng.random() < 0.2:
                n_dt = int(rng.integers(101, 140))
            gt_boxes = []
            for _ in range(n_gt):
                b = rand_box()
                gt_boxes.append(b)
                area = b[2] * b[3]
                if rng.random() < 0.6:
                    area *= float(rng.uniform(0.5, 1.0))  # segm-style area
                ann = {
                    "id": ann_id,
                    "image_id": int(img_id),
                    "category_id": int(cat),
                    "bbox": b,
                    "area": float(area),
                    "iscrowd": int(rng.random() < 0.25),
                }
                if rng.random() < 0.1:
                    ann["ignore"] = 1
                anns.append(ann)
                ann_id += 1
            for _ in range(n_dt):
                if gt_boxes and rng.random() < 0.7:
                    g = gt_boxes[int(rng.integers(0, len(gt_boxes)))]
                    b = [g[0] + float(rng.normal(0, 5)),
                         g[1] + float(rng.normal(0, 5)),
                         max(0.5, g[2] * float(rng.uniform(0.7, 1.3))),
                         max(0.5, g[3] * float(rng.uniform(0.7, 1.3)))]
                else:
                    b = rand_box()
                dets.append({
                    "image_id": int(img_id),
                    "category_id": int(cat),
                    "bbox": [float(v) for v in b],
                    "score": rand_score(),
                })
    gt = {
        "images": [{"id": int(i)} for i in img_ids],
        "annotations": anns,
        "categories": [{"id": int(c)} for c in cat_ids],
    }
    return gt, dets


def _assert_world_matches(seed, force_python_matcher=False, monkeypatch=None):
    gt, dets = _make_world(seed)
    if force_python_matcher and monkeypatch is not None:
        import ppyolo_tpu.native as native
        monkeypatch.setattr(native, "match_greedy",
                            lambda *a, **k: None)
        monkeypatch.setattr(native, "bbox_iou_xywh",
                            lambda *a, **k: None)
    ours = evaluate_map(gt, dets, verbose=False)
    ref = reference_stats(gt, dets)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-9,
                               err_msg=f"seed={seed}")


@pytest.mark.parametrize("seed", range(60))
def test_fuzz_vs_pycocotools(seed):
    _assert_world_matches(seed)


@pytest.mark.parametrize("seed", range(1000, 1012))
def test_fuzz_python_fallback_matcher(seed, monkeypatch):
    """Same differential check with the native C matcher disabled, so the
    pure-python greedy fallback in _match_img is certified too."""
    _assert_world_matches(seed, force_python_matcher=True,
                          monkeypatch=monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("block", range(6))
def test_fuzz_vs_pycocotools_deep(block):
    for seed in range(2000 + block * 60, 2000 + (block + 1) * 60):
        _assert_world_matches(seed)


def test_named_regressions():
    """Divergences the fuzz originally surfaced, pinned as explicit worlds.

    1. Cross-image score ties with UNSORTED image lists: pycocotools
       iterates sorted(imgIds), so the global mergesort sees image 5's
       detections before image 900's on equal scores even when the gt file
       lists 900 first.
    2. gt ``ignore`` flag: an annotation with ignore=1 must drop out of the
       gt pool (npig) and suppress its matched dt like a crowd/area ignore.
    """
    gt = {
        "images": [{"id": 900}, {"id": 5}],  # unsorted on purpose
        "annotations": [
            {"id": 1, "image_id": 900, "category_id": 1,
             "bbox": [10, 10, 40, 40], "area": 1600.0, "iscrowd": 0},
            {"id": 2, "image_id": 5, "category_id": 1,
             "bbox": [10, 10, 40, 40], "area": 1600.0, "iscrowd": 0},
            {"id": 3, "image_id": 5, "category_id": 1,
             "bbox": [200, 200, 50, 50], "area": 2500.0, "iscrowd": 0,
             "ignore": 1},
        ],
        "categories": [{"id": 1}],
    }
    dets = [
        # equal scores across images: pycocotools orders img 5 first
        {"image_id": 900, "category_id": 1, "bbox": [300, 300, 5, 5],
         "score": 0.5},                                   # FP in img 900
        {"image_id": 5, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.5},                                   # TP in img 5
        # matches the ignore=1 gt -> must be ignored, not a FP
        {"image_id": 5, "category_id": 1, "bbox": [200, 200, 50, 50],
         "score": 0.4},
    ]
    ours = evaluate_map(gt, dets, verbose=False)
    ref = reference_stats(gt, dets)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-9)
