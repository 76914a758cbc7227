"""Built-in COCOeval-compatible metric vs hand-computed cases."""
import numpy as np

from ppyolo_tpu.eval.coco_metric import evaluate_map


def _gt(images_boxes, crowd=None):
    """images_boxes: {img_id: [xywh, ...]} single category."""
    images, anns = [], []
    aid = 1
    for img_id, boxes in images_boxes.items():
        images.append({"id": img_id, "width": 1000, "height": 1000})
        for i, b in enumerate(boxes):
            anns.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "bbox": list(map(float, b)), "area": float(b[2] * b[3]),
                "iscrowd": int(bool(crowd and (img_id, i) in crowd)),
            })
            aid += 1
    return {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "thing"}]}


def _dt(rows):
    return [{"image_id": i, "category_id": 1,
             "bbox": list(map(float, b)), "score": float(s)}
            for i, b, s in rows]


def test_perfect_detection_ap1():
    gt = _gt({1: [[10, 10, 50, 50]], 2: [[100, 100, 80, 40]]})
    dt = _dt([(1, [10, 10, 50, 50], 0.9), (2, [100, 100, 80, 40], 0.8)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[0], 1.0)
    assert np.isclose(stats[1], 1.0)


def test_half_recall():
    gt = _gt({1: [[10, 10, 50, 50], [200, 200, 50, 50]]})
    dt = _dt([(1, [10, 10, 50, 50], 0.9)])
    stats = evaluate_map(gt, dt, verbose=False)
    # precision 1 up to recall .5 -> 101-pt AP = 51/101
    assert np.isclose(stats[1], 51 / 101, atol=1e-6)


def test_fp_ordering_matters():
    gt = _gt({1: [[10, 10, 50, 50]]})
    # FP scored higher than the TP
    dt = _dt([(1, [500, 500, 50, 50], 0.9), (1, [10, 10, 50, 50], 0.8)])
    stats_fp_first = evaluate_map(gt, dt, verbose=False)
    # TP scored higher than the FP
    dt2 = _dt([(1, [500, 500, 50, 50], 0.7), (1, [10, 10, 50, 50], 0.8)])
    stats_tp_first = evaluate_map(gt, dt2, verbose=False)
    assert np.isclose(stats_fp_first[1], 0.5, atol=1e-6)
    assert np.isclose(stats_tp_first[1], 1.0, atol=1e-6)


def test_iou_threshold_sweep():
    gt = _gt({1: [[0, 0, 100, 100]]})
    # dt shifted so IoU = (100-20)*100 / (2*100*100 - 80*100) = 8000/12000 = 2/3
    dt = _dt([(1, [20, 0, 100, 100], 0.9)])
    stats = evaluate_map(gt, dt, verbose=False)
    # passes thresholds .50, .55, .60, .65 -> 4/10 of full AP
    assert np.isclose(stats[0], 0.4, atol=1e-6)
    assert np.isclose(stats[1], 1.0)


def test_crowd_gt_ignored():
    gt = _gt({1: [[10, 10, 50, 50], [300, 300, 100, 100]]},
             crowd={(1, 1)})
    # detection inside crowd region matches crowd -> ignored, not FP
    dt = _dt([(1, [10, 10, 50, 50], 0.9), (1, [310, 310, 40, 40], 0.8)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[1], 1.0, atol=1e-6)


def test_area_ranges():
    # one small (20x20=400 < 1024) and one large gt
    gt = _gt({1: [[10, 10, 20, 20], [100, 100, 200, 200]]})
    dt = _dt([(1, [10, 10, 20, 20], 0.9), (1, [100, 100, 200, 200], 0.8)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[3], 1.0)   # APs
    assert np.isclose(stats[5], 1.0)   # APl
    assert stats[4] == -1.0            # no medium gt


def test_multi_category_averaging():
    gt = _gt({1: [[10, 10, 50, 50]]})
    gt["categories"].append({"id": 2, "name": "other"})
    gt["annotations"].append({
        "id": 99, "image_id": 1, "category_id": 2,
        "bbox": [200.0, 200.0, 50.0, 50.0], "area": 2500.0, "iscrowd": 0})
    dt = _dt([(1, [10, 10, 50, 50], 0.9)])  # cat 1 perfect, cat 2 missed
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[1], 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# Round-2 VERDICT item #3: pycocotools edge-semantics ported as adversarial
# protocol tests (reference delegates to pycocotools, tools/cocotools.py:44-75;
# the semantics below are from the published cocoeval.py evaluateImg/accumulate
# algorithm, with every expected value hand-derived in comments).
# ---------------------------------------------------------------------------


def test_crowd_gt_matched_by_multiple_dts():
    """Only crowd gts may absorb several dts (`if gtm>0 and not iscrowd:
    continue`).  Two dts inside one crowd region are BOTH ignored; if the
    multi-match were refused the second would become an FP and drag AP50
    to 0.5."""
    gt = _gt({1: [[0, 0, 50, 50], [200, 200, 100, 100]]}, crowd={(1, 1)})
    dt = _dt([
        (1, [200, 200, 50, 50], 0.9),   # inside crowd: IoU_crowd = 1.0
        (1, [250, 250, 50, 50], 0.8),   # ALSO inside crowd: must also match
        (1, [0, 0, 50, 50], 0.7),       # the real TP
    ])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[1], 1.0, atol=1e-6)
    assert np.isclose(stats[0], 1.0, atol=1e-6)


def test_area_ignored_noncrowd_gt_not_rematchable():
    """An area-out-of-range NON-crowd gt is taken by its first match like a
    regular gt — pycocotools' continue-condition checks iscrowd, NOT the
    ignore flag.  In the small band: g0 (45x45=2025, medium) is ignored;
    d0 matches it (ignored), d1 (32x32, in-band) overlaps g0 at IoU
    1024/2025=0.506 but may NOT rematch it -> unmatched, in-range -> FP.
    small-band sequence [ign, FP, TP]: precision at the TP = 1/2 at EVERY
    IoU threshold (at t>=0.55 d1 fails the IoU bar and is an FP anyway),
    so APs = 0.5.  The rematch bug yields APs = (1.0 + 9*0.5)/10 = 0.55."""
    gt = _gt({1: [[0, 0, 45, 45], [100, 100, 20, 20]]})
    dt = _dt([
        (1, [0, 0, 45, 45], 0.9),
        (1, [0, 0, 32, 32], 0.8),
        (1, [100, 100, 20, 20], 0.7),
    ])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[3], 0.5, atol=1e-6), f"APs={stats[3]}"


def test_break_prefers_nonignored_match_over_better_crowd():
    """Once a dt holds a non-ignored match, the scan BREAKS at the first
    ignored gt — even when the crowd IoU is higher (pycocotools
    `if m>-1 and gtIg[m]==0 and gtIg[gind]==1: break`).  dt has IoU 0.6
    with the real gt and 0.9 with the crowd: thr .50-.60 -> TP via the real
    gt (3 thresholds, AP_t=1); thr .65-.95 -> falls back to the crowd ->
    ignored, never an FP (AP_t=0, not negative).  AP = 0.3, AP50 = 1."""
    gt = _gt({1: [[0, 0, 100, 100], [0, 25, 100, 90]]}, crowd={(1, 1)})
    # dt [0,25,100,100]: IoU vs gt0 = 7500/12500 = 0.6;
    # IoU vs crowd = (100*90)/(100*100) = 0.9 (crowd union = dt area)
    dt = _dt([(1, [0, 25, 100, 100], 0.9)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[1], 1.0, atol=1e-6)
    assert np.isclose(stats[0], 0.3, atol=1e-6)


def test_score_ties_across_images_mergesort_stable():
    """Equal scores across images keep concatenation order (mergesort in
    accumulate; evals are concatenated in img_ids order).  FP in img1 and
    TP in img2 at the same score -> order [FP, TP] -> AP50 = precision at
    the TP = 1/2.  Swapping which image holds the TP flips it to 1.0."""
    gt = _gt({1: [], 2: [[0, 0, 50, 50]]})
    dt = _dt([(1, [500, 500, 50, 50], 0.5), (2, [0, 0, 50, 50], 0.5)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[1], 0.5, atol=1e-6)

    gt2 = _gt({1: [[0, 0, 50, 50]], 2: []})
    dt2 = _dt([(1, [0, 0, 50, 50], 0.5), (2, [500, 500, 50, 50], 0.5)])
    stats2 = evaluate_map(gt2, dt2, verbose=False)
    assert np.isclose(stats2[1], 1.0, atol=1e-6)


def test_maxdets_truncation_semantics():
    """maxDets=1/10 are per-image TRUNCATIONS of the maxDet=100 matching
    (greedy matching of dt i never depends on later dts), not re-matches.
    img1 has 2 gts; with both dts TPs, AR1 keeps only the top-scoring dt
    -> recall 1/2, AR10/AR100 -> 1.  When the TOP dt is an FP, AR1 = 0
    even though a TP exists below it."""
    gt = _gt({1: [[0, 0, 50, 50], [200, 200, 50, 50]]})
    dt = _dt([(1, [0, 0, 50, 50], 0.9), (1, [200, 200, 50, 50], 0.8)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[6], 0.5, atol=1e-6)   # AR1
    assert np.isclose(stats[7], 1.0, atol=1e-6)   # AR10
    assert np.isclose(stats[8], 1.0, atol=1e-6)   # AR100

    dt2 = _dt([(1, [500, 500, 50, 50], 0.9), (1, [0, 0, 50, 50], 0.8)])
    stats2 = evaluate_map(gt, dt2, verbose=False)
    assert np.isclose(stats2[6], 0.0, atol=1e-6)  # top-1 is the FP
    assert np.isclose(stats2[8], 0.5, atol=1e-6)


def test_area_boundaries_are_inclusive():
    """areaRng are CLOSED intervals: area exactly 32^2 belongs to both the
    small [0, 1024] and medium [1024, 9216] bands; 96^2 to both medium and
    large (ignore rule is `area < rng[0] or area > rng[1]`)."""
    gt = _gt({1: [[0, 0, 32, 32]], 2: [[0, 0, 96, 96]]})
    dt = _dt([(1, [0, 0, 32, 32], 0.9), (2, [0, 0, 96, 96], 0.8)])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[3], 1.0)   # APs: the 1024 gt counts as small
    assert np.isclose(stats[4], 1.0)   # APm: 1024 AND 9216 both medium
    assert np.isclose(stats[5], 1.0)   # APl: the 9216 gt counts as large


def test_combined_protocol_hand_derived_values():
    """A non-trivial combined case (crowd + cross-image merge + 101-point
    interpolation + IoU sweep) with expected values hand-derived from the
    published COCOeval algorithm:

    gts: img1 A=[0,0,100,100], B=[200,200,100,100], crowd C=[400,400,100,100];
         img2 D=[0,0,100,100].  num_gt = 3.
    dts (global score order):
      d1 img1 [0,0,100,100]   .95  TP(A) at every threshold (IoU 1.0)
      d2 img2 [10,0,100,100]  .90  IoU(D) = 9000/11000 = 0.8182:
                                   TP for thr <= .80, FP for thr >= .85
      d3 img1 [410,410,80,80] .85  inside crowd C (IoU_crowd = 1) -> ignored
      d4 img1 [600,600,50,50] .80  FP at every threshold
      d5 img1 [200,200,100,100].75 TP(B) at every threshold

    thr <= .80 (7 thrs): seq [TP,TP,FP,TP] -> rc=[1/3,2/3,2/3,1],
      pr=[1,1,2/3,3/4] -> interp [1,1,3/4,3/4];
      101-pt: 34 pts @1 (r<=.33), 33 pts @1 (.34-.66), 34 pts @3/4 ->
      AP_t = 92.5/101.
    thr >= .85 (3 thrs): seq [TP,FP,FP,TP] -> rc=[1/3,1/3,1/3,2/3],
      pr interp [1,.5,.5,.5]; 34 pts @1, 33 pts @.5, 34 pts @0 ->
      AP_t = 50.5/101.
    AP = (7*92.5 + 3*50.5)/1010 = 799/1010;  AP50 = 92.5/101;
    AR100 = (7*1 + 3*(2/3))/10 = 0.9.
    """
    gt = _gt({1: [[0, 0, 100, 100], [200, 200, 100, 100],
                  [400, 400, 100, 100]],
              2: [[0, 0, 100, 100]]},
             crowd={(1, 2)})
    dt = _dt([
        (1, [0, 0, 100, 100], 0.95),
        (2, [10, 0, 100, 100], 0.90),
        (1, [410, 410, 80, 80], 0.85),
        (1, [600, 600, 50, 50], 0.80),
        (1, [200, 200, 100, 100], 0.75),
    ])
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[0], 799.0 / 1010.0, atol=1e-9), stats[0]
    assert np.isclose(stats[1], 92.5 / 101.0, atol=1e-9), stats[1]
    assert np.isclose(stats[8], 0.9, atol=1e-9), stats[8]
