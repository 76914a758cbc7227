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
