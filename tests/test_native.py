"""Native C++ host library vs numpy fallbacks."""
import numpy as np
import pytest

from ppyolo_tpu import native
from ppyolo_tpu.eval.coco_metric import _bbox_iou_xywh, IOU_THRS


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("g++ build unavailable")
    return l


def test_native_iou_matches_python(lib):
    r = np.random.RandomState(0)
    dt = np.abs(r.rand(7, 4)) * 100
    gt = np.abs(r.rand(5, 4)) * 100
    crowd = np.array([0, 1, 0, 0, 1], bool)
    got = native.bbox_iou_xywh(dt, gt, crowd)
    ref = _bbox_iou_xywh(dt, gt, crowd)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_native_match_matches_python(lib):
    r = np.random.RandomState(1)
    nd, ng = 9, 6
    ious = r.rand(nd, ng)
    g_ignore = np.array([0, 0, 0, 0, 1, 1], bool)  # non-ignored first
    # exercise both ignored kinds: one crowd, one area-out-of-range
    g_crowd = np.array([0, 0, 0, 0, 0, 1], bool)
    got = native.match_greedy(ious, g_ignore, g_crowd, IOU_THRS)
    assert got is not None
    dt_m_n, gt_m_n = got
    # python oracle (same algorithm as coco_metric fallback)
    T = len(IOU_THRS)
    dt_m = np.zeros((T, nd), np.int64) - 1
    gt_m = np.zeros((T, ng), np.int64) - 1
    for t, thr in enumerate(IOU_THRS):
        for di in range(nd):
            best, m = min(thr, 1 - 1e-10), -1
            for gi in range(ng):
                if gt_m[t, gi] >= 0 and not g_crowd[gi]:
                    continue
                if m > -1 and not g_ignore[m] and g_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best, m = ious[di, gi], gi
            if m >= 0:
                dt_m[t, di] = m
                gt_m[t, m] = di
    np.testing.assert_array_equal(dt_m_n, dt_m)
    np.testing.assert_array_equal(gt_m_n, gt_m)


def test_metric_still_correct_with_native(lib):
    # end-to-end: perfect detection AP stays 1.0 through the native path
    from ppyolo_tpu.eval.coco_metric import evaluate_map

    gt = {
        "images": [{"id": 1, "width": 100, "height": 100}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [10.0, 10.0, 50.0, 50.0], "area": 2500.0,
                         "iscrowd": 0}],
        "categories": [{"id": 1, "name": "x"}],
    }
    dt = [{"image_id": 1, "category_id": 1, "bbox": [10.0, 10.0, 50.0, 50.0],
           "score": 0.9}]
    stats = evaluate_map(gt, dt, verbose=False)
    assert np.isclose(stats[0], 1.0)


def test_pack_u8_bitwise_matches_numpy(lib):
    """native.pack_u8 == clip(rint(x)).astype(u8) BITWISE, including the
    half-to-even ties (np.rint) and out-of-range clamps the loader's
    assemble_batch relies on (r5 zero-temporary pack path)."""
    r = np.random.RandomState(3)
    x = (r.rand(64, 64, 3).astype(np.float32) * 300.0 - 20.0)
    # force exact .5 ties on both parities + boundary/negative values
    x[0, 0, :] = [0.5, 1.5, 2.5]
    x[0, 1, :] = [254.5, 255.5, 253.5]
    x[0, 2, :] = [-0.5, -3.7, 300.25]
    x[0, 3, :] = [0.0, 255.0, 127.5]
    dst = np.empty(x.shape, np.uint8)
    assert native.pack_u8(x, dst)
    ref = np.clip(np.rint(x), 0.0, 255.0).astype(np.uint8)
    np.testing.assert_array_equal(dst, ref)
