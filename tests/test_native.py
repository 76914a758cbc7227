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


def test_color_distort_fused_bitwise_matches_numpy(lib):
    """The fused native ColorDistort pass == the per-op numpy chain BITWISE
    for every op subset/order and both input dtypes (u8 from mixup/decode,
    f32).  This is the contract that lets the loader run one zero-temporary
    pass where numpy ran up to ~10 full-image temporaries; the trickiest
    clause is hue: np.dot(img3d, t) rounds each f32 product but accumulates
    in FLOAT64 (numpy's strided FLOAT_dot — not sgemm), which host_ops.cpp
    reproduces exactly."""
    from ppyolo_tpu.data.transforms import ColorDistort

    cd = ColorDistort()
    r = np.random.RandomState(11)
    import itertools

    checked = 0
    for dtype in (np.uint8, np.float32):
        if dtype == np.uint8:
            img = r.randint(0, 256, (37, 53, 3)).astype(np.uint8)
        else:
            img = r.uniform(-30.0, 300.0, (37, 53, 3)).astype(np.float32)
        for n in range(1, 5):
            for combo in itertools.permutations(range(4), n):
                ops = [(c, float(r.uniform(*getattr(
                    cd, cd._OP_ATTRS[c])[:2]))) for c in combo]
                fused = native.color_distort(
                    img, np.array([c for c, _ in ops], np.int32),
                    cd._pack_params(ops))
                assert fused is not None and fused.dtype == np.float32
                ref = img
                for code, delta in ops:
                    ref = cd._apply_numpy(ref, code, delta)
                np.testing.assert_array_equal(
                    fused.view(np.uint32), ref.view(np.uint32),
                    err_msg=f"dtype={dtype} ops={ops}")
                checked += 1
    assert checked == 2 * (4 + 12 + 24 + 24)


def test_mixup_fused_bitwise_matches_numpy(lib):
    """native.mixup_u8 == the numpy zeros/astype/scale/add/cast chain
    BITWISE over asymmetric shapes (im1 taller, im2 wider, equal) and
    factors including ones with inexact f32 casts."""
    r = np.random.RandomState(7)
    for (h1, w1), (h2, w2) in [((40, 30), (25, 55)), ((25, 55), (40, 30)),
                               ((33, 44), (33, 44)), ((10, 10), (64, 64))]:
        im1 = r.randint(0, 256, (h1, w1, 3)).astype(np.uint8)
        im2 = r.randint(0, 256, (h2, w2, 3)).astype(np.uint8)
        for factor in (0.5, 0.123456789, 0.9999, float(r.beta(1.5, 1.5))):
            fused = native.mixup_u8(im1, im2, factor)
            assert fused is not None
            h, w = max(h1, h2), max(w1, w2)
            ref = np.zeros((h, w, 3), np.float32)
            ref[:h1, :w1] = im1.astype(np.float32) * factor
            ref[:h2, :w2] += im2.astype(np.float32) * (1 - factor)
            ref = ref.astype(np.uint8)
            np.testing.assert_array_equal(
                fused, ref, err_msg=f"shapes {(h1,w1)}x{(h2,w2)} f={factor}")
    # non-u8 inputs decline to the numpy path
    assert native.mixup_u8(im1.astype(np.float32), im2, 0.5) is None
