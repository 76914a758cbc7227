"""Vectorized Gt2YoloTarget vs an independent per-sample loop oracle
(spec: reference tools/transform.py:1318-1421)."""
import numpy as np
import pytest

from ppyolo_tpu.data.targets import gt2yolo_targets

ANCHORS = [[10, 14], [23, 27], [37, 58], [81, 82], [135, 169], [344, 319]]
MASKS = [[3, 4, 5], [0, 1, 2]]
DS = [32, 16]


def _oracle_single(gt_bbox, gt_class, gt_score, h, w, num_classes, iou_thresh=1.0):
    an_hw = np.array(ANCHORS) / np.array([[w, h]])

    def jac(gw, gh, aw, ah):
        inter = min(gw, aw) * min(gh, ah)
        return inter / (gw * gh + aw * ah - inter)

    outs = []
    for mask, ds in zip(MASKS, DS):
        gh_, gw_ = int(h / ds), int(w / ds)
        t = np.zeros((len(mask), 6 + num_classes, gh_, gw_), np.float32)
        for b in range(gt_bbox.shape[0]):
            gx, gy, gw, gh = gt_bbox[b]
            cls, score = gt_class[b], gt_score[b]
            if gw <= 0 or gh <= 0 or score <= 0:
                continue
            best_iou, best_idx = 0.0, -1
            for a in range(len(ANCHORS)):
                iou = jac(gw, gh, an_hw[a, 0], an_hw[a, 1])
                if iou > best_iou:
                    best_iou, best_idx = iou, a
            gi, gj = int(gx * gw_), int(gy * gh_)
            if best_idx in mask:
                bn = mask.index(best_idx)
                t[bn, 0, gj, gi] = gx * gw_ - gi
                t[bn, 1, gj, gi] = gy * gh_ - gj
                t[bn, 2, gj, gi] = np.log(gw * w / ANCHORS[best_idx][0])
                t[bn, 3, gj, gi] = np.log(gh * h / ANCHORS[best_idx][1])
                t[bn, 4, gj, gi] = 2.0 - gw * gh
                t[bn, 5, gj, gi] = score
                t[bn, 6 + int(cls), gj, gi] = 1.0
        outs.append(t)
    return outs


def test_targets_match_loop_oracle():
    rng = np.random.RandomState(0)
    b, m, c = 3, 12, 7
    h = w = 64
    gt_bbox = np.zeros((b, m, 4), np.float32)
    gt_bbox[..., 0:2] = rng.uniform(0.1, 0.9, (b, m, 2))
    gt_bbox[..., 2:4] = rng.uniform(0.02, 0.6, (b, m, 2))
    gt_bbox[:, 8:] = 0  # padded rows
    gt_class = rng.randint(0, c, (b, m))
    gt_score = np.ones((b, m), np.float32)
    gt_score[:, 8:] = 0

    got = gt2yolo_targets(gt_bbox, gt_class, gt_score, (h, w), ANCHORS, MASKS,
                          DS, c)
    for bi in range(b):
        ref = _oracle_single(gt_bbox[bi], gt_class[bi], gt_score[bi], h, w, c)
        for lvl in range(len(MASKS)):
            # ours is [gh, gw, an, ch]; oracle [an, ch, gh, gw]
            mine = got[lvl][bi].transpose(2, 3, 0, 1)
            np.testing.assert_allclose(mine, ref[lvl], atol=1e-6)


def test_targets_tscale_and_values():
    # single centered box matching anchor 4 of level 0
    h = w = 128
    aw, ah = 135 / w, 169 / h
    gt_bbox = np.array([[[0.5, 0.5, aw, ah]]], np.float32)
    gt_class = np.array([[2]])
    gt_score = np.ones((1, 1), np.float32)
    t = gt2yolo_targets(gt_bbox, gt_class, gt_score, (h, w), ANCHORS, MASKS, DS, 4)
    lvl0 = t[0][0]              # [4, 4, 3, 10]
    gi = gj = 2
    slot = MASKS[0].index(4)
    cell = lvl0[gj, gi, slot]
    assert np.isclose(cell[0], 0.0) and np.isclose(cell[1], 0.0)
    assert np.isclose(cell[2], 0.0, atol=1e-6)   # log(gw*w/anchor_w)=log(1)
    assert np.isclose(cell[4], 2.0 - aw * ah)
    assert cell[5] == 1.0 and cell[6 + 2] == 1.0
    assert t[1].sum() == 0      # nothing lands on level 1


def test_native_scatter_matches_numpy():
    from ppyolo_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    b, m, c = 4, 20, 9
    h = w = 128
    gt_bbox = np.zeros((b, m, 4), np.float32)
    gt_bbox[..., 0:2] = rng.uniform(0.05, 0.95, (b, m, 2))
    gt_bbox[..., 2:4] = rng.uniform(0.01, 0.7, (b, m, 2))
    gt_bbox[:, 15:] = 0
    gt_class = rng.randint(0, c, (b, m))
    gt_score = np.ones((b, m), np.float32)
    gt_score[:, 15:] = 0
    a = gt2yolo_targets(gt_bbox, gt_class, gt_score, (h, w), ANCHORS, MASKS,
                        DS, c, use_native=True)
    ref = gt2yolo_targets(gt_bbox, gt_class, gt_score, (h, w), ANCHORS, MASKS,
                          DS, c, use_native=False)
    for x, y in zip(a, ref):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_iou_thresh_secondary_assignment():
    """iou_thresh<1 multi-anchor path (transform.py:1397-1419): non-best
    same-level anchors above the threshold also receive the target."""
    h = w = 128
    # box sized exactly like anchor 4 -> best match anchor 4; anchor 3 (81x82)
    # has wh-IoU ~ (81*82)/(135*169) = 0.29 with it
    aw, ah = 135 / w, 169 / h
    gt_bbox = np.array([[[0.5, 0.5, aw, ah]]], np.float32)
    gt_class = np.array([[1]])
    gt_score = np.ones((1, 1), np.float32)
    t = gt2yolo_targets(gt_bbox, gt_class, gt_score, (h, w), ANCHORS, MASKS,
                        DS, 4, iou_thresh=0.25, use_native=False)
    lvl0 = t[0][0]
    slot_best = MASKS[0].index(4)
    slot_sec = MASKS[0].index(3)
    gi = gj = 2
    assert lvl0[gj, gi, slot_best, 5] == 1.0       # best anchor assigned
    assert lvl0[gj, gi, slot_sec, 5] == 1.0        # secondary assigned
    # anchor 5 (344x319): wh-IoU ~ 0.21 < 0.25 -> NOT assigned
    slot_far = MASKS[0].index(5)
    assert lvl0[gj, gi, slot_far, 5] == 0.0
    # tw/th encode each slot's own anchor (transform.py:1409-1411)
    np.testing.assert_allclose(lvl0[gj, gi, slot_sec, 2],
                               np.log(aw * w / ANCHORS[3][0]), rtol=1e-5)


def _rand_gts(rng, b=3, m=50, nc=6, n_valid=12, collide=True):
    gt_bbox = np.zeros((b, m, 4), np.float32)
    gt_bbox[:, :n_valid, 0:2] = rng.uniform(0.05, 0.95, (b, n_valid, 2))
    gt_bbox[:, :n_valid, 2:4] = rng.uniform(0.02, 0.6, (b, n_valid, 2))
    if collide:
        # force cell/slot collisions: identical centers + near-identical wh
        gt_bbox[:, 1, :] = gt_bbox[:, 0, :] * [1.0, 1.0, 1.02, 1.02]
        gt_bbox[:, 1, 0:2] = gt_bbox[:, 0, 0:2]
    gt_class = rng.randint(0, nc, (b, m))
    gt_score = np.zeros((b, m), np.float32)
    gt_score[:, :n_valid] = rng.uniform(0.3, 1.0, (b, n_valid))
    return gt_bbox, gt_class, gt_score


@pytest.mark.slow
def test_device_targets_match_numpy(tmp_path):
    """gt2yolo_targets_device (dense argmax-gather, jnp) == numpy scatter,
    incl. collision last-wins + multi-hot class semantics."""
    import jax.numpy as jnp
    from ppyolo_tpu.data.targets import gt2yolo_targets_device
    from configs import PPYOLO_r18vd_Config

    cfg = PPYOLO_r18vd_Config()
    tc = cfg.gt2YoloTarget
    rng = np.random.RandomState(0)
    for size in (96, 128):
        gt_bbox, gt_class, gt_score = _rand_gts(rng, nc=6)
        ref = gt2yolo_targets(gt_bbox, gt_class, gt_score, (size, size),
                              tc["anchors"], tc["anchor_masks"],
                              tc["downsample_ratios"], 6, use_native=False)
        got = gt2yolo_targets_device(
            jnp.asarray(gt_bbox), jnp.asarray(gt_class),
            jnp.asarray(gt_score), (size, size), tc["anchors"],
            tc["anchor_masks"], tc["downsample_ratios"], 6)
        for li, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5,
                                       atol=1e-5, err_msg=f"level {li}")


def test_device_targets_match_numpy_iou_thresh():
    import jax.numpy as jnp
    from ppyolo_tpu.data.targets import gt2yolo_targets_device
    from configs import PPYOLO_r18vd_Config

    cfg = PPYOLO_r18vd_Config()
    tc = cfg.gt2YoloTarget
    rng = np.random.RandomState(1)
    gt_bbox, gt_class, gt_score = _rand_gts(rng, nc=6)
    ref = gt2yolo_targets(gt_bbox, gt_class, gt_score, (96, 96),
                          tc["anchors"], tc["anchor_masks"],
                          tc["downsample_ratios"], 6, iou_thresh=0.4,
                          use_native=False)
    got = gt2yolo_targets_device(
        jnp.asarray(gt_bbox), jnp.asarray(gt_class), jnp.asarray(gt_score),
        (96, 96), tc["anchors"], tc["anchor_masks"],
        tc["downsample_ratios"], 6, iou_thresh=0.4)
    for li, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-5,
                                   err_msg=f"level {li}")


def test_device_targets_many_boxes_collision():
    """m=300 padded boxes: priorities exceed bf16's exact-integer range, so
    the builder must fall back to fp32 — colliding HIGH-index gts would
    otherwise both 'win' and sum their field rows (code-review find; was
    m=150 when priorities spanned 2m+1, m+1 since the chronological-order
    parity fix)."""
    import jax.numpy as jnp
    from ppyolo_tpu.data.targets import gt2yolo_targets_device
    from configs import PPYOLO_r18vd_Config

    cfg = PPYOLO_r18vd_Config()
    tc = cfg.gt2YoloTarget
    rng = np.random.RandomState(3)
    b, m = 2, 300
    gt_bbox = np.zeros((b, m, 4), np.float32)
    gt_class = rng.randint(0, 6, (b, m))
    gt_score = np.zeros((b, m), np.float32)
    # two colliding boxes at high indices (same center, near-same wh) —
    # adjacent bf16 integers above 256 would collapse their priorities
    for i in (286, 287):
        gt_bbox[:, i, 0:2] = [0.5, 0.5]
        gt_bbox[:, i, 2:4] = [0.2, 0.25] if i == 286 else [0.204, 0.255]
        gt_score[:, i] = 1.0
    ref = gt2yolo_targets(gt_bbox, gt_class, gt_score, (96, 96),
                          tc["anchors"], tc["anchor_masks"],
                          tc["downsample_ratios"], 6, use_native=False)
    got = gt2yolo_targets_device(
        jnp.asarray(gt_bbox), jnp.asarray(gt_class), jnp.asarray(gt_score),
        (96, 96), tc["anchors"], tc["anchor_masks"],
        tc["downsample_ratios"], 6)
    for li, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-5,
                                   err_msg=f"level {li}")
