"""Data pipeline tests: transforms, COCO record cleaning, batch assembly."""
import json

import numpy as np
import pytest

from ppyolo_tpu.data import (CocoJson, category_maps, data_clean,
                             assemble_batch, train_batches, Prefetcher,
                             transforms as T)
from configs import PPYOLO_r18vd_Config

RNG = np.random.RandomState(0)


def _sample(h=40, w=60, nboxes=2):
    return {
        "image": RNG.randint(0, 255, (h, w, 3)).astype(np.uint8),
        "gt_bbox": np.array([[5, 5, 20, 30], [30, 10, 55, 35]][:nboxes],
                            np.float32),
        "gt_class": np.array([[1], [3]][:nboxes], np.int32),
        "gt_score": np.ones((nboxes, 1), np.float32),
        "is_crowd": np.zeros((nboxes, 1), np.int32),
        "h": h, "w": w,
    }


def test_normalize_box_and_xywh():
    s = _sample()
    T.NormalizeBox()(s, RNG)
    assert s["gt_bbox"].max() <= 1.0
    np.testing.assert_allclose(s["gt_bbox"][0], [5 / 60, 5 / 40, 20 / 60, 30 / 40])
    T.BboxXYXY2XYWH()(s, RNG)
    np.testing.assert_allclose(
        s["gt_bbox"][0],
        [(5 + 20) / 2 / 60, (5 + 30) / 2 / 40, 15 / 60, 25 / 40], rtol=1e-5)


def test_flip_box_math():
    s = _sample()
    rng = np.random.RandomState(1)
    op = T.RandomFlipImage(prob=1.1)  # always flip
    before = s["gt_bbox"].copy()
    op(s, rng)
    np.testing.assert_allclose(s["gt_bbox"][:, 0], 60 - before[:, 2] - 1)
    np.testing.assert_allclose(s["gt_bbox"][:, 2], 60 - before[:, 0] - 1)
    assert s["flipped"]


def test_pad_box():
    s = _sample()
    T.PadBox(num_max_boxes=50)(s, RNG)
    assert s["gt_bbox"].shape == (50, 4)
    assert s["gt_class"].shape == (50,)
    assert s["gt_score"].shape == (50,)
    assert s["gt_score"][:2].sum() == 2.0 and s["gt_score"][2:].sum() == 0


def test_mixup_concat():
    s = _sample()
    s["mixup"] = _sample(h=50, w=50)
    rng = np.random.RandomState(0)
    out = T.MixupImage()(s, rng)
    assert out["image"].shape[0] == 50 and out["image"].shape[1] == 60
    assert out["gt_bbox"].shape[0] == 4
    np.testing.assert_allclose(out["gt_score"].sum(), 4 * 0.5, atol=1.0)


def test_random_expand_box_shift():
    s = _sample()
    rng = np.random.RandomState(7)
    op = T.RandomExpand(prob=1.0)  # note: expands when uniform >= prob fails
    # force the expand branch: prob=0 means always expand per reference logic
    op = T.RandomExpand(prob=0.0)
    before = s["gt_bbox"].copy()
    op(s, rng)
    assert s["h"] >= 40 and s["w"] >= 60
    wh = s["gt_bbox"][:, 2:] - s["gt_bbox"][:, :2]
    np.testing.assert_allclose(wh, before[:, 2:] - before[:, :2])


def test_random_crop_keeps_boxes_valid():
    rng = np.random.RandomState(2)
    for _ in range(5):
        s = _sample(h=100, w=120)
        T.RandomCrop()(s, rng)
        b = s["gt_bbox"]
        if len(b):
            assert (b[:, 2:] > b[:, :2]).all()
            assert b[:, 0::2].max() <= s["w"] and b[:, 1::2].max() <= s["h"]


def test_color_distort_runs():
    s = _sample()
    out = T.ColorDistort()(s, np.random.RandomState(3))
    assert out["image"].shape == (40, 60, 3)


def test_coco_json_and_clean(tmp_path):
    anno = {
        "images": [{"id": 7, "file_name": "a.jpg", "width": 100, "height": 80}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 5,
             "bbox": [-5, 10, 30, 30], "area": 900, "iscrowd": 0},
            {"id": 2, "image_id": 7, "category_id": 9,
             "bbox": [10, 10, 0, 5], "area": 0, "iscrowd": 0},   # invalid
        ],
        "categories": [{"id": 5, "name": "cat"}, {"id": 9, "name": "dog"}],
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(anno))
    coco = CocoJson(str(p))
    catid2clsid, clsid2catid, names = category_maps(coco)
    assert names == ["cat", "dog"] and clsid2catid[0] == 5
    recs = data_clean(coco, coco.get_img_ids(), catid2clsid, "imgs/")
    assert len(recs) == 1
    r = recs[0]
    assert r["gt_bbox"].shape == (1, 4)          # invalid box filtered
    np.testing.assert_allclose(r["gt_bbox"][0], [0, 10, 29, 39])  # clipped
    assert r["im_file"] == "imgs/a.jpg"


def test_assemble_batch_shapes():
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=6)
    samples = []
    for _ in range(2):
        s = _sample(h=100, w=120)
        T.NormalizeBox()(s, RNG)
        T.PadBox(50)(s, RNG)
        T.BboxXYXY2XYWH()(s, RNG)
        samples.append(s)
    rng = np.random.RandomState(0)
    # default: device_normalize/device_targets -> uint8 image, no host targets
    batch = assemble_batch(samples, cfg, rng, fixed_shape=320)
    assert batch["image"].shape == (2, 320, 320, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["gt_bbox"].shape == (2, 50, 4)
    assert batch["gt_class"].dtype == np.int32
    assert "targets" not in batch

    # host path (device_normalize/targets off): normalized floats + targets
    cfg.train_cfg = dict(cfg.train_cfg, device_normalize=False,
                         device_targets=False)
    batch = assemble_batch(samples, cfg, np.random.RandomState(0),
                           fixed_shape=320)
    assert batch["image"].dtype == np.float32
    assert batch["targets"][0].shape == (2, 10, 10, 3, 12)
    assert batch["targets"][1].shape == (2, 20, 20, 3, 12)
    # normalization applied
    assert abs(batch["image"].mean()) < 3.0


def test_train_batches_stream(tmp_path):
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=6)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=2)
    # records with pre-decoded images (skip imdecode by monkeypatching decode)
    import cv2
    recs = []
    for i in range(4):
        img = RNG.randint(0, 255, (60, 80, 3)).astype(np.uint8)
        f = tmp_path / f"im{i}.jpg"
        cv2.imwrite(str(f), img)
        recs.append({
            "im_file": str(f), "im_id": np.array([i]), "h": 60.0, "w": 80.0,
            "gt_bbox": np.array([[5, 5, 40, 40]], np.float32),
            "gt_class": np.array([[i % 6]], np.int32),
            "gt_score": np.ones((1, 1), np.float32),
            "is_crowd": np.zeros((1, 1), np.int32),
        })
    cfg.train_cfg = dict(cfg.train_cfg, device_targets=False)
    it = train_batches(recs, cfg, seed=0, fixed_shape=320)
    pf = Prefetcher(it, max_batch=2)
    b = next(pf)
    assert b["image"].shape == (2, 320, 320, 3)
    assert len(b["targets"]) == 2
    b2 = next(pf)
    assert b2["image"].shape[0] == 2


def test_multihost_shape_lockstep(tmp_path):
    """Different data shards must draw IDENTICAL shape sequences (multi-host
    jax requires lock-step global shapes)."""
    import cv2
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=6)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=1)
    recs = []
    for i in range(8):
        img = RNG.randint(0, 255, (50, 50, 3)).astype(np.uint8)
        f = tmp_path / f"m{i}.jpg"
        cv2.imwrite(str(f), img)
        recs.append({
            "im_file": str(f), "im_id": np.array([i]), "h": 50.0, "w": 50.0,
            "gt_bbox": np.array([[5, 5, 40, 40]], np.float32),
            "gt_class": np.array([[i % 6]], np.int32),
            "gt_score": np.ones((1, 1), np.float32),
            "is_crowd": np.zeros((1, 1), np.int32),
        })
    from ppyolo_tpu.data import train_batches
    it0 = train_batches(recs, cfg, seed=5, num_shards=2, shard_id=0)
    it1 = train_batches(recs, cfg, seed=5, num_shards=2, shard_id=1)
    shapes0 = [next(it0)["shape"] for _ in range(6)]
    shapes1 = [next(it1)["shape"] for _ in range(6)]
    assert shapes0 == shapes1
    assert len(set(shapes0)) > 1  # actually random


def test_train_batches_fast_forward_equals_skip(tmp_path):
    """The keyed-RNG loader (deterministic-resume rework): starting at
    start_iter=k must reproduce EXACTLY the batches an uninterrupted
    stream yields from position k — images, gts, shapes — including
    across an epoch boundary."""
    import cv2
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=6)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=2, device_targets=False)
    recs = []
    for i in range(6):   # steps_per_epoch = 3 -> k=4 crosses an epoch
        img = RNG.randint(0, 255, (60, 60, 3)).astype(np.uint8)
        f = tmp_path / f"ff{i}.jpg"
        cv2.imwrite(str(f), img)
        recs.append({
            "im_file": str(f), "im_id": np.array([i]), "h": 60.0, "w": 60.0,
            "gt_bbox": np.array([[5, 5, 40, 40]], np.float32),
            "gt_class": np.array([[i % 6]], np.int32),
            "gt_score": np.ones((1, 1), np.float32),
            "is_crowd": np.zeros((1, 1), np.int32),
        })
    from ppyolo_tpu.data import train_batches

    k, take = 4, 4
    full = train_batches(recs, cfg, seed=3)
    for _ in range(k):
        next(full)
    a = [next(full) for _ in range(take)]
    resumed = train_batches(recs, cfg, seed=3, start_iter=k)
    b = [next(resumed) for _ in range(take)]
    for i, (x, y) in enumerate(zip(a, b)):
        assert x["shape"] == y["shape"], i
        np.testing.assert_array_equal(x["image"], y["image"], err_msg=str(i))
        np.testing.assert_array_equal(x["gt_bbox"], y["gt_bbox"])
        np.testing.assert_array_equal(x["gt_class"], y["gt_class"])
        np.testing.assert_array_equal(x["gt_score"], y["gt_score"])


def test_multihost_shape_lockstep_after_fast_forward(tmp_path):
    """Shape lock-step must also hold when hosts RESUME: the shape key
    excludes the shard term and depends only on (seed, group index)."""
    import cv2
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=6)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=1, device_targets=False)
    recs = []
    for i in range(8):
        img = RNG.randint(0, 255, (50, 50, 3)).astype(np.uint8)
        f = tmp_path / f"lk{i}.jpg"
        cv2.imwrite(str(f), img)
        recs.append({
            "im_file": str(f), "im_id": np.array([i]), "h": 50.0, "w": 50.0,
            "gt_bbox": np.array([[5, 5, 40, 40]], np.float32),
            "gt_class": np.array([[i % 6]], np.int32),
            "gt_score": np.ones((1, 1), np.float32),
            "is_crowd": np.zeros((1, 1), np.int32),
        })
    from ppyolo_tpu.data import train_batches

    # host 0 resumes at iter 7, host 1 at iter 7, and a fresh host stream
    # skipped 7 — all three must see the same shapes from there on
    it0 = train_batches(recs, cfg, seed=5, num_shards=2, shard_id=0,
                        start_iter=7)
    it1 = train_batches(recs, cfg, seed=5, num_shards=2, shard_id=1,
                        start_iter=7)
    fresh = train_batches(recs, cfg, seed=5, num_shards=2, shard_id=0)
    for _ in range(7):
        next(fresh)
    s0 = [next(it0)["shape"] for _ in range(5)]
    s1 = [next(it1)["shape"] for _ in range(5)]
    sf = [next(fresh)["shape"] for _ in range(5)]
    assert s0 == s1 == sf


def test_cutmix_partial_overlap_and_is_crowd():
    """Partner smaller than the canvas: the cut rect may only partially
    overlap the partner image (regression: broadcast ValueError), and the
    per-box arrays must stay in lock-step (is_crowd was not concatenated)."""
    for seed in range(50):
        s = _sample(h=200, w=200)
        s["cutmix"] = _sample(h=100, w=100)
        out = T.CutmixImage()(s, np.random.RandomState(seed))
        assert out["image"].shape == (200, 200, 3)
        n = out["gt_bbox"].shape[0]
        assert out["gt_class"].shape[0] == n
        assert out["gt_score"].shape[0] == n
        assert out["is_crowd"].shape[0] == n


def test_prefetcher_propagates_producer_errors():
    """A producer crash must surface to the consumer, not truncate the
    stream (a silently-partial eval would report a wrong mAP)."""
    def gen():
        yield 1
        yield 2
        raise ValueError("imread failed")

    pf = Prefetcher(gen(), max_batch=2)
    assert next(pf) == 1
    assert next(pf) == 2
    with pytest.raises(RuntimeError, match="producer"):
        next(pf)


def test_assemble_batch_pack_bitwise_matches_naive():
    """The r5 zero-temporary assemble path (scratch-dst resize + native
    single-pass u8 pack) must be BITWISE identical to the naive chain
    stack([clip(rint(resize(x)))]).astype(u8) under the same rng stream —
    float32 (augmented), uint8 (augmentation-free), and random_inter
    interp draws all covered."""
    import cv2

    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=6)
    cfg.randomShape = dict(sizes=[96, 128], random_inter=True)

    def mk_samples(as_float):
        r = np.random.RandomState(11)
        out = []
        for h, w in ((100, 120), (90, 77), (128, 128)):
            s = _sample(h=h, w=w)
            s["image"] = r.randint(0, 256, (h, w, 3)).astype(np.uint8)
            if as_float:  # augmented-like: fractional, slightly out-of-range
                s["image"] = (s["image"].astype(np.float32) * 1.03 - 2.7)
            T.NormalizeBox()(s, r)
            T.PadBox(50)(s, r)
            T.BboxXYXY2XYWH()(s, r)
            out.append(s)
        return out

    for as_float in (True, False):
        got = assemble_batch(mk_samples(as_float), cfg,
                             np.random.RandomState(5))["image"]
        # naive oracle, SAME rng stream (shape choice + per-sample interp)
        rng = np.random.RandomState(5)
        shape = int(rng.choice(cfg.randomShape["sizes"]))
        imgs = []
        for s in mk_samples(as_float):
            method = int(rng.choice(
                [cv2.INTER_NEAREST, cv2.INTER_LINEAR, cv2.INTER_AREA,
                 cv2.INTER_CUBIC, cv2.INTER_LANCZOS4]))
            imgs.append(cv2.resize(s["image"], (shape, shape),
                                   interpolation=method))
        ref = np.stack([np.clip(np.rint(im), 0.0, 255.0) for im in imgs]
                       ).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)

def test_randomshape_dst_mismatch_falls_back_to_allocating():
    """cv2.resize(dst=) silently allocates internally when the dst
    rank/channels mismatch — the scratch path must detect that and fall
    back, or the PREVIOUS sample's pixels would ship as the image."""
    import cv2

    r = np.random.RandomState(3)
    op = T.RandomShapeSingle(random_inter=False, resize_box=False)
    # poison the scratch with a recognizable previous-sample pattern
    dst = np.full((64, 64, 3), 111.0, np.float32)
    gray = r.randint(0, 256, (40, 50)).astype(np.float32)   # rank 2 != 3
    out = op(64, {"image": gray.copy()}, r, dst=dst)["image"]
    ref = cv2.resize(gray, (64, 64), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(out, ref)

    two_ch = r.randint(0, 256, (40, 50, 2)).astype(np.float32)
    out = op(64, {"image": two_ch.copy()}, r, dst=dst)["image"]
    ref = cv2.resize(two_ch, (64, 64), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(out, ref)
    # matching rank+channels still goes through the scratch
    rgb = r.randint(0, 256, (40, 50, 3)).astype(np.float32)
    out = op(64, {"image": rgb.copy()}, r, dst=dst)["image"]
    assert out is dst
    ref = cv2.resize(rgb, (64, 64), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(out, ref)
