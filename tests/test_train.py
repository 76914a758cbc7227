"""Train-step tests: loss oracle checks, overfit sanity, multi-device parity.

The 8-virtual-CPU-device shard_map test verifies that the data-parallel step
(psum grads + sync-BN) is numerically identical to the single-program step
over the same global batch — the distributed-correctness test the reference
never had (SURVEY.md §4e)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx
from ppyolo_tpu.train import (YOLOv3Loss, IouLoss, make_train_step,
                              init_train_state, make_lr_fn)
from ppyolo_tpu.train.losses import total_loss
from ppyolo_tpu.data.targets import gt2yolo_targets
from ppyolo_tpu.parallel import make_mesh, shard_train_step, put_batch, put_replicated
from configs import PPYOLO_r18vd_Config


class TinyCfg(PPYOLO_r18vd_Config):
    """r18vd shrunk for CPU tests: 6 classes, sync_bn, no dropblock."""

    def __init__(self, drop_block=False, norm="sync_bn"):
        super().__init__()
        self.num_classes = 6
        self.head = dict(self.head, num_classes=6, drop_block=drop_block,
                         norm_type=norm)
        self.backbone = dict(self.backbone, norm_type=norm, freeze_at=5)
        self.gt2YoloTarget = dict(self.gt2YoloTarget, num_classes=6)
        self.learningRate = dict(self.learningRate,
                                 base_lr=1e-3,
                                 LinearWarmup=dict(start_factor=0.0, steps=2))
        self.use_ema = True


def make_batch(n, size=64, num_classes=6, seed=0):
    r = np.random.RandomState(seed)
    images = r.rand(n, size, size, 3).astype(np.float32)
    m = 50
    gt_bbox = np.zeros((n, m, 4), np.float32)
    gt_bbox[:, :3, 0:2] = r.uniform(0.3, 0.7, (n, 3, 2))
    gt_bbox[:, :3, 2:4] = r.uniform(0.1, 0.5, (n, 3, 2))
    gt_class = r.randint(0, num_classes, (n, m))
    gt_score = np.zeros((n, m), np.float32)
    gt_score[:, :3] = 1.0
    cfg = PPYOLO_r18vd_Config()
    targets = gt2yolo_targets(gt_bbox, gt_class, gt_score, (size, size),
                              cfg.head["anchors"], cfg.head["anchor_masks"],
                              cfg.head["downsample"], num_classes)
    return {
        "image": jnp.asarray(images),
        "gt_bbox": jnp.asarray(gt_bbox),
        "targets": tuple(jnp.asarray(t) for t in targets),
    }


def test_lr_schedule_matches_reference_calc_lr():
    cfg = dict(base_lr=0.0001,
               PiecewiseDecay=dict(gamma=0.1, milestones=[400000, 450000]),
               LinearWarmup=dict(start_factor=0.0, steps=4000))
    fn = make_lr_fn(cfg)

    def ref(it):   # transliteration of train.py:172-188
        for i in range(2, 0, -1):
            if it >= cfg["PiecewiseDecay"]["milestones"][i - 1]:
                return 0.0001 * 0.1 ** i
        if it <= 4000:
            return 0.0001 * (it / 4000)
        return 0.0001

    for it in [0, 1, 2000, 4000, 4001, 100000, 400000, 449999, 450000, 500000]:
        np.testing.assert_allclose(float(fn(it)), ref(it), rtol=1e-6)


def test_loss_components_finite_and_positive():
    cfg = TinyCfg()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(2)
    ctx = Ctx(train=True, rng=jax.random.PRNGKey(1), updates={})
    outs = model.outputs(params, batch["image"], ctx)
    loss = YOLOv3Loss(ignore_thresh=0.7, scale_x_y=1.05,
                      iou_loss=IouLoss(loss_weight=2.5),
                      downsample=[32, 16])
    d = loss(outs, list(batch["targets"]), batch["gt_bbox"],
             model.head.mask_anchors, 6)
    assert set(d) == {"loss_xy", "loss_wh", "loss_obj", "loss_cls", "loss_iou"}
    for k, v in d.items():
        v = float(v)
        assert np.isfinite(v) and v >= 0, (k, v)
    assert float(d["loss_obj"]) > 0


def test_obj_loss_ignore_mask():
    """A high-IoU unlabeled prediction must be ignored (not penalised)."""
    loss = YOLOv3Loss(ignore_thresh=0.5, scale_x_y=1.0, downsample=[32])
    n, s, an = 1, 4, 3
    anchors = [[32.0, 32.0], [64.0, 64.0], [128.0, 128.0]]
    x = jnp.zeros((n, s, s, an))
    # target empty; one gt box centered exactly at cell (1,1) w/ anchor-0 size
    target = jnp.zeros((n, s, s, an, 6 + 2))
    gt = jnp.zeros((n, 50, 4))
    # place gt exactly at decoded position of cell (1,1), anchor 0:
    # cx=(sig(0)+1)/4 = 0.375, w = exp(0)*32/(4*32)=0.25
    gt = gt.at[0, 0].set(jnp.array([0.375, 0.375, 0.25, 0.25]))
    out = jnp.zeros((n, s, s, an * 7))
    pos, neg = loss._obj_loss(x, x, x, x, jnp.zeros((n, s, s, an)),
                              target[..., 5], gt,
                              jnp.asarray(anchors), 32, 1.0,
                              jnp.zeros((n, s, s, an, 2)))
    # with no gt at all, every cell would be a negative; with the matching gt,
    # the (1,1,anchor0) prediction has IoU 1 > 0.5 -> ignored
    gt_none = jnp.zeros((n, 50, 4))
    _, neg_none = loss._obj_loss(x, x, x, x, jnp.zeros((n, s, s, an)),
                                 target[..., 5], gt_none,
                                 jnp.asarray(anchors), 32, 1.0,
                                 jnp.zeros((n, s, s, an, 2)))
    assert float(neg[0]) < float(neg_none[0])


@pytest.mark.slow
def test_train_step_overfits_tiny_batch():
    cfg = TinyCfg(norm="bn")
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))
    batch = make_batch(2)
    losses0 = None
    for i in range(8):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        if losses0 is None:
            losses0 = losses
    assert float(losses["total_loss"]) < float(losses0["total_loss"])
    assert int(state.step) == 8
    # EMA shadow exists and moved
    assert state.ema is not None
    # BN running stats changed (merged updates)
    lkey = sorted(params["head"]["detection_blocks"]["0"]["layers"])[0]
    rm0 = params["head"]["detection_blocks"]["0"]["layers"][lkey]["bn"]["running_mean"]
    rm1 = state.params["head"]["detection_blocks"]["0"]["layers"][lkey]["bn"]["running_mean"]
    assert not np.allclose(np.asarray(rm0), np.asarray(rm1))
    # frozen backbone conv weights untouched
    w0 = params["backbone"]["stage5_0"]["conv1"]["conv"]["weight"]
    w1 = state.params["backbone"]["stage5_0"]["conv1"]["conv"]["weight"]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


@pytest.mark.slow
def test_multi_train_step_matches_sequential():
    """lax.scan'ed K-step trainer == K sequential jitted steps."""
    from ppyolo_tpu.train.train_step import make_multi_train_step

    cfg = TinyCfg(norm="bn")
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    K = 3
    batch = make_batch(2)
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch)
    rng = jax.random.PRNGKey(7)

    state_a = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))
    keys = jax.random.split(rng, K)
    for i in range(K):
        state_a, losses_a = step(state_a, batch, keys[i])

    state_b = init_train_state(model, params, cfg)
    multi = jax.jit(make_multi_train_step(model, cfg, n_steps=K))
    state_b, losses_b = multi(state_b, batches, rng)

    np.testing.assert_allclose(float(losses_a["total_loss"]),
                               float(losses_b["total_loss"][-1]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


@pytest.mark.slow
def test_bf16_train_step_runs_and_learns():
    cfg = TinyCfg(norm="bn")
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg, compute_dtype=jnp.bfloat16))
    batch = make_batch(2)
    first = None
    for i in range(6):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(losses["total_loss"])
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["total_loss"]) < first
    # master params stayed fp32
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_step_matches_single():
    cfg = TinyCfg(norm="sync_bn", drop_block=False)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(8, size=64)
    rng = jax.random.PRNGKey(42)

    # single-program reference over the full batch
    state1 = init_train_state(model, params, cfg)
    step1 = jax.jit(make_train_step(model, cfg, axis_name=None))
    state1, losses1 = step1(state1, batch, rng)

    # 8-device data-parallel
    mesh = make_mesh(8)
    stepN = make_train_step(model, cfg, axis_name="data")
    sharded = shard_train_step(stepN, mesh)
    state8 = init_train_state(model, params, cfg)
    state8 = put_replicated(state8, mesh)
    batch8 = put_batch(batch, mesh)
    state8, losses8 = sharded(state8, batch8, rng)

    for k in losses1:
        np.testing.assert_allclose(float(losses1[k]), float(losses8[k]),
                                   rtol=2e-4, atol=1e-5)
    # parameters after one step identical
    f1 = jax.tree.leaves(state1.params)
    f8 = jax.tree.leaves(state8.params)
    for a, b in zip(f1, f8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_remat_step_matches_plain():
    """jax.checkpoint'ed backbone must not change the step numerics."""
    cfg = TinyCfg(norm="bn")
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(2)
    rng = jax.random.PRNGKey(3)

    sa = init_train_state(model, params, cfg)
    sa, la = jax.jit(make_train_step(model, cfg))(sa, batch, rng)
    sb = init_train_state(model, params, cfg)
    sb, lb = jax.jit(make_train_step(model, cfg, remat=True))(sb, batch, rng)

    np.testing.assert_allclose(float(la["total_loss"]),
                               float(lb["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_scan_matches_sequential_sharded_steps():
    """scan_steps>1 under a mesh (shard_multi_train_step) must equal the same
    batches run through the plain sharded step one at a time."""
    from ppyolo_tpu.train.train_step import make_multi_train_step
    from ppyolo_tpu.parallel import shard_multi_train_step, put_scan_batch

    cfg = TinyCfg(norm="sync_bn", drop_block=False)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    batches = [make_batch(8, size=64, seed=s) for s in (0, 1)]
    rng = jax.random.PRNGKey(9)

    # sequential: two sharded single steps with the scan's per-step keys
    seq = shard_train_step(make_train_step(model, cfg, axis_name="data"), mesh)
    state_a = put_replicated(init_train_state(model, params, cfg), mesh)
    keys = jax.random.split(rng, 2)
    for b, k in zip(batches, keys):
        state_a, losses_a = seq(state_a, put_batch(b, mesh), k)

    # fused: one mesh x scan dispatch over the stacked batches
    multi = make_multi_train_step(model, cfg, n_steps=2, axis_name="data")
    fused = shard_multi_train_step(multi, mesh)
    state_b = put_replicated(init_train_state(model, params, cfg), mesh)
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    state_b, losses_b = fused(state_b, put_scan_batch(stacked, mesh), rng)

    for k in losses_a:
        np.testing.assert_allclose(float(losses_a[k]),
                                   float(losses_b[k][-1]),
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_device_normalize_matches_host_normalize():
    """uint8 transport + on-device (x/255-mean)/std == host NormalizeImage.

    Integer-valued pixels so the uint8 round-trip is lossless; same state,
    same rng -> loss dicts must agree to fp32 tolerance.
    """
    from ppyolo_tpu.data import transforms as T

    cfg = TinyCfg()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))

    batch = make_batch(2, size=64)
    raw = np.asarray(
        np.random.RandomState(3).randint(0, 256, (2, 64, 64, 3)), np.float32)
    host = {"image": raw.copy()}
    T.NormalizeImage(**cfg.normalizeImage)(host, None)
    b_host = dict(batch, image=jnp.asarray(host["image"], jnp.float32))
    b_dev = dict(batch, image=jnp.asarray(raw, jnp.uint8))

    _, l_host = step(state, b_host, jax.random.PRNGKey(7))
    _, l_dev = step(state, b_dev, jax.random.PRNGKey(7))
    for k in l_host:
        np.testing.assert_allclose(np.asarray(l_host[k]),
                                   np.asarray(l_dev[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_loader_ships_uint8_when_device_normalize():
    import os
    import cv2
    import tempfile
    import json
    from ppyolo_tpu.data import CocoJson, category_maps, data_clean
    from ppyolo_tpu.data.loader import train_batches

    tmp = tempfile.mkdtemp()
    img_dir = os.path.join(tmp, "im")
    os.makedirs(img_dir)
    r = np.random.RandomState(0)
    images, annos = [], []
    for i in range(4):
        cv2.imwrite(os.path.join(img_dir, f"i{i}.jpg"),
                    r.randint(0, 255, (64, 64, 3)).astype(np.uint8))
        images.append({"id": i + 1, "file_name": f"i{i}.jpg",
                       "width": 64, "height": 64})
        annos.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                      "bbox": [10.0, 10.0, 30.0, 30.0], "area": 900.0,
                      "iscrowd": 0})
    anno = os.path.join(tmp, "a.json")
    json.dump({"images": images, "annotations": annos,
               "categories": [{"id": 1, "name": "c"}]}, open(anno, "w"))

    cfg = TinyCfg()
    cfg.num_classes = 1
    cfg.head = dict(cfg.head, num_classes=1)
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=1)
    cfg.train_path = anno
    cfg.train_pre_path = img_dir + "/"
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=2, mixup_epoch=0)
    cfg.randomShape = dict(sizes=[64], random_inter=False)

    coco = CocoJson(anno)
    catid2clsid, _, _ = category_maps(coco)
    records = data_clean(coco, coco.get_img_ids(), catid2clsid,
                         cfg.train_pre_path)
    b = next(iter(train_batches(records, cfg, seed=0)))
    assert b["image"].dtype == np.uint8

    cfg.train_cfg = dict(cfg.train_cfg, device_normalize=False)
    b2 = next(iter(train_batches(records, cfg, seed=0)))
    assert b2["image"].dtype == np.float32
    # the uint8 batch must normalize (on device) to the float batch exactly
    # on un-augmented integer pixels
    mean = np.asarray(cfg.normalizeImage["mean"], np.float32)
    std = np.asarray(cfg.normalizeImage["std"], np.float32)
    np.testing.assert_allclose(
        (b["image"].astype(np.float32) / 255.0 - mean) / std,
        b2["image"], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_empty_gt_batch_trains_finite():
    """A batch with ZERO valid gt boxes (all-padding) must produce finite
    losses (pure-negative obj loss) and finite updated params through the
    device-target path — the all-invalid corner of gt2yolo_targets_device."""
    cfg = TinyCfg()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))
    B = 2
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (B, 64, 64, 3)),
            jnp.uint8),
        "gt_bbox": jnp.zeros((B, 50, 4), jnp.float32),
        "gt_class": jnp.zeros((B, 50), jnp.int32),
        "gt_score": jnp.zeros((B, 50), jnp.float32),
    }
    st, losses = step(state, batch, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_xy"]) == 0.0  # no positives anywhere
    assert float(losses["loss_obj"]) > 0.0  # negatives still train
    leaf = jax.tree.leaves(st.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_device_normalize_to_bgr_constant_flip():
    """permute.to_bgr=True: the loader flips channels BEFORE the uint8 ship,
    so the on-device normalize must use FLIPPED mean/std to reproduce the
    reference order NormalizeImage(RGB constants) -> Permute flip
    (code-review find: the constants were applied unflipped)."""
    from ppyolo_tpu.data import transforms as T

    cfg = TinyCfg()
    cfg.permute = dict(cfg.permute, to_bgr=True)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))

    batch = make_batch(2, size=64)
    raw = np.asarray(
        np.random.RandomState(5).randint(0, 256, (2, 64, 64, 3)), np.float32)
    # reference order: normalize with RGB constants, THEN flip to BGR
    host = {"image": raw.copy()}
    T.NormalizeImage(**cfg.normalizeImage)(host, None)
    ref_img = host["image"][..., ::-1].copy()
    # device path receives the flipped uint8 (what the loader ships)
    flipped_u8 = raw[..., ::-1].astype(np.uint8)

    b_host = dict(batch, image=jnp.asarray(ref_img, jnp.float32))
    b_dev = dict(batch, image=jnp.asarray(flipped_u8))
    _, l_host = step(state, b_host, jax.random.PRNGKey(7))
    _, l_dev = step(state, b_dev, jax.random.PRNGKey(7))
    for k in l_host:
        np.testing.assert_allclose(np.asarray(l_host[k]),
                                   np.asarray(l_dev[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
