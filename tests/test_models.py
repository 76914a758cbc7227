"""Model-graph tests: forward shapes, prediction pipeline, param naming."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx, flatten_tree
from configs import PPYOLO_2x_Config, PPYOLO_r18vd_Config


def build(cfg_cls):
    cfg = cfg_cls()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def test_r18vd_forward_shapes():
    cfg, model, params = build(PPYOLO_r18vd_Config)
    x = jnp.zeros((1, 128, 128, 3))
    outs = model.outputs(params, x, Ctx(train=False))
    # 2 levels: stride 32 then 16; channels an*(5+80)=255
    assert outs[0].shape == (1, 4, 4, 255)
    assert outs[1].shape == (1, 8, 8, 255)


@pytest.mark.slow
def test_r50vd_forward_shapes():
    cfg, model, params = build(PPYOLO_2x_Config)
    x = jnp.zeros((1, 128, 128, 3))
    outs = model.outputs(params, x, Ctx(train=False))
    # 3 levels with iou_aware: an*(6+80)=258 channels
    assert outs[0].shape == (1, 4, 4, 258)
    assert outs[1].shape == (1, 8, 8, 258)
    assert outs[2].shape == (1, 16, 16, 258)


@pytest.mark.slow
def test_r50vd_predict_end_to_end():
    cfg, model, params = build(PPYOLO_2x_Config)
    x = jnp.array(np.random.RandomState(0).randn(2, 128, 128, 3), jnp.float32)
    im_size = jnp.array([[480, 640], [333, 500]], jnp.float32)
    preds = model.predict(params, x, im_size)
    assert preds.shape == (2, 100, 6)
    p = np.asarray(preds)
    valid = p[p[:, :, 0] >= 0]
    if len(valid):
        assert (valid[:, 1] > 0).all()


def test_param_paths_match_reference_names():
    _, model, params = build(PPYOLO_2x_Config)
    flat = flatten_tree(params)
    # spot-check key reference state_dict paths (1_ppyolo_2x_2pytorch.py contract)
    expected = [
        "backbone.stage1_conv1_1.conv.weight",
        "backbone.stage1_conv1_1.bn.running_mean",
        "backbone.stage2_0.conv4.conv.weight",
        "backbone.stage5_0.conv2.conv.dcn_weight",            # DCN stage
        "backbone.stage5_0.conv2.conv.conv_offset.weight",
        "head.detection_blocks.0.layers.1.conv.weight",       # after coordconv idx0
        "head.detection_blocks.0.layers.4.conv.weight",       # spp conv
        "head.detection_blocks.0.tip_layers.1.conv.weight",
        "head.yolo_output_convs.0.conv.weight",
        "head.yolo_output_convs.0.conv.bias",
        "head.upsample_layers.0.conv.weight",
        "head.upsample_layers.2.conv.weight",
    ]
    for path in expected:
        assert path in flat, f"missing {path}"
    # DCN offset conv zero-init (reference custom_layers.py:510-511)
    assert np.abs(np.asarray(flat["backbone.stage5_0.conv2.conv.conv_offset.weight"])).max() == 0


def test_policy_matches_params():
    _, model, params = build(PPYOLO_r18vd_Config)
    pf = flatten_tree(params)
    pol = model.flat_policy()
    assert set(pf) == set(pol)
    # freeze_at=5 -> whole backbone untrainable (train.py:264, resnet_vd.py:174-199)
    assert not pol["backbone.stage5_1.conv2.conv.weight"].trainable
    assert pol["head.yolo_output_convs.0.conv.weight"].trainable
    # norm params never decayed; conv weights decayed
    # (r18vd conv_block_num=0: layers = [drop, coord, conv] for the first
    # block, so the conv sits at ModuleList index 2 — reference head.py:202-215)
    assert pol["head.detection_blocks.0.layers.2.bn.weight"].wd_mult == 0.0
    assert pol["head.detection_blocks.0.layers.2.conv.weight"].wd_mult == 1.0


def test_dropblock_active_in_train_mode():
    cfg, model, params = build(PPYOLO_r18vd_Config)
    x = jnp.array(np.random.RandomState(1).rand(1, 128, 128, 3), jnp.float32)
    ctx_a = Ctx(train=True, rng=jax.random.PRNGKey(1), updates={})
    ctx_b = Ctx(train=True, rng=jax.random.PRNGKey(2), updates={})
    oa = model.outputs(params, x, ctx_a)
    ob = model.outputs(params, x, ctx_b)
    assert not np.allclose(np.asarray(oa[0]), np.asarray(ob[0]))
    # bn running-stat updates recorded for head AND frozen backbone (the
    # reference freezes gradients only, BN stays in batch-stats mode)
    assert any(k.startswith("head.") for k in ctx_a.updates)
    assert any(k.startswith("backbone.") for k in ctx_a.updates)


def test_iter_convs_yields_each_conv_exactly_once():
    """Converter iteration must not double-visit (the tip conv used to be
    yielded both via children_['__tip__'] and an explicit tip_conv yield)."""
    from configs import PPYOLO_2x_Config
    from ppyolo_tpu.models import PPYOLO

    model = PPYOLO.from_config(PPYOLO_2x_Config())
    convs = list(model.backbone.iter_convs()) + list(model.head.iter_convs())
    assert len(convs) == len({id(c) for c in convs})
    names = [c.name for c in convs if getattr(c, "name", "")]
    assert len(names) == len(set(names))


def test_detector_to_bgr_flips_norm_constants():
    """Detector normalizes AFTER the host BGR flip, so its constants must be
    the channel-reverse of the config's RGB-ordered mean/std."""
    import jax
    from configs import PPYOLO_r18vd_Config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.eval.detector import Detector

    cfg = PPYOLO_r18vd_Config()
    cfg.permute = dict(cfg.permute, to_bgr=True)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    det = Detector(model, params, cfg, target_size=64)
    assert np.allclose(det.mean, np.asarray(cfg.normalizeImage["mean"])[::-1])
    assert np.allclose(det.std, np.asarray(cfg.normalizeImage["std"])[::-1])


def test_detector_honors_is_scale_false():
    """ADVICE r2: the on-device uint8 normalize must honor
    normalizeImage['is_scale'] exactly like make_train_step.prep_images —
    a config with is_scale=False (raw 0..255 pixel domain) must not divide
    by 255 at inference."""
    import numpy as np
    from configs import PPYOLO_r18vd_Config
    from ppyolo_tpu.eval.detector import Detector

    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 3
    cfg.head = dict(cfg.head, num_classes=3)
    cfg.normalizeImage = dict(cfg.normalizeImage, is_scale=False,
                              mean=[120.0, 115.0, 100.0],
                              std=[60.0, 58.0, 62.0])
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    det = Detector(model, params, cfg, target_size=96, fold_bn=False)
    assert det.is_scale is False

    r = np.random.RandomState(0)
    img_u8 = r.randint(0, 256, (1, 96, 96, 3), np.uint8)
    sizes = np.array([[96.0, 96.0]], np.float32)
    out_u8 = det.predict_batch(img_u8, sizes)

    # reference semantics: normalize WITHOUT /255, then predict fp32
    x = img_u8.astype(np.float32)
    x = (x - np.array(cfg.normalizeImage["mean"], np.float32)) / np.array(
        cfg.normalizeImage["std"], np.float32)
    out_f32 = det.predict_batch(x, sizes)
    # device normalize vs host numpy normalize reassociate fp ops slightly
    np.testing.assert_allclose(out_u8, out_f32, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# Head virtual-concat decomposition (models/head.py::HEAD_DECOMPOSE,
# ops/conv.py::ConvNormAct.apply_parts): conv(concat(parts)) == Σ conv(part)
# exactly up to fp32 summation order, so forced-on must match the concat
# path to reassociation noise on BOTH configs (2x exercises CoordConv+SPP+
# route concat; r18vd the coordless route concat), and the auto gate must
# stay OFF for fp32/train so the golden fixtures keep the fused conv.
def test_head_decompose_matches_concat_path():
    from ppyolo_tpu.models.head import head_decompose

    for cfg_cls, size in ((PPYOLO_2x_Config, 96), (PPYOLO_r18vd_Config, 96)):
        cfg, model, params = build(cfg_cls)
        img = jnp.asarray(
            np.random.RandomState(0).rand(2, size, size, 3), jnp.float32)
        sz = jnp.asarray([[90.0, 120.0]] * 2)
        with head_decompose("off"):
            base = np.asarray(model.predict(params, img, sz, Ctx(train=False)))
        for mode in ("on", "inner"):
            with head_decompose(mode):
                dec = np.asarray(
                    model.predict(params, img, sz, Ctx(train=False)))
            # detections: scores may shift by reassociation noise; boxes/
            # labels must agree to fp32 tolerance
            np.testing.assert_allclose(dec, base, rtol=1e-4, atol=1e-3)

        feats = model.backbone.apply(params["backbone"], img, Ctx(train=False))
        with head_decompose("off"):
            ra = model.head.get_outputs(params["head"], list(feats),
                                        Ctx(train=False))
        for mode in ("on", "inner"):
            with head_decompose(mode):
                rb = model.head.get_outputs(params["head"], list(feats),
                                            Ctx(train=False))
            for a, b in zip(ra, rb):
                a, b = np.asarray(a), np.asarray(b)
                rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9)
                assert rel < 1e-5, rel


def test_head_decompose_auto_gate_is_off_for_fp32():
    # The auto gate keys on eval-mode bf16: an fp32 eval forward must take
    # the concat path BITWISE (golden-fixture protection).
    cfg, model, params = build(PPYOLO_r18vd_Config)
    from ppyolo_tpu.models.head import head_decompose

    img = jnp.asarray(np.random.RandomState(1).rand(1, 96, 96, 3), jnp.float32)
    sz = jnp.asarray([[96.0, 96.0]])
    auto = np.asarray(model.predict(params, img, sz, Ctx(train=False)))
    with head_decompose("off"):
        off = np.asarray(model.predict(params, img, sz, Ctx(train=False)))
    assert np.array_equal(auto, off)


def test_apply_parts_single_and_fallback():
    from ppyolo_tpu.ops.conv import ConvNormAct

    m = ConvNormAct(10, 4, 3, norm="bn", act="leaky", name="m")
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 10), jnp.float32)
    full = m.apply(p, x, Ctx(train=False))
    # single part delegates to apply (bitwise)
    one = m.apply_parts(p, [x], Ctx(train=False))
    assert np.array_equal(np.asarray(full), np.asarray(one))
    # multi-part (incl. a batch-1 broadcast part) matches to fp tolerance
    parts = [x[..., :6], jnp.broadcast_to(x[:1, ..., 6:], (1, 8, 8, 4))]
    x_b = jnp.concatenate([x[..., :6],
                           jnp.broadcast_to(x[:1, ..., 6:], (2, 8, 8, 4))],
                          axis=-1)
    dec = m.apply_parts(p, parts, Ctx(train=False))
    ref = m.apply(p, x_b, Ctx(train=False))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # int8 weights fall back to the materialized concat path (bitwise)
    p8 = jax.tree.map(lambda v: v, p)
    p8["conv"] = dict(p8["conv"])
    w = np.asarray(p["conv"]["weight"])
    s = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    p8["conv"]["weight"] = jnp.asarray(
        np.clip(np.round(w / s), -127, 127).astype(np.int8))
    p8["conv"]["weight_scale"] = jnp.asarray(s.astype(np.float32))
    q_dec = m.apply_parts(p8, parts, Ctx(train=False))
    q_ref = m.apply(p8, x_b, Ctx(train=False))
    assert np.array_equal(np.asarray(q_dec), np.asarray(q_ref))
