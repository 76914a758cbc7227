"""int8 serving mode: per-channel weight quant + dynamic activation quant.

The int8 path (eval/optimize.py::quantize_params_int8 +
ops/conv.py::quantized_conv2d) targets the v5e MXU's 2x int8 peak; these
tests pin its numerics and coverage rules on the CPU backend.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx, flatten_tree
from ppyolo_tpu.ops.conv import conv2d, quantized_conv2d
from ppyolo_tpu.eval.optimize import optimize_for_inference
from configs import PPYOLO_r18vd_Config


def _tiny_model():
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 5
    cfg.head = dict(cfg.head, num_classes=5)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_quantized_conv2d_close_to_fp32():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 16, 16, 32).astype(np.float32))
    w = r.randn(3, 3, 32, 64).astype(np.float32) * 0.1
    s = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / s), -127, 127).astype(np.int8))
    ref = np.asarray(conv2d(x, jnp.asarray(w), stride=1, padding=1))
    got = np.asarray(quantized_conv2d(x, wq, jnp.asarray(s), stride=1,
                                      padding=1))
    # weight quant (<=0.4%/elem) + activation quant errors accumulate over
    # k*k*cin=288 taps but partially cancel; demand tight agreement
    denom = np.maximum(np.abs(ref).mean(), 1e-6)
    assert np.abs(got - ref).mean() / denom < 0.02
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.999


def test_quantized_conv2d_zero_maps_to_zero():
    # symmetric quantization must keep zero-padding exact: an all-zero input
    # row produces exactly the bias (here zero)
    w = jnp.asarray(np.ones((3, 3, 4, 8), np.int8))
    s = jnp.asarray(np.full((8,), 0.01, np.float32))
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    y = np.asarray(quantized_conv2d(x, w, s, stride=1, padding=1))
    assert np.all(y == 0.0)


def test_int8_optimize_coverage_rules():
    _, params = _tiny_model()
    opt = optimize_for_inference(params, precision="int8", fold_bn=True)
    flat = flatten_tree(opt)
    # stem convs stay float (fused Pallas stem path folds float weights)
    for i in (1, 2, 3):
        assert flat[f"backbone.stage1_conv1_{i}.conv.weight"].dtype == jnp.bfloat16
    # BN-carrying backbone/head convs are int8 with fp32 scales
    q = [k for k in flat if k.endswith(".conv.weight")
         and flat[k].dtype == jnp.int8]
    assert len(q) >= 20  # r18vd: most of the 30 convs
    for k in q:
        sk = k[: -len(".weight")] + ".weight_scale"
        assert flat[sk].dtype == jnp.float32
        assert flat[sk].shape == (flat[k].shape[-1],)
    # output-logit convs (no BN) stay float
    for k in flat:
        if "yolo_output" in k and k.endswith(".conv.weight"):
            assert flat[k].dtype == jnp.bfloat16


def test_int8_model_outputs_track_bf16():
    model, params = _tiny_model()
    r = np.random.RandomState(1)
    x = jnp.asarray(r.rand(1, 128, 128, 3).astype(np.float32))
    p_bf = optimize_for_inference(params, precision="bf16", fold_bn=True)
    p_q = optimize_for_inference(params, precision="int8", fold_bn=True)
    ref = model.outputs(p_bf, x.astype(jnp.bfloat16), Ctx(train=False))
    got = model.outputs(p_q, x.astype(jnp.bfloat16), Ctx(train=False))
    for a, b in zip(ref, got):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        c = np.corrcoef(a, b)[0, 1]
        assert c > 0.995, c


def test_quantized_conv2d_static_scale_matches_dynamic():
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 8, 8, 32).astype(np.float32))
    w = r.randn(3, 3, 32, 64).astype(np.float32) * 0.1
    s = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / s), -127, 127).astype(np.int8))
    sw = jnp.asarray(s)
    dyn = np.asarray(quantized_conv2d(x, wq, sw, padding=1))
    # static scale == the dynamic amax => bit-identical results
    s_x = jnp.max(jnp.abs(x)) / 127.0
    sta = np.asarray(quantized_conv2d(x, wq, sw, padding=1, act_scale=s_x))
    np.testing.assert_array_equal(dyn, sta)


def test_min_k_rule_skips_underfilled_convs():
    from ppyolo_tpu.eval.optimize import quantize_params_int8, fold_bn_params
    _, params = _tiny_model()
    flat = flatten_tree(quantize_params_int8(fold_bn_params(params)))
    for k, v in flat.items():
        if k.endswith(".conv.weight") and v.dtype == jnp.int8:
            assert v.shape[0] * v.shape[1] * v.shape[2] >= 128, k


def test_calibration_pins_static_scales():
    model, params = _tiny_model()

    class _Cfg:
        test_cfg = {"target_size": 128}
        normalizeImage = {"mean": [0.485, 0.456, 0.406],
                          "std": [0.229, 0.224, 0.225], "is_scale": True}
        resizeImage = {"interp": 2}
        permute = {"to_bgr": False}

    from ppyolo_tpu.eval.detector import Detector
    det = Detector(model, params, _Cfg(), precision="int8")
    r = np.random.RandomState(4)
    calib = r.randint(0, 255, (2, 128, 128, 3), dtype=np.uint8)
    out_dyn = det.predict_batch(calib, np.array([[128, 128]] * 2, np.float32))
    n = det.calibrate(calib)
    assert n >= 5
    flat = flatten_tree(det.params)
    scales = [k for k in flat if k.endswith(".conv.act_scale")]
    assert len(scales) == n
    assert all(flat[k].dtype == jnp.float32 for k in scales)
    # on the calibration images themselves, static == dynamic scales, so
    # detections must agree closely
    out_sta = det.predict_batch(calib, np.array([[128, 128]] * 2, np.float32))
    assert out_sta.shape == out_dyn.shape
    assert np.isfinite(out_sta[out_sta[..., 0] >= 0]).all()


def test_int8_detector_end_to_end():
    model, params = _tiny_model()

    class _Cfg:
        test_cfg = {"target_size": 128}
        normalizeImage = {"mean": [0.485, 0.456, 0.406],
                          "std": [0.229, 0.224, 0.225], "is_scale": True}
        resizeImage = {"interp": 2}
        permute = {"to_bgr": False}

    from ppyolo_tpu.eval.detector import Detector
    det = Detector(model, params, _Cfg(), precision="int8")
    r = np.random.RandomState(2)
    img = r.randint(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    out = det.predict_batch(img, np.array([[128, 128]], np.float32))
    assert out.shape[0] == 1 and out.shape[-1] == 6
    assert out.dtype == np.float32
    assert np.isfinite(out[out[..., 0] >= 0]).all()
