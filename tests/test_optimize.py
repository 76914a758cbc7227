"""BN folding must be an exact graph rewrite (same predictions, fp32)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx
from ppyolo_tpu.eval.optimize import fold_bn_params, optimize_for_inference
from configs import PPYOLO_r18vd_Config


def test_fold_bn_preserves_outputs():
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 5
    cfg.head = dict(cfg.head, num_classes=5)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # randomize bn stats so folding is non-trivial
    r = np.random.RandomState(0)

    def jitter(path_tree):
        from ppyolo_tpu.ops.module import flatten_tree, unflatten_tree
        flat = flatten_tree(path_tree)
        for k in flat:
            if ".bn." in k:
                v = np.asarray(flat[k])
                if k.endswith("running_var"):
                    flat[k] = jnp.asarray(np.abs(v + r.rand(*v.shape)) + 0.1)
                else:
                    flat[k] = jnp.asarray(v + 0.3 * r.randn(*v.shape).astype(np.float32))
        return unflatten_tree(flat)

    params = jitter(params)
    x = jnp.asarray(r.rand(1, 128, 128, 3), jnp.float32)
    ref = model.outputs(params, x, Ctx(train=False))
    folded = fold_bn_params(params)
    got = model.outputs(folded, x, Ctx(train=False))
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_bf16_predict_contract():
    """Shape/dtype/finiteness contract of the bf16+fold predict path on
    random weights.  The ACCURACY pin for the composed flagship bf16 stack
    lives in tests/test_overfit.py::test_overfit_mini2x_bf16_serving_stack_
    agrees (trained weights, detection agreement vs fp32) — random-weight
    scores are too noisy to compare numerically here."""
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 5
    cfg.head = dict(cfg.head, num_classes=5)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(1))
    r = np.random.RandomState(1)
    x = jnp.asarray(r.rand(1, 128, 128, 3), jnp.float32)
    im_size = jnp.asarray(np.array([[128, 128]], np.float32))
    ref = model.predict(params, x, im_size)
    opt = optimize_for_inference(params, precision="bf16", fold_bn=True)
    got = model.predict(opt, x.astype(jnp.bfloat16), im_size)
    assert got.shape == ref.shape
    assert got.dtype == jnp.float32
    assert np.isfinite(np.asarray(got)).all()
