"""Golden-detection regression fixture.

Freezes the end-to-end fp32 prediction of a fixed-seed r18vd on a fixed
input.  Any future optimization (kernel rewrites, fusion changes, layout
moves) must keep these detections bit-close — the guard the reference never
had for its own refactors.  Regenerate with REGEN=1 python -m pytest
tests/test_golden.py after an INTENTIONAL semantic change.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx
from configs import PPYOLO_r18vd_Config

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_r18vd.npz")


def _compute():
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 6
    cfg.head = dict(cfg.head, num_classes=6)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(123))
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(2, 160, 160, 3), jnp.float32)
    im_size = jnp.asarray(np.array([[480, 640], [160, 160]], np.float32))
    pred = model.predict(params, images, im_size, Ctx(train=False))
    outs = model.outputs(params, images, Ctx(train=False))
    return np.asarray(pred), np.asarray(outs[0])


def test_golden_detections():
    pred, out0 = _compute()
    if os.environ.get("REGEN") or not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, pred=pred, out0=out0)
        if not os.environ.get("REGEN"):
            print("golden fixture created; rerun to verify")
        return
    ref = np.load(FIXTURE)
    # raw head map: tight tolerance (pure conv stack)
    np.testing.assert_allclose(out0, ref["out0"], rtol=1e-4, atol=1e-4)
    # final detections: labels exact, scores tight, boxes loose (exp decode)
    np.testing.assert_array_equal(pred[..., 0], ref["pred"][..., 0])
    np.testing.assert_allclose(pred[..., 1], ref["pred"][..., 1],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(pred[..., 2:], ref["pred"][..., 2:],
                               rtol=1e-3, atol=0.5)
