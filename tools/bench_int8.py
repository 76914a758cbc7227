"""Compare ppyolo_2x @608 serving throughput: bf16 vs int8 (dynamic and
calibrated-static activation scales).

Same protocol as bench.py (batch x scan-group per dispatch, detections
synced per dispatch); smaller group so three variants fit one run.
Run standalone: python tools/bench_int8.py
"""
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from configs import PPYOLO_2x_Config
from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx
from ppyolo_tpu.eval.optimize import (cast_params, calibrate_act_scales,
                                      fold_bn_params, quantize_params_int8)

BATCH, GROUP, SIZE = 8, 32, 608


def measure(fn, params, images, im_size, n_disp=3):
    for _ in range(4):
        np.asarray(fn(params, images, im_size))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n_disp):
            np.asarray(fn(params, images, im_size))
        best = min(best, (time.time() - t0) / n_disp)
    return GROUP * BATCH / best, best / GROUP * 1e3


def main():
    cfg = PPYOLO_2x_Config()
    model = PPYOLO.from_config(cfg)
    folded = fold_bn_params(model.init(jax.random.PRNGKey(0)))
    keep = (".weight_scale", ".act_scale")
    p_bf = cast_params(folded, jnp.bfloat16)
    p_dyn = cast_params(quantize_params_int8(folded), jnp.bfloat16,
                        keep_fp32_suffixes=keep)

    rng = np.random.RandomState(0)
    print("calibrating static scales (2 batches)...", flush=True)
    calib = [jnp.asarray(rng.randn(4, SIZE, SIZE, 3), jnp.bfloat16)
             for _ in range(2)]
    scales = calibrate_act_scales(model, p_bf, calib)
    print(f"  {len(scales)} convs recorded", flush=True)
    p_sta = cast_params(quantize_params_int8(folded, act_scales=scales),
                        jnp.bfloat16, keep_fp32_suffixes=keep)

    images = jnp.asarray(rng.rand(GROUP, BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    im_size = jnp.asarray(
        np.tile(np.array([[480, 640]], np.float32), (GROUP, BATCH, 1)))

    for name, p in [("bf16", p_bf), ("int8-dynamic", p_dyn),
                    ("int8-static", p_sta)]:
        @jax.jit
        def predict_many(params, images, im_size):
            def body(_, xs):
                im, sz = xs
                return None, model.predict(params, im, sz, Ctx(train=False))
            _, outs = jax.lax.scan(body, None, (images, im_size))
            return outs

        t0 = time.time()
        fps, ms = measure(predict_many, p, images, im_size)
        print(f"{name:13s}: {fps:7.1f} img/s  {ms:6.2f} ms/batch "
              f"(compile+measure {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
