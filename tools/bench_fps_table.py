#! /usr/bin/env python
"""Measure every BASELINE.md FPS row in ONE process (one TPU worker).

  python tools/bench_fps_table.py [--batch 8] [--group 64] [--rows 0,1,2,3,4]

Serving mode: bf16 + folded BN (+ the fused Pallas stem where eligible),
batch x group scanned per dispatch, detections synced to host per dispatch —
the same protocol as bench.py, generalized over (config, size).  Rows:

  0: ppyolo_2x   @608   (reference 16.6 FPS, README.md:13)
  1: ppyolo_2x   @320   (34.1, README.md:14)
  2: ppyolo_r18vd@608   (51.7, README.md:15)
  3: ppyolo_r18vd@416   (76.2, README.md:16)
  4: ppyolo_r18vd@320   (93.3, README.md:17)

Prints one table row per entry as it completes (remote compiles are slow;
partial output is still useful) and a JSON summary line at the end.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ROWS = [  # (config_idx, size, reference_fps)
    (0, 608, 16.6),
    (0, 320, 34.1),
    (1, 608, 51.7),
    (1, 416, 76.2),
    (1, 320, 93.3),
]


def bench_row(cfg_idx, size, batch, group, iters=3):
    import jax
    import jax.numpy as jnp
    from configs import get_config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.ops.module import Ctx
    from ppyolo_tpu.eval.optimize import optimize_for_inference

    cfg = get_config(cfg_idx)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = optimize_for_inference(params, precision="bf16", fold_bn=True)

    @jax.jit
    def predict_many(params, images, im_size):
        def body(_, xs):
            im, sz = xs
            return None, model.predict(params, im, sz, Ctx(train=False))

        _, outs = jax.lax.scan(body, None, (images, im_size))
        return outs

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(group, batch, size, size, 3), jnp.bfloat16)
    im_size = jnp.asarray(
        np.tile(np.array([[480, 640]], np.float32), (group, batch, 1)))

    for _ in range(4):  # compile + warm, synced per dispatch
        np.asarray(predict_many(params, images, im_size))

    fps = 0.0
    for _ in range(iters):
        t0 = time.time()
        np.asarray(predict_many(params, images, im_size))
        cost = time.time() - t0
        fps = max(fps, group * batch / cost)
    return fps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--group", type=int, default=64)
    p.add_argument("--rows", default="0,1,2,3,4")
    args = p.parse_args()

    names = {0: "ppyolo_2x", 1: "ppyolo_r18vd"}
    results = []
    print(f"serving bf16+fold, batch {args.batch} x scan {args.group}:")
    for i in (int(r) for r in args.rows.split(",")):
        cfg_idx, size, ref_fps = ROWS[i]
        fps = bench_row(cfg_idx, size, args.batch, args.group)
        results.append({"model": names[cfg_idx], "size": size,
                        "img_s": round(fps, 1), "ref_fps": ref_fps,
                        "speedup": round(fps / ref_fps, 1)})
        print(f"  {names[cfg_idx]:13s} @{size}: {fps:7.1f} img/s "
              f"({fps / ref_fps:5.1f}x the {ref_fps} FPS reference)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
