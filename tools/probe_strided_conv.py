"""Measure the strided-3x3 implementations at the serving shapes (r4 #4).

stage3_0 conv2: [8,152,152,128] -> [8,76,76,128], stage4_0 conv2:
[8,76,76,256] -> [8,38,38,256] (b8@608 bf16 serving).  Device time via an
in-graph lax.scan over DISTINCT inputs (xs); per-variant back-to-back in
one process, baseline re-run last as drift control.

Usage: python tools/probe_strided_conv.py [--batch 8] [--scan 32] [--disp 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan", type=int, default=32)
    ap.add_argument("--disp", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ppyolo_tpu.ops.strided_conv_pallas import (
        conv_s2_xla, conv_s2_phase, conv_s2_pallas)

    dt = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    shapes = [("stage3_0", 152, 128, 128), ("stage4_0", 76, 256, 256)]
    variants = {
        "xla": conv_s2_xla,
        "phase": conv_s2_phase,
        "pallas3d": lambda x, w: conv_s2_pallas(x, w, use_3d_dot=True),
        "pallasloop": lambda x, w: conv_s2_pallas(x, w, use_3d_dot=False,
                                                  block_rows=4),
        "xla#2": conv_s2_xla,
    }
    summary = {}
    r = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} b{a.batch} scan={a.scan} "
          f"dtype={a.dtype}")
    for name, H, C, Co in shapes:
        xs = jnp.asarray(r.randn(a.scan, a.batch, H, H, C) * 0.1, dt)
        w = jnp.asarray(r.randn(3, 3, C, Co) * 0.05, dt)
        bpe = jnp.dtype(dt).itemsize
        gb = a.scan * a.batch * ((H * H * C + (H // 2) ** 2 * Co) * bpe) / 1e9
        gf = a.scan * a.batch * (H // 2) ** 2 * C * Co * 9 * 2 / 1e12
        # 0.819 GB/ms HBM, 0.197 TFLOP/ms MXU (v5e); gb/gf are totals over
        # scan*batch images, so /0.819 (or /0.197) is already total ms
        print(f"{name}: [{a.batch},{H},{H},{C}]->{Co}  floor "
              f"HBM {gb / 0.819 / a.scan / a.batch * 8:.3f} "
              f"MXU {gf / 0.197 / a.scan / a.batch * 8:.3f} ms/b8")
        row = {}
        for vname, fn in variants.items():
            @jax.jit
            def run(xs, w, fn=fn):
                def body(c, x):
                    y = fn(x, w)
                    return c + y[0, 0, 0, :1].astype(jnp.float32), None
                c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), xs)
                return c
            try:
                t0 = time.time()
                np.asarray(run(xs, w))
                comp = time.time() - t0
                t0 = time.time()
                for _ in range(a.disp):
                    out = run(xs, w)
                np.asarray(out)
                ms = (time.time() - t0) / (a.disp * a.scan) * 1e3 / a.batch * 8
            except Exception as e:  # Mosaic rejections are data too
                print(f"  {vname:<11} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")
                row[vname] = None
                continue
            row[vname] = round(ms, 4)
            print(f"  {vname:<11} {ms:7.3f} ms/b8-batch   (compile {comp:.0f}s)")
        summary[name] = row
    print(json.dumps({"metric": "strided_conv_ab_ms_per_b8_batch",
                      **summary}))


if __name__ == "__main__":
    main()
