"""A/B the multi-step target-pipeline modes on device (r4 VERDICT #3).

The r3 ablation attributed ~4.5 ms/step of the frozen b16@608 train step to
"scheduling overlap" around the on-device Gt2YoloTarget build (4.6 ms
in-step vs 2.7 standalone) and the SGD/EMA bucket.  This probe measures the
three bitwise-identical pipeline placements of the build
(train_step.make_multi_train_step target_pipeline=):

  step      — in the scan body, right before the forward (baseline)
  prescan   — one vectorized [n_steps*B] build before the scan
  doublebuf — software pipeline through the scan carry (build i+1 in
              step i's program)

Device-only: batches resident, one dispatch = scan over n_steps DISTINCT
batches (xs).  Modes run back-to-back in one process, baseline repeated
last as a drift control (device-side day variance is 15-47% ACROSS
sessions on this relay — only within-run comparisons are valid).

Usage: python tools/probe_target_pipeline.py [--batch 16] [--scan 8]
       [--size 608] [--disp 8] [--precision bf16] [--freeze 5]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--disp", type=int, default=8)
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--freeze", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from configs import PPYOLO_2x_Config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train import init_train_state
    from ppyolo_tpu.train.train_step import make_multi_train_step

    cfg = PPYOLO_2x_Config()
    cfg.backbone = dict(cfg.backbone, freeze_at=a.freeze)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=a.batch)

    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    dt = jnp.bfloat16 if a.precision == "bf16" else jnp.float32

    # n_steps DISTINCT device-resident batches (uint8 transport, on-device
    # targets — the production configuration)
    r = np.random.RandomState(0)
    m, n, b = 50, a.scan, a.batch
    gt_bbox = np.zeros((n, b, m, 4), np.float32)
    gt_bbox[:, :, :8, 0:2] = r.uniform(0.2, 0.8, (n, b, 8, 2))
    gt_bbox[:, :, :8, 2:4] = r.uniform(0.05, 0.4, (n, b, 8, 2))
    gt_score = np.zeros((n, b, m), np.float32)
    gt_score[:, :, :8] = 1.0
    batches = jax.device_put({
        "image": r.randint(0, 256, (n, b, a.size, a.size, 3)).astype(np.uint8),
        "gt_bbox": gt_bbox,
        "gt_class": r.randint(0, cfg.num_classes, (n, b, m)).astype(np.int32),
        "gt_score": gt_score,
    })

    print(f"backend={jax.default_backend()} b{a.batch}@{a.size} "
          f"scan={a.scan} freeze={a.freeze} prec={a.precision} "
          f"disp={a.disp}")
    results = {}
    order = ["step", "prescan", "doublebuf", "step#2"]
    for tag in order:
        mode = tag.split("#")[0]
        fn = jax.jit(make_multi_train_step(model, cfg, n_steps=a.scan,
                                           compute_dtype=dt,
                                           target_pipeline=mode))
        state = init_train_state(model, params, cfg)
        t0 = time.time()
        st, losses = fn(state, batches, jax.random.PRNGKey(1))
        lt = np.asarray(losses["total_loss"])  # sync (block_until_ready
        # does not sync through the tunnel)
        assert np.isfinite(lt).all(), (tag, lt)
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(a.disp):
            st, losses = fn(st, batches, jax.random.PRNGKey(2 + i))
        lt = np.asarray(losses["total_loss"])
        ms = (time.time() - t0) / (a.disp * a.scan) * 1e3
        assert np.isfinite(lt).all(), (tag, lt)
        results[tag] = ms
        print(f"{tag:<10} {ms:7.2f} ms/step  {a.batch / ms * 1e3:7.1f} img/s"
              f"   (compile {compile_s:.0f}s)")

    base = min(results["step"], results["step#2"])
    print(json.dumps({
        "metric": "target_pipeline_ab_ms_per_step", **{
            k: round(v, 2) for k, v in results.items()},
        "best_mode": min(results, key=results.get),
        "prescan_vs_step_pct": round(
            (results["prescan"] / base - 1) * 100, 1),
        "doublebuf_vs_step_pct": round(
            (results["doublebuf"] / base - 1) * 100, 1),
    }))


if __name__ == "__main__":
    main()
