#! /usr/bin/env python
"""Pre-compile the multi-scale train-step executables (one per size bucket).

  python tools/warmup_shapes.py --config=0 [--precision bf16]
      [--scan_steps N] [--sizes 320,608] [--batch_size B]

Multi-scale training draws one of the 10 input sizes per batch
(reference config/ppyolo_2x.py:189 -> cfg.randomShape['sizes']), so the
first epoch hits up to 10 separate XLA compilations.  On this runtime a
remote full-model compile is 90-340 s (bad days 15-25 min, CLAUDE.md), so an
un-warmed first epoch can stall for tens of minutes at unpredictable points.
This tool AOT-compiles every bucket up front (``jit(...).lower(...).
compile()`` — traces and compiles without executing), sequentially in ONE
process (never run two TPU processes concurrently on this runtime), which
also populates the runtime's compilation cache for the subsequent train run.

Prints per-size compile seconds and a total.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def dummy_batch(cfg, size: int, batch_size: int, scan_steps: int = 1):
    """A shape-faithful batch for one size bucket (content irrelevant —
    compile only): uint8 image transport + padded gt arrays, exactly what
    data/loader.py::assemble_batch ships."""
    m = int(cfg.padBox.get("num_max_boxes", 50))
    b = {
        "image": np.zeros((batch_size, size, size, 3), np.uint8),
        "gt_bbox": np.zeros((batch_size, m, 4), np.float32),
        "gt_class": np.zeros((batch_size, m), np.int32),
        "gt_score": np.zeros((batch_size, m), np.float32),
    }
    if not cfg.train_cfg.get("device_normalize", True):
        b["image"] = b["image"].astype(np.float32)
    if scan_steps > 1:
        b = {k: np.stack([v] * scan_steps) for k, v in b.items()}
    return b


def warmup(cfg, *, sizes=None, scan_steps: int = 1, verbose: bool = True):
    """Compile the train step for each size; returns {size: seconds}."""
    import jax
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train import make_train_step, init_train_state
    from ppyolo_tpu.train.train_step import make_multi_train_step
    import jax.numpy as jnp

    tc = cfg.train_cfg
    compute_dtype = (jnp.bfloat16 if tc.get("precision") == "bf16"
                     else jnp.float32)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    if scan_steps > 1:
        fn = jax.jit(make_multi_train_step(
            model, cfg, n_steps=scan_steps, compute_dtype=compute_dtype))
    else:
        fn = jax.jit(make_train_step(model, cfg, compute_dtype=compute_dtype))

    sizes = list(sizes or cfg.randomShape["sizes"])
    rng = jax.random.PRNGKey(1)
    times = {}
    for size in sizes:
        batch = dummy_batch(cfg, size, tc["batch_size"], scan_steps)
        t0 = time.time()
        fn.lower(state, batch, rng).compile()
        times[size] = time.time() - t0
        if verbose:
            print(f"  {size}x{size}: compiled in {times[size]:.1f}s")
    if verbose:
        print(f"total: {sum(times.values()):.1f}s over {len(sizes)} buckets")
    return times


def main():
    from tools.argparser import str2bool

    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--use_gpu", type=str2bool, default=True)
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    p.add_argument("--scan_steps", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=0,
                   help="override cfg batch size")
    p.add_argument("--sizes", default="",
                   help="comma list; default = all cfg.randomShape sizes")
    args = p.parse_args()
    if not args.use_gpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from configs import get_config

    cfg = get_config(args.config)
    cfg.train_cfg["precision"] = args.precision
    if args.batch_size:
        cfg.train_cfg["batch_size"] = args.batch_size
    sizes = ([int(s) for s in args.sizes.split(",") if s]
             or cfg.randomShape["sizes"])
    warmup(cfg, sizes=sizes, scan_steps=args.scan_steps)


if __name__ == "__main__":
    main()
