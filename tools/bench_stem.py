"""Benchmark the fused Pallas stem kernel vs the XLA conv chain on TPU.

Device time via in-graph repetition over DISTINCT inputs (lax.scan over xs —
CLAUDE.md: a loop-invariant body gets hoisted by XLA and flatters the number).

  python tools/bench_stem.py [--size 608] [--batch 8] [--scan 32] [--check]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from ppyolo_tpu.ops.stem_pallas import fused_stem, fused_stem_reference


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan", type=int, default=32)
    ap.add_argument("--check", action="store_true",
                    help="also compare kernel vs XLA outputs on device")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--rows_cap", type=int, default=0,
                    help="override stem_pallas.BLOCK_ROWS_CAP (0 = default)")
    ap.add_argument("--xla", action="store_true",
                    help="also time the XLA conv chain (default: kernel only)")
    args = ap.parse_args()
    if args.rows_cap:
        from ppyolo_tpu.ops import stem_pallas
        stem_pallas.BLOCK_ROWS_CAP.set(args.rows_cap)
        from ppyolo_tpu.ops.stem_pallas import stem_shapes
        print(f"rows_cap={args.rows_cap} -> R={stem_shapes(args.size)[2]}, "
              f"grid steps/img={args.size // 4 // stem_shapes(args.size)[2]}")
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.RandomState(0)
    xs = jnp.asarray(
        rng.randn(args.scan, args.batch, args.size, args.size, 3), dt)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    ws = [jax.random.normal(k, s, dt) * sc for k, s, sc in zip(
        ks, [(3, 3, 3, 32), (32,), (3, 3, 32, 32), (32,),
             (3, 3, 32, 64), (64,)], [0.3, 0.1, 0.1, 0.1, 0.1, 0.1])]

    def scan_over(fn):
        @jax.jit
        def run(xs, ws):
            def body(_, x):
                return None, fn(x, *ws).sum(dtype=jnp.float32)
            _, outs = jax.lax.scan(body, None, xs)
            return outs
        return run

    variants = [("pallas", fused_stem)]
    if args.xla:
        variants.append(("xla", fused_stem_reference))
    results = {}
    for name, fn in variants:
        run = scan_over(fn)
        t0 = time.time()
        out = np.asarray(run(xs, ws))   # compile + run (np forces tunnel sync)
        t_compile = time.time() - t0
        t0 = time.time()
        out = np.asarray(run(xs, ws))
        dt_run = time.time() - t0
        per_batch = dt_run / args.scan * 1e3
        results[name] = per_batch
        print(f"{name:7s} compile {t_compile:7.1f}s  "
              f"{dt_run*1e3:8.1f} ms/dispatch  {per_batch:7.3f} ms/batch  "
              f"({args.batch*args.scan/dt_run:.0f} img/s)  checksum "
              f"{out.sum():.1f}")

    if "pallas" in results and "xla" in results:
        print(f"speedup: {results['xla']/results['pallas']:.2f}x")

    if args.check:
        x = xs[0]
        a = np.asarray(fused_stem(x, *ws), np.float32)
        b = np.asarray(fused_stem_reference(x, *ws), np.float32)
        err = np.abs(a - b).max()
        rel = err / max(np.abs(b).max(), 1e-9)
        print(f"max abs diff {err:.4g}  (rel {rel:.4g})")


if __name__ == "__main__":
    main()
