#! /usr/bin/env python
"""Microbenchmark: DCNv2 forward+backward paths on the TPU.

Times one fwd+bwd (grads wrt x/weight/offset/mask) at the two PPYOLO
stage-5 shapes (608 input -> 38x38 s2 and 19x19 s1, C=512) for:
  * jnp gather formulation (autodiff backward)          ops/deform_conv.py
  * Pallas forward + one-hot XLA autodiff backward      bwd="onehot"
  * Pallas forward + Pallas backward kernel             bwd="pallas"

Measured with in-graph repetition (lax.fori_loop, carry-tied inputs so XLA
cannot hoist the body) — per-call wall clock through the axon tunnel is
meaningless (~28 ms/dispatch).

Usage: python tools/bench_dcn.py [--reps 20] [--batch 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_loop(step, z, reps):
    import jax
    from jax import lax

    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        # reduce to a scalar ON DEVICE: the tunnel moves ~39 MB/s, so pulling
        # an x-shaped carry would dominate the measurement
        return jnp.sum(lax.fori_loop(0, reps, lambda i, c: step(c), x0))

    np.asarray(run(z))  # compile + warm
    t0 = time.time()
    np.asarray(run(z))
    return (time.time() - t0) / reps


def bench(fn, args, reps):
    import jax
    import jax.numpy as jnp

    x = args[0]

    def loss(x_, w_, o_, m_):
        return jnp.sum(fn(x_, w_, o_, m_) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3))

    def step(c):
        gx, gw, go, gm = grad(x + 1e-30 * c, *args[1:])
        return c + gx + 1e-30 * (jnp.sum(gw) + jnp.sum(go) + jnp.sum(gm))

    return _timed_loop(step, jnp.zeros_like(x), reps)


def bench_fwd(fn, args, reps):
    import jax.numpy as jnp

    x = args[0]

    def step(c):
        out = fn(x + 1e-30 * c, *args[1:])
        return c + 1e-30 * jnp.sum(out)

    return _timed_loop(step, jnp.zeros_like(x), reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import functools
    from ppyolo_tpu.ops.deform_conv import deform_conv2d
    from ppyolo_tpu.ops.deform_conv_pallas import deform_conv2d_fast

    print(f"backend={jax.default_backend()} batch={a.batch} reps={a.reps}")
    shapes = [("38x38 s2 (stage5 entry)", 38, 2), ("19x19 s1 (stage5 body)", 19, 1)]
    for name, hw, stride in shapes:
        oh = (hw + 2 - 3) // stride + 1
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(a.batch, hw, hw, 512), jnp.float32)
        w = jnp.asarray(r.randn(3, 3, 512, 512) * 0.02, jnp.float32)
        off = jnp.asarray(r.randn(a.batch, oh, oh, 18) * 0.5, jnp.float32)
        msk = jnp.asarray(r.randn(a.batch, oh, oh, 9), jnp.float32)
        args = (x, w, off, msk)
        rows = [
            ("jnp gather (autodiff bwd)",
             functools.partial(deform_conv2d, stride=stride, padding=1)),
            ("pallas fwd + onehot XLA bwd",
             functools.partial(deform_conv2d_fast, stride=stride, padding=1,
                               bwd="onehot")),
            ("pallas fwd + pallas bwd",
             functools.partial(deform_conv2d_fast, stride=stride, padding=1,
                               bwd="pallas")),
        ]
        print(f"-- {name}: x[{a.batch},{hw},{hw},512] -> [{a.batch},{oh},{oh},512]")
        for label, fn in rows:
            try:
                fms = bench_fwd(fn, args, a.reps) * 1e3
                ms = bench(fn, args, a.reps) * 1e3
                print(f"   {label:32s} fwd {fms:7.3f}  fwd+bwd {ms:8.3f} ms/iter")
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"   {label:32s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
