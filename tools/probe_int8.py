"""Probe: does int8 conv beat bf16 on this TPU (v5e MXU has 2x int8 peak)?

Times shape-preserving convs chained through lax.fori_loop (so XLA cannot
hoist them) at bf16 vs int8(+requant), device-synced via np.asarray.
Run standalone: python tools/probe_int8.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_once(fn, x, iters):
    t0 = time.perf_counter()
    y = fn(x, jnp.int32(iters))
    np.asarray(y.ravel()[0])
    return time.perf_counter() - t0


def _time(fn, x, lo=200, hi=2000):
    """Per-iteration time via the slope between two iteration counts —
    cancels the ~28 ms tunnel dispatch constant exactly."""
    np.asarray(fn(x, jnp.int32(lo)).ravel()[0])  # compile + warm
    t_lo = min(_time_once(fn, x, lo) for _ in range(2))
    t_hi = min(_time_once(fn, x, hi) for _ in range(2))
    return (t_hi - t_lo) / (hi - lo)


def conv(x, w, acc_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def bench_shape(n, h, c, k):
    flops = 2 * n * h * h * c * c * k * k
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (n, h, h, c), jnp.float32)
    wf = jax.random.normal(key, (k, k, c, c), jnp.float32) * 0.05

    @jax.jit
    def run_bf16(x, iters):
        w = wf.astype(jnp.bfloat16)

        def body(_, x):
            return jax.nn.relu(conv(x, w, jnp.float32)).astype(jnp.bfloat16)

        return lax.fori_loop(0, iters, body, x)

    @jax.jit
    def run_int8(x, iters):
        w = jnp.clip(jnp.round(wf * 127), -127, 127).astype(jnp.int8)

        def body(_, x):
            y = conv(x, w, jnp.int32)
            # realistic inter-layer requant: shift+clip back to int8
            return jnp.clip(y >> 7, -128, 127).astype(jnp.int8)

        return lax.fori_loop(0, iters, body, x)

    t_bf = _time(run_bf16, xf.astype(jnp.bfloat16))
    t_i8 = _time(run_int8,
                 jnp.clip(jnp.round(xf * 32), -128, 127).astype(jnp.int8))
    peak_bf, peak_i8 = 197e12, 394e12
    print(f"conv {n}x{h}x{h}x{c} k{k}: bf16 {t_bf*1e3:7.3f} ms "
          f"({flops/t_bf/peak_bf*100:5.1f}% MXU) | int8 {t_i8*1e3:7.3f} ms "
          f"({flops/t_i8/peak_i8*100:5.1f}% of int8 peak) | "
          f"speedup {t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench_shape(8, 76, 128, 3)    # stage-3-ish, 93-98% MXU in bf16
    bench_shape(8, 38, 256, 3)    # stage-4 3x3
    bench_shape(8, 19, 512, 3)    # stage-5 3x3
    bench_shape(8, 152, 64, 1)    # stage-2 1x1 (12-16% MXU in bf16)
    bench_shape(8, 38, 512, 1)    # head-ish 1x1
