"""Pallas DCNv2 kernel vs the jnp reference formulation (interpret mode on
CPU; the same kernel compiles natively on TPU — see bench notes in
ops/deform_conv_pallas.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppyolo_tpu.ops.deform_conv import deform_conv2d
from ppyolo_tpu.ops.deform_conv_pallas import (deform_conv2d_pallas,
                                               deform_conv2d_fast)


@pytest.mark.parametrize("shape", [(2, 9, 9, 8, 16, 1), (1, 10, 10, 8, 12, 2)])
def test_pallas_matches_jnp(shape):
    n, h, w, c, oc, stride = shape
    oh = (h + 2 - 2 - 1) // stride + 1
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(n, h, w, c), jnp.float32)
    wt = jnp.asarray(r.randn(3, 3, c, oc) * 0.1, jnp.float32)
    off = jnp.asarray(r.randn(n, oh, oh, 18) * 0.7, jnp.float32)
    msk = jnp.asarray(r.randn(n, oh, oh, 9), jnp.float32)
    ref = np.asarray(deform_conv2d(x, wt, off, msk, stride=stride, padding=1))
    got = np.asarray(deform_conv2d_pallas(x, wt, off, msk, stride=stride,
                                          padding=1, interpret=True))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 0.01  # bf16 matmul tolerance


def test_fast_wrapper_grads_match_jnp():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1, 6, 6, 4), jnp.float32)
    wt = jnp.asarray(r.randn(3, 3, 4, 8) * 0.1, jnp.float32)
    off = jnp.asarray(r.randn(1, 6, 6, 18) * 0.3, jnp.float32)
    msk = jnp.asarray(r.randn(1, 6, 6, 9), jnp.float32)

    def loss_fast(x, wt, off, msk):
        return jnp.sum(deform_conv2d_fast(x, wt, off, msk, padding=1) ** 2)

    def loss_jnp(x, wt, off, msk):
        return jnp.sum(deform_conv2d(x, wt, off, msk, padding=1) ** 2)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2, 3))(x, wt, off, msk)
    gj = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(x, wt, off, msk)
    # backward is the jnp autodiff in both cases; forward residual (g scale)
    # differs only by bf16 forward rounding entering the loss gradient
    for a, b in zip(gf, gj):
        na, nb = np.asarray(a), np.asarray(b)
        assert np.abs(na - nb).max() / (np.abs(nb).max() + 1e-9) < 0.05
