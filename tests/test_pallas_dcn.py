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

pytestmark = pytest.mark.slow


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


@pytest.mark.parametrize("bwd", ["pallas", "onehot"])
def test_fast_wrapper_grads_match_jnp(bwd):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1, 6, 6, 4), jnp.float32)
    wt = jnp.asarray(r.randn(3, 3, 4, 8) * 0.1, jnp.float32)
    off = jnp.asarray(r.randn(1, 6, 6, 18) * 0.3, jnp.float32)
    msk = jnp.asarray(r.randn(1, 6, 6, 9), jnp.float32)

    def loss_fast(x, wt, off, msk):
        return jnp.sum(
            deform_conv2d_fast(x, wt, off, msk, padding=1, bwd=bwd) ** 2)

    def loss_jnp(x, wt, off, msk):
        return jnp.sum(deform_conv2d(x, wt, off, msk, padding=1) ** 2)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2, 3))(x, wt, off, msk)
    gj = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(x, wt, off, msk)
    # both backwards evaluate the same math; differences are bf16 rounding
    # in the kernel matmuls plus bf16 forward rounding entering the loss grad
    for a, b in zip(gf, gj):
        na, nb = np.asarray(a), np.asarray(b)
        assert np.abs(na - nb).max() / (np.abs(nb).max() + 1e-9) < 0.05


@pytest.mark.parametrize("shape", [(2, 9, 9, 8, 16, 1), (1, 10, 10, 8, 12, 2)])
def test_pallas_backward_matches_onehot_autodiff(shape):
    """The backward KERNEL vs XLA autodiff of the identical formulation.

    Random cotangent, all four input grads; interpret mode on CPU.  The
    one-hot autodiff side is itself finite-difference-certified in
    tests/test_dcn_gradcheck.py, so agreement here certifies the kernel.
    """
    from ppyolo_tpu.ops.deform_conv_pallas import (_dcn_bwd_pallas,
                                                   deform_conv2d_onehot)
    n, h, w, c, oc, stride = shape
    oh = (h + 2 - 2 - 1) // stride + 1
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(n, h, w, c), jnp.float32)
    wt = jnp.asarray(r.randn(3, 3, c, oc) * 0.1, jnp.float32)
    off = jnp.asarray(r.randn(n, oh, oh, 18) * 0.7, jnp.float32)
    msk = jnp.asarray(r.randn(n, oh, oh, 9), jnp.float32)
    g = jnp.asarray(r.randn(n, oh, oh, oc), jnp.float32)

    _, vjp = jax.vjp(
        lambda *a: deform_conv2d_onehot(*a, stride=stride, padding=1),
        x, wt, off, msk)
    ref = vjp(g)
    got = _dcn_bwd_pallas(x, wt, off, msk, g, stride=stride, padding=1,
                          interpret=True)
    for name, a, b in zip(("x", "weight", "offset", "mask"), got, ref):
        na, nb = np.asarray(a), np.asarray(b)
        scale = np.abs(nb).max() + 1e-9
        assert np.abs(na - nb).max() / scale < 0.02, name
