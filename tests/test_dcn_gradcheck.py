"""Finite-difference gradcheck of DCNv2 input/weight/offset/mask gradients.

Round-1 judge item #6 (VERDICT.md): the bilinear-corner gradient was only
checked for finiteness and Pallas-vs-jnp agreement — two paths sharing one
derivation, so a common-mode error passes both.  Here we certify the math
itself against central finite differences in fp64 on tiny shapes, mirroring
the reference's double-precision torch.autograd.gradcheck
(reference external/DCNv2/test.py:70-100).

Both differentiable formulations are checked:
  * ``deform_conv2d``       — the jnp gather formulation (training default),
  * ``deform_conv2d_onehot``— whose autodiff IS the custom_vjp backward of
                              the Pallas kernel path (deform_conv_pallas.py
                              _dcn_fast_bwd), so this certifies that too.

Offsets are drawn from [0.2, 0.45] so sampling points sit away from the
integer lattice (bilinear floor() kinks) — finite differences are only
valid where the function is smooth; the kink set has measure zero.
"""
import contextlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppyolo_tpu.ops.deform_conv import deform_conv2d
from ppyolo_tpu.ops.deform_conv_pallas import deform_conv2d_onehot

pytestmark = pytest.mark.slow


@contextlib.contextmanager
def enable_x64():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)

ARG_NAMES = ("x", "weight", "offset", "mask")


def _make_inputs(rng):
    x = rng.randn(1, 5, 5, 2)
    w = rng.randn(3, 3, 2, 2) * 0.3
    off = rng.uniform(0.2, 0.45, (1, 5, 5, 18))
    mask = rng.randn(1, 5, 5, 9) * 0.5
    proj = rng.randn(1, 5, 5, 2)  # random cotangent -> scalar loss
    return [x, w, off, mask], proj


@pytest.mark.parametrize("fn", [deform_conv2d, deform_conv2d_onehot],
                         ids=["gather", "onehot"])
def test_dcn_finite_difference_gradcheck(fn):
    with enable_x64():
        rng = np.random.RandomState(0)
        args, proj = _make_inputs(rng)
        proj_j = jnp.asarray(proj)

        def loss(x, w, off, mask):
            out = fn(x, w, off, mask, stride=1, padding=1)
            return jnp.sum(out * proj_j)

        loss_j = jax.jit(loss)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            *map(jnp.asarray, args))

        eps = 1e-5
        for ai, name in enumerate(ARG_NAMES):
            a = np.asarray(args[ai], np.float64)
            flat = a.reshape(-1)
            ana_flat = np.asarray(grads[ai]).reshape(-1)
            picks = rng.choice(flat.size, min(40, flat.size), replace=False)
            for p in picks:
                ap, am = flat.copy(), flat.copy()
                ap[p] += eps
                am[p] -= eps
                argp = [ap.reshape(a.shape) if j == ai else args[j]
                        for j in range(4)]
                argm = [am.reshape(a.shape) if j == ai else args[j]
                        for j in range(4)]
                num = (float(loss_j(*map(jnp.asarray, argp)))
                       - float(loss_j(*map(jnp.asarray, argm)))) / (2 * eps)
                ana = float(ana_flat[p])
                assert abs(num - ana) <= 1e-6 + 1e-5 * max(abs(num), abs(ana)), (
                    f"{name}[{p}]: finite-diff {num} vs autodiff {ana}")


def test_gather_and_onehot_grads_identical_fp64():
    """The two formulations must be the SAME function: fp64 grads bit-close."""
    with enable_x64():
        rng = np.random.RandomState(1)
        args, proj = _make_inputs(rng)
        proj_j = jnp.asarray(proj)

        def grads_of(fn):
            def loss(x, w, off, mask):
                return jnp.sum(fn(x, w, off, mask, stride=1, padding=1)
                               * proj_j)
            return jax.grad(loss, argnums=(0, 1, 2, 3))(
                *map(jnp.asarray, args))

        for name, ga, go in zip(ARG_NAMES, grads_of(deform_conv2d),
                                grads_of(deform_conv2d_onehot)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(go),
                                       rtol=1e-10, atol=1e-12, err_msg=name)
