"""Certify the fused Pallas stem kernel against the unfused conv chain.

Oracle = fused_stem_reference (conv2d x3 + max_pool2d), the exact op
sequence of the ResNet-vd stem in eval mode (reference model/resnet_vd.py:
100-108) after BN folding.  Interpret mode runs the kernel's math on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppyolo_tpu.ops.stem_pallas import (fused_stem, fused_stem_reference,
                                        stem_shapes, supports)


def _rand_weights(key, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    w1 = jax.random.normal(ks[0], (3, 3, 3, 32), dtype) * 0.3
    b1 = jax.random.normal(ks[1], (32,), dtype) * 0.1
    w2 = jax.random.normal(ks[2], (3, 3, 32, 32), dtype) * 0.1
    b2 = jax.random.normal(ks[3], (32,), dtype) * 0.1
    w3 = jax.random.normal(ks[4], (3, 3, 32, 64), dtype) * 0.1
    b3 = jax.random.normal(ks[5], (64,), dtype) * 0.1
    return w1, b1, w2, b2, w3, b3


@pytest.mark.parametrize("size,batch", [(32, 2), (64, 1), (96, 1)])
def test_fused_stem_matches_conv_chain(size, batch):
    key = jax.random.PRNGKey(size)
    ws = _rand_weights(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3),
                          jnp.float32)
    got = fused_stem(x, *ws, interpret=True)
    want = fused_stem_reference(x, *ws)
    assert got.shape == want.shape == (batch, size // 4, size // 4, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_bf16():
    key = jax.random.PRNGKey(7)
    ws = tuple(w.astype(jnp.bfloat16) for w in _rand_weights(key))
    x = (jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
         .astype(jnp.bfloat16))
    got = np.asarray(fused_stem(x, *ws, interpret=True), np.float32)
    want = np.asarray(fused_stem_reference(x.astype(jnp.float32),
                                           *[w.astype(jnp.float32)
                                             for w in ws]), np.float32)
    # bf16 matmuls with fp32 accumulation vs fp32 oracle
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_backbone_integration_parity():
    """ResNet18Vd eval forward with the fused stem (forced, interpret mode)
    matches the unfused XLA path on BN-folded bf16 params — the serving
    configuration the kernel targets."""
    from ppyolo_tpu.models.resnet_vd import ResNet18Vd
    from ppyolo_tpu.ops.module import Ctx
    from ppyolo_tpu.ops.stem_pallas import stem_impl
    from ppyolo_tpu.eval.optimize import optimize_for_inference

    bb = ResNet18Vd(feature_maps=(4, 5))
    params = bb.init(jax.random.PRNGKey(0))
    # non-trivial BN stats so the eval-mode fold is exercised
    for i in (1, 2, 3):
        bn = params[f"stage1_conv1_{i}"]["bn"]
        c = bn["running_mean"].shape[0]
        bn["running_mean"] = jax.random.normal(jax.random.PRNGKey(i), (c,)) * 0.1
        bn["running_var"] = 1.0 + jax.random.uniform(jax.random.PRNGKey(10 + i), (c,))
    params = optimize_for_inference(params, precision="bf16")
    x = (jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
         .astype(jnp.bfloat16))
    with stem_impl("xla"):
        want = [np.asarray(f, np.float32)
                for f in bb.apply(params, x, Ctx(train=False))]
    with stem_impl("pallas"):
        got = [np.asarray(f, np.float32)
               for f in bb.apply(params, x, Ctx(train=False))]
    for g, w in zip(got, want):
        # bf16 rounding differences between the two conv formulations
        np.testing.assert_allclose(g, w, rtol=0.25, atol=0.25)


def test_train_mode_never_fused():
    from ppyolo_tpu.models.resnet_vd import ResNet18Vd
    from ppyolo_tpu.ops.stem_pallas import stem_eligible

    bb = ResNet18Vd()
    mods = [bb.children_[f"stage1_conv1_{i}"] for i in (1, 2, 3)]
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    assert not stem_eligible(mods, x, train=True)
    assert not stem_eligible(mods, jnp.zeros((1, 64, 64, 3), jnp.float32),
                             train=False)


def test_supports_and_shapes():
    assert supports(608, jnp.bfloat16)
    assert supports(416, jnp.bfloat16)
    assert supports(320, jnp.bfloat16)
    assert not supports(608, jnp.float32)
    assert not supports(606, jnp.bfloat16)
    assert not supports(48, jnp.bfloat16)   # needs size % 32 == 0
    for s, r_expect in ((608, 8), (416, 8), (320, 20)):
        s2, s4, r = stem_shapes(s)
        assert s2 == s // 2 and s4 == s // 4 and r == r_expect
        assert s4 % r == 0
