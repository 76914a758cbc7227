"""Cross-framework parity vs torch (CPU) — the reference's own validation
style (1_test_dcn.py checked its DCN against Paddle).  Here we pin the
subtle BatchNorm semantics (biased batch var for normalization, unbiased for
the running update, momentum=0.1) and conv numerics against torch."""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ppyolo_tpu.ops.conv import batch_norm, conv2d


def test_batch_norm_train_matches_torch():
    r = np.random.RandomState(0)
    n, h, w, c = 4, 6, 5, 7
    x = r.randn(n, h, w, c).astype(np.float32)
    scale = r.rand(c).astype(np.float32) + 0.5
    bias = r.randn(c).astype(np.float32)
    rmean = r.randn(c).astype(np.float32)
    rvar = r.rand(c).astype(np.float32) + 0.5

    tbn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))
        tbn.running_mean.copy_(torch.tensor(rmean))
        tbn.running_var.copy_(torch.tensor(rvar))
    tbn.train()
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    ty = tbn(tx).permute(0, 2, 3, 1).detach().numpy()

    y, nm, nv = batch_norm(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias), jnp.asarray(rmean),
                           jnp.asarray(rvar), train=True)
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_matches_torch():
    r = np.random.RandomState(1)
    c = 5
    x = r.randn(2, 4, 4, c).astype(np.float32)
    scale = r.rand(c).astype(np.float32) + 0.5
    bias = r.randn(c).astype(np.float32)
    rmean = r.randn(c).astype(np.float32)
    rvar = r.rand(c).astype(np.float32) + 0.5
    tbn = torch.nn.BatchNorm2d(c, eps=1e-5)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))
        tbn.running_mean.copy_(torch.tensor(rmean))
        tbn.running_var.copy_(torch.tensor(rvar))
    tbn.eval()
    with torch.no_grad():
        ty = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    y, _, _ = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                         jnp.asarray(rmean), jnp.asarray(rvar), train=False)
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv2d_matches_torch(stride):
    r = np.random.RandomState(2)
    x = r.randn(2, 9, 9, 4).astype(np.float32)
    w = r.randn(3, 3, 4, 6).astype(np.float32)        # HWIO
    b = r.randn(6).astype(np.float32)
    tw = torch.tensor(w.transpose(3, 2, 0, 1))        # OIHW
    ty = torch.nn.functional.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2), tw, torch.tensor(b),
        stride=stride, padding=1).permute(0, 2, 3, 1).numpy()
    y = conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=1,
               bias=jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


def test_leaky_and_mish_match_torch():
    from ppyolo_tpu.ops.conv import apply_act

    r = np.random.RandomState(3)
    x = r.randn(100).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(apply_act(jnp.asarray(x), "leaky")),
        torch.nn.functional.leaky_relu(torch.tensor(x), 0.1).numpy(),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(apply_act(jnp.asarray(x), "mish")),
        torch.nn.functional.mish(torch.tensor(x)).numpy(),
        rtol=1e-5, atol=1e-6)
