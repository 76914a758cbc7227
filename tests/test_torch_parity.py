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


def test_sgd_momentum_policy_matches_torch():
    """5-step trajectory parity of our sgd_momentum_update against
    torch.optim.SGD driven exactly as the reference drives it
    (train.py:271-280,437-442 + custom_layers.py add_param_group): per-group
    lr = lr_t * lr_mult reassigned every iteration, weight_decay 0 for norm
    params / conv biases, momentum 0.9."""
    import torch
    import jax.numpy as jnp
    from ppyolo_tpu.train.optimizer import sgd_momentum_update
    from ppyolo_tpu.ops.module import ParamPolicy

    rng = np.random.RandomState(0)
    base_wd, momentum = 0.0005, 0.9
    specs = {
        "conv.weight": ((4, 3, 3, 3), 1.0, 1.0),   # (shape, lr_mult, wd_mult)
        "conv.bias": ((4,), 2.0, 0.0),
        "bn.scale": ((4,), 0.5, 0.0),
        "head.weight": ((8, 4), 1.0, 1.0),
    }
    init = {k: rng.randn(*s[0]).astype(np.float32) for k, s in specs.items()}
    grads_per_step = [
        {k: rng.randn(*s[0]).astype(np.float32) for k, s in specs.items()}
        for _ in range(5)]
    lrs = [0.001, 0.002, 0.0005, 0.002, 0.001]

    # torch side — one group per param, reference-style lr reassignment
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in init.items()}
    groups = [{"params": [tparams[k]], "lr": lrs[0] * specs[k][1],
               "base_lr": specs[k][1], "weight_decay": base_wd * specs[k][2]}
              for k in specs]
    opt = torch.optim.SGD(groups, lr=lrs[0], momentum=momentum,
                          weight_decay=base_wd)
    for step, lr_t in enumerate(lrs):
        for g in groups:
            g["lr"] = lr_t * g["base_lr"]
        opt.zero_grad()
        for k in specs:
            tparams[k].grad = torch.from_numpy(grads_per_step[step][k].copy())
        opt.step()

    # ours
    policy = {k: ParamPolicy(lr_mult=s[1], wd_mult=s[2], trainable=True)
              for k, s in specs.items()}
    params = {k: jnp.asarray(v) for k, v in init.items()}
    velocity = {k: jnp.zeros_like(v) for k, v in params.items()}
    for step, lr_t in enumerate(lrs):
        g = {k: jnp.asarray(v) for k, v in grads_per_step[step].items()}
        params, velocity = sgd_momentum_update(
            params, g, velocity, policy, jnp.float32(lr_t),
            momentum=momentum, l2_factor=base_wd)

    for k in specs:
        np.testing.assert_allclose(np.asarray(params[k]),
                                   tparams[k].detach().numpy(),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_ema_warmup_matches_reference_class():
    """Trajectory parity of ops/ema.py against the reference's actual
    ExponentialMovingAverage (model/EMA.py:16-57): warmup decay
    min(decay, (1+t)/(10+t)) starting at t=0, shadow over trainable
    params only, apply() semantics."""
    import sys
    import torch
    import jax.numpy as jnp
    from ppyolo_tpu.ops.ema import ema_update, ema_apply

    sys.path.append("/root/reference")
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "model" or k.startswith("model.")}
    try:
        from model.EMA import ExponentialMovingAverage
        torch.Tensor.cuda = lambda self, *a, **k: self

        net = torch.nn.Linear(4, 3)
        net.bias.requires_grad = False          # frozen leaf: not shadowed
        ref_ema = ExponentialMovingAverage(net, 0.9998)
        ref_ema.register()

        rng = np.random.RandomState(0)
        shadow = {"weight": jnp.asarray(net.weight.detach().numpy().copy())}
        frozen_bias = net.bias.detach().numpy().copy()
        for t in range(6):
            with torch.no_grad():
                net.weight += torch.from_numpy(
                    rng.randn(3, 4).astype(np.float32) * 0.1)
            ref_ema.update()
            shadow = ema_update(
                shadow, {"weight": jnp.asarray(net.weight.detach().numpy())},
                jnp.int32(t), 0.9998)
            np.testing.assert_allclose(np.asarray(shadow["weight"]),
                                       ref_ema._shadow["weight"], rtol=1e-6)
        # apply(): trainable leaves from the shadow, frozen stay current
        ref_ema.apply()
        merged = ema_apply({"weight": jnp.asarray(np.zeros((3, 4), np.float32)),
                            "bias": jnp.asarray(frozen_bias)}, shadow)
        np.testing.assert_allclose(np.asarray(merged["weight"]),
                                   net.weight.detach().numpy(), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(merged["bias"]), frozen_bias)
    finally:
        while "/root/reference" in sys.path:
            sys.path.remove("/root/reference")
        for k in list(sys.modules):
            if k == "model" or k.startswith("model."):
                sys.modules.pop(k)
        sys.modules.update(saved)


def test_lr_schedule_matches_reference_calc_lr():
    """make_lr_fn vs the reference's calc_lr (train.py:172-188) across
    warmup boundary, plateaus, and both milestones."""
    import sys
    import types
    from ppyolo_tpu.train.lr_schedule import make_lr_fn

    lr_cfg = dict(base_lr=0.000125,
                  PiecewiseDecay=dict(gamma=0.1, milestones=[400, 450]),
                  LinearWarmup=dict(start_factor=0.0, steps=40))

    # import the reference's ACTUAL train.py (module-level deps: stub
    # pycocotools, purge colliding module names — our repo-root train.py
    # would otherwise win the sys.path race)
    purge = lambda: {k: sys.modules.pop(k) for k in list(sys.modules)
                     if k in ("train", "config") or k.startswith("config.")
                     or k == "tools" or k.startswith("tools.")
                     or k == "model" or k.startswith("model.")
                     or k == "pycocotools" or k.startswith("pycocotools.")}
    saved = purge()
    fake_pc = types.ModuleType("pycocotools")
    fake_coco = types.ModuleType("pycocotools.coco")
    fake_coco.COCO = object
    fake_eval = types.ModuleType("pycocotools.cocoeval")
    fake_eval.COCOeval = object
    fake_pc.coco, fake_pc.cocoeval = fake_coco, fake_eval
    sys.modules.update({"pycocotools": fake_pc, "pycocotools.coco": fake_coco,
                        "pycocotools.cocoeval": fake_eval})
    sys.path.insert(0, "/root/reference")
    try:
        import train as ref_train

        cfg = types.SimpleNamespace(learningRate=lr_cfg)
        fn = make_lr_fn(lr_cfg)
        for it in [0, 1, 20, 39, 40, 41, 100, 399, 400, 401, 449, 450, 451,
                   9999]:
            np.testing.assert_allclose(float(np.asarray(fn(it))),
                                       ref_train.calc_lr(it, cfg),
                                       rtol=1e-6, err_msg=f"iter {it}")
    finally:
        while "/root/reference" in sys.path:
            sys.path.remove("/root/reference")
        purge()
        sys.modules.update(saved)
