#! /usr/bin/env python
"""Probe: per-leaf vs grouped-flat SGD+EMA update (train-step epilogue).

bench_train --ablate attributes ~3.4 ms/step of the frozen-b16 train step to
SGD/EMA/BN-merge, at ~320 GB/s effective — well under the v5e's ~819 GB/s,
suggesting per-leaf kernel overhead (the trainable head is ~100 small-ish
leaves; each leaf becomes its own fused multiply-add chain).  This probe
times, over the REAL ppyolo_2x trainable subset on device:

  per-leaf : sgd_momentum_update + ema_update as the train step runs today
  flat     : leaves grouped by (lr_mult, wd_mult), each group concatenated
             into ONE 1-D buffer, one fused update per group (elementwise
             math identical -> bitwise-equal results), then sliced back

Both are scanned in-graph over distinct grads so the tunnel dispatch cost
cancels and loop-invariant code motion cannot hoist the update.

Usage: python tools/probe_optstep.py [--iters 200] [--freeze 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grouped_flat_update(trainable, grads, velocity, ema, policy, lr_t, step,
                        *, momentum, l2_factor, ema_decay):
    """Bitwise-equivalent grouped-flat SGD+EMA (see module docstring)."""
    import jax.numpy as jnp

    groups = {}
    for k in trainable:
        pol = policy[k]
        groups.setdefault((pol.lr_mult, pol.wd_mult), []).append(k)
    d = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
    new_p, new_v, new_e = {}, {}, {}
    for (lr_mult, wd_mult), keys in groups.items():
        sizes = [int(np.prod(trainable[k].shape)) for k in keys]
        p = jnp.concatenate([trainable[k].reshape(-1) for k in keys])
        g = jnp.concatenate([grads[k].reshape(-1) for k in keys])
        v = jnp.concatenate([velocity[k].reshape(-1) for k in keys])
        e = jnp.concatenate([ema[k].reshape(-1) for k in keys])
        g = g + wd_mult * l2_factor * p
        v = momentum * v + g
        p = p - lr_t * lr_mult * v
        e = d * e + (1.0 - d) * p
        off = 0
        for k, sz in zip(keys, sizes):
            sl = slice(off, off + sz)
            shp = trainable[k].shape
            new_p[k] = p[sl].reshape(shp)
            new_v[k] = v[sl].reshape(shp)
            new_e[k] = e[sl].reshape(shp)
            off += sz
    return new_p, new_v, new_e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--freeze", type=int, default=5)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from configs import PPYOLO_2x_Config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train.train_step import split_trainable
    from ppyolo_tpu.train.optimizer import sgd_momentum_update
    from ppyolo_tpu.ops.ema import ema_update

    cfg = PPYOLO_2x_Config()
    cfg.backbone = dict(cfg.backbone, freeze_at=a.freeze)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    flat_policy = model.flat_policy()
    trainable, _ = split_trainable(params, flat_policy)
    pol_sub = {k: flat_policy[k] for k in trainable}
    nbytes = sum(int(np.prod(v.shape)) * 4 for v in trainable.values())
    print(f"trainable leaves: {len(trainable)}, {nbytes / 1e6:.1f} MB fp32")
    groups = {}
    for k, p in pol_sub.items():
        groups.setdefault((p.lr_mult, p.wd_mult), []).append(k)
    print(f"(lr_mult, wd_mult) groups: { {g: len(ks) for g, ks in groups.items()} }")

    velocity = {k: jnp.zeros_like(v) for k, v in trainable.items()}
    ema = {k: jnp.array(v, copy=True) for k, v in trainable.items()}
    key = jax.random.PRNGKey(1)
    # distinct grads per scanned iteration: one rng leaf scaled per step
    base_g = {k: 0.01 * jax.random.normal(key, v.shape, v.dtype)
              for k, v in trainable.items()}
    lr_t = jnp.float32(1e-3)
    mom, l2, edecay = 0.9, 0.0005, 0.9998

    def perleaf_loop(p, v, e, scales):
        def body(carry, s):
            p, v, e, step = carry
            g = {k: gv * s for k, gv in base_g.items()}
            p, v = sgd_momentum_update(p, g, v, pol_sub, lr_t,
                                       momentum=mom, l2_factor=l2)
            e = ema_update(e, p, step, edecay)
            return (p, v, e, step + 1), s
        (p, v, e, _), _ = jax.lax.scan(
            body, (p, v, e, jnp.int32(0)), scales)
        return p, v, e

    def flat_loop(p, v, e, scales):
        def body(carry, s):
            p, v, e, step = carry
            g = {k: gv * s for k, gv in base_g.items()}
            p, v, e = grouped_flat_update(p, g, v, e, pol_sub, lr_t, step,
                                          momentum=mom, l2_factor=l2,
                                          ema_decay=edecay)
            return (p, v, e, step + 1), s
        (p, v, e, _), _ = jax.lax.scan(
            body, (p, v, e, jnp.int32(0)), scales)
        return p, v, e

    scales = jnp.linspace(0.5, 1.5, a.iters, dtype=jnp.float32)

    results = {}
    for name, fn in [("per-leaf", perleaf_loop), ("grouped-flat", flat_loop)]:
        jf = jax.jit(fn)
        out = jf(trainable, velocity, ema, scales)
        np.asarray(jax.tree.leaves(out)[0])  # sync through the tunnel
        t0 = time.time()
        out = jf(trainable, velocity, ema, scales)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.time() - t0) / a.iters * 1e3
        results[name] = (dt, out)
        print(f"{name:13s}: {dt:.3f} ms/step "
              f"({nbytes * 7 / (dt / 1e3) / 1e9:.0f} GB/s effective)")

    # bitwise equivalence of the two formulations
    pa, va, ea = results["per-leaf"][1]
    pb, vb, eb = results["grouped-flat"][1]
    for k in pa:
        for x, y in ((pa[k], pb[k]), (va[k], vb[k]), (ea[k], eb[k])):
            assert np.array_equal(np.asarray(x), np.asarray(y)), k
    print("bitwise equal: True")


if __name__ == "__main__":
    main()
