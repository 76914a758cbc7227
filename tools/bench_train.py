#! /usr/bin/env python
"""Reproducible train-step benchmark for ppyolo_2x @608 on one TPU chip.

Reports two numbers (the host loader is excluded from both — this container
has ONE host core, so loader throughput measures the container, not the
framework; production hosts feed from many cores):

  device   ms/step with the batch resident on device (lax.scan over the
           jitted step; pure compute+optimizer time)
  replay   ms/step including the H2D transfer and per-dispatch latency:
           pre-built host batches are replayed through the DevicePrefetcher
           (double-buffered uint8 H2D, as train.py runs) into scanned
           multi-step dispatches

Also prints achieved TFLOP/s and MFU from XLA cost analysis (scan body
counted once by XLA; scaled by scan_steps).

Usage: python tools/bench_train.py [--batch 16] [--scan 8] [--iters 48]
       [--freeze 5] [--precision bf16] [--size 608]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--freeze", type=int, default=5)
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--host_targets", action="store_true",
                    help="ship host-built target tensors (old transport)")
    ap.add_argument("--profile", action="store_true",
                    help="device-trace one scanned dispatch and print the "
                         "hot-op + per-conv utilization tables (round-2 "
                         "VERDICT #8: attribute the non-MXU train time). "
                         "CAUTION: tracing the TRAIN program crashes this "
                         "relay runtime's worker (3/3 attempts r3, both "
                         "scan-8 and scan-48, while inference programs "
                         "trace fine) — prefer --ablate here")
    ap.add_argument("--ablate", action="store_true",
                    help="time nested sub-programs (fwd / fwd+loss / "
                         "fwd+loss+grad / full step) to attribute the "
                         "step time without the device tracer")
    ap.add_argument("--trace_dir", default="/tmp/ppyolo_train_trace")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from configs import PPYOLO_2x_Config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train import make_train_step, init_train_state
    from ppyolo_tpu.train.train_step import make_multi_train_step
    from ppyolo_tpu.data.loader import DevicePrefetcher
    from ppyolo_tpu.data.targets import gt2yolo_targets
    from ppyolo_tpu.utils.mfu import program_flops, mfu as mfu_frac

    cfg = PPYOLO_2x_Config()
    cfg.backbone = dict(cfg.backbone, freeze_at=a.freeze)
    cfg.randomShape = dict(sizes=[a.size], random_inter=False)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=a.batch)

    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    dt = jnp.bfloat16 if a.precision == "bf16" else jnp.float32

    # one synthetic host batch through the real target assigner (uint8
    # transport, as the loader ships since device_normalize)
    r = np.random.RandomState(0)
    m = 50
    gt_bbox = np.zeros((a.batch, m, 4), np.float32)
    gt_bbox[:, :8, 0:2] = r.uniform(0.2, 0.8, (a.batch, 8, 2))
    gt_bbox[:, :8, 2:4] = r.uniform(0.05, 0.4, (a.batch, 8, 2))
    gt_class = r.randint(0, cfg.num_classes, (a.batch, m))
    gt_score = np.zeros((a.batch, m), np.float32)
    gt_score[:, :8] = 1.0
    if a.host_targets:
        tcfg = cfg.gt2YoloTarget
        targets = gt2yolo_targets(
            gt_bbox, gt_class, gt_score, (a.size, a.size), tcfg["anchors"],
            tcfg["anchor_masks"], tcfg["downsample_ratios"],
            tcfg["num_classes"])
        extra = {"targets": tuple(targets)}
    else:  # the default transport: targets built on device from these
        extra = {"gt_class": gt_class.astype(np.int32),
                 "gt_score": gt_score}
    host_batch = {
        "image": r.randint(0, 256, (a.batch, a.size, a.size, 3)).astype(np.uint8),
        "gt_bbox": gt_bbox,
        **extra,
    }

    print(f"backend={jax.default_backend()} batch={a.batch}@{a.size} "
          f"freeze={a.freeze} prec={a.precision} scan={a.scan}")

    # ---- device-only: batch resident, scan over steps -----------------------
    # The scan feeds DISTINCT per-iteration batch tensors (xs), as real
    # training does.  A loop-INVARIANT closed-over batch reads ~21% faster
    # here, but only because XLA's while-loop invariant code motion hoists
    # the rng-independent part of the frozen backbone out of the loop
    # (measured r3: 39.3 vs 49.8 ms/step b16@608 — the r2 numbers were
    # taken the invariant way and overstated MFU accordingly).
    step = make_train_step(model, cfg, compute_dtype=dt)
    dev_batches = jax.device_put(
        {k: np.stack([host_batch[k]] * a.iters) for k in host_batch
         if not isinstance(host_batch[k], tuple)})
    if "targets" in host_batch:
        dev_batches["targets"] = tuple(
            jax.device_put(np.stack([t] * a.iters))
            for t in host_batch["targets"])

    @jax.jit
    def run_dev(state, batches, key):
        keys = jax.random.split(key, a.iters)

        def body(st, xs):
            bt, sub = xs
            st, losses = step(st, bt, sub)
            return st, losses["total_loss"]

        return jax.lax.scan(body, state, (batches, keys))

    s2, trace = run_dev(state, dev_batches, jax.random.PRNGKey(1))
    np.asarray(trace)
    t0 = time.time()
    _, trace = run_dev(state, dev_batches, jax.random.PRNGKey(1))
    trace = np.asarray(trace)
    dev_ms = (time.time() - t0) / a.iters * 1e3
    assert np.isfinite(trace).all(), "non-finite loss in device run"
    print(f"device   {dev_ms:7.2f} ms/step  {a.batch / dev_ms * 1e3:7.1f} img/s")

    # ---- replay: H2D + dispatch included, loader excluded -------------------
    multi = jax.jit(
        make_multi_train_step(model, cfg, n_steps=a.scan, compute_dtype=dt),
        donate_argnums=(0,))
    stacked = {k: (tuple(np.stack([t] * a.scan) for t in v)
                   if isinstance(v, tuple) else np.stack([v] * a.scan))
               for k, v in host_batch.items()}
    n_disp = max(a.iters // a.scan, 2)

    def units():
        for _ in range(n_disp + 1):
            yield stacked

    # explicit copy: device_put of already-on-device arrays aliases, and
    # `multi` donates its state arg — donating an alias would delete the
    # buffers `state` (used later by --ablate) still references
    state_r = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    it = DevicePrefetcher(units())
    first = next(it)
    state_r, losses = multi(state_r, first, jax.random.PRNGKey(2))
    np.asarray(losses["total_loss"])  # compile + sync
    t0 = time.time()
    for unit in it:
        state_r, losses = multi(state_r, unit, jax.random.PRNGKey(3))
    lt = np.asarray(losses["total_loss"])
    replay_ms = (time.time() - t0) / (n_disp * a.scan) * 1e3
    assert np.isfinite(lt).all(), "non-finite loss in replay run"
    unit_mb = sum(np.asarray(v).nbytes for v in jax.tree.leaves(stacked)) / 1e6
    print(f"replay   {replay_ms:7.2f} ms/step  {a.batch / replay_ms * 1e3:7.1f} img/s "
          f"(H2D {unit_mb:.0f} MB/dispatch of {a.scan} steps)")

    try:
        # XLA cost analysis counts the scan body once -> this IS per-step
        fl = program_flops(multi, state_r, first, jax.random.PRNGKey(3))
        tfs = fl / (dev_ms / 1e3) / 1e12
        print(f"XLA cost {fl / 1e12:.2f} TFLOP/step -> device {tfs:.1f} TFLOP/s "
              f"= {mfu_frac(fl, dev_ms / 1e3):.1%} MFU (bf16 peak 197T)")
    except Exception as e:  # noqa: BLE001
        print("cost analysis unavailable:", e)

    if a.ablate and a.host_targets:
        raise SystemExit("--ablate requires the device-target transport")
    if a.ablate:
        # Attribute the step time WITHOUT the device tracer (which crashes
        # this relay on train programs): time nested sub-programs, each a
        # lax.scan over DISTINCT per-iteration batches so XLA's while-loop
        # invariant code motion cannot hoist work out of the loop (the
        # run_dev device number above is also printed for comparison —
        # both now scan over xs, so they should agree).
        from ppyolo_tpu.train.train_step import build_loss, split_trainable
        from ppyolo_tpu.train.losses import total_loss as total_loss_fn
        from ppyolo_tpu.ops.module import Ctx, unflatten_tree
        from ppyolo_tpu.data.targets import gt2yolo_targets_device

        loss_obj = build_loss(cfg)
        flat_policy = model.flat_policy()
        tcfg = cfg.gt2YoloTarget
        mask_anchors = model.head.mask_anchors
        ncls = cfg.head["num_classes"]

        def cast_params(flat):
            if dt == jnp.float32:
                return flat
            return {k: (v.astype(dt) if v.dtype == jnp.float32 and
                        not k.endswith(("running_mean", "running_var"))
                        else v) for k, v in flat.items()}

        def build_tg(batch):
            h, w = batch["image"].shape[1:3]
            return gt2yolo_targets_device(
                batch["gt_bbox"], batch["gt_class"], batch["gt_score"],
                (h, w), tcfg["anchors"], tcfg["anchor_masks"],
                tcfg["downsample_ratios"], tcfg["num_classes"],
                iou_thresh=tcfg.get("iou_thresh", 1.0))

        def prep(raw):
            x = raw.astype(jnp.float32) / 255.0
            mean = jnp.asarray(cfg.normalizeImage["mean"], jnp.float32)
            std = jnp.asarray(cfg.normalizeImage["std"], jnp.float32)
            return ((x - mean) / std).astype(dt)

        trainable0, frozen0 = split_trainable(state.params, flat_policy)

        def fwd_loss(trainable, frozen, batch, key, *, with_loss):
            merged = cast_params({**trainable, **frozen})
            params = unflatten_tree(merged)
            ctx = Ctx(train=True, rng=key, updates={})
            outs = model.outputs(params, prep(batch["image"]), ctx)
            if not with_loss:
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            losses = loss_obj(outs, list(build_tg(batch)), batch["gt_bbox"],
                              mask_anchors, ncls)
            return total_loss_fn(losses)

        stages = {
            "targets only": lambda tr, fz, b, k: sum(
                jnp.sum(t.astype(jnp.float32)) for t in build_tg(b)),
            "fwd": lambda tr, fz, b, k: fwd_loss(tr, fz, b, k,
                                                 with_loss=False),
            "fwd+loss": lambda tr, fz, b, k: fwd_loss(tr, fz, b, k,
                                                      with_loss=True),
            "fwd+loss+grad": lambda tr, fz, b, k: (
                (lambda vg: vg[0] + sum(
                    jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(vg[1])))(
                    jax.value_and_grad(
                        lambda t: fwd_loss(t, fz, b, k, with_loss=True))(tr))),
            "full step (xs)": None,  # handled below via `step`
        }

        n_ab = a.scan
        stacked_ab = jax.device_put(
            {k: np.stack([host_batch[k]] * n_ab) for k in
             ("image", "gt_bbox", "gt_class", "gt_score")})
        print(f"\nablation (scan-{n_ab} over distinct device batches, "
              "ms/step):")
        prev = 0.0
        for name, fn in stages.items():
            if fn is not None:
                def scanned(tr, fz, batches, key, fn=fn):
                    keys = jax.random.split(key, n_ab)
                    def body(c, xs):
                        bt, kk = xs
                        return c + fn(tr, fz, bt, kk), None
                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((), jnp.float32), (batches, keys))
                    return acc
                jf = jax.jit(scanned)
                np.asarray(jf(trainable0, frozen0, stacked_ab,
                              jax.random.PRNGKey(7)))
                best = 1e9
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(jf(trainable0, frozen0, stacked_ab,
                                  jax.random.PRNGKey(7)))
                    best = min(best, (time.time() - t0) / n_ab)
            else:
                def full(state, batches, key):
                    keys = jax.random.split(key, n_ab)
                    def body(st, xs):
                        bt, kk = xs
                        st, losses = step(st, bt, kk)
                        return st, losses["total_loss"]
                    return jax.lax.scan(body, state, (batches, keys))
                jf2 = jax.jit(full)
                np.asarray(jf2(state, stacked_ab, jax.random.PRNGKey(7))[1])
                best = 1e9
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(jf2(state, stacked_ab,
                                   jax.random.PRNGKey(7))[1])
                    best = min(best, (time.time() - t0) / n_ab)
            ms = best * 1e3
            print(f"  {name:16s} {ms:8.2f}  (+{ms - prev:.2f})")
            prev = ms
        print(f"  [run_dev device number was {dev_ms:.2f}]")

    if a.profile:
        from ppyolo_tpu.utils.profiling import (trace_op_times,
                                                conv_utilization_table)
        import shutil
        shutil.rmtree(a.trace_dir, ignore_errors=True)
        jax.profiler.start_trace(a.trace_dir)
        try:
            _, trace = run_dev(state, dev_batches, jax.random.PRNGKey(4))
            try:
                np.asarray(trace)
            except Exception as e:  # noqa: BLE001 - relay D2H inside a
                # trace region occasionally faults; the dispatch itself
                # completed, so keep whatever events were captured
                print("sync inside trace region failed (continuing):", e)
                time.sleep(5)
        finally:
            jax.profiler.stop_trace()
        times = trace_op_times(a.trace_dir)
        total_ms = sum(v for k, v in times.items()
                       if not (k.startswith("$") or k.isdigit()))
        print(f"\nhot ops (one scan-{a.iters} device dispatch, "
              f"{total_ms:.1f} ms traced):")
        shown = 0
        for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
            if k.startswith("$") or k.isdigit() or "Function" in k:
                continue
            print(f"  {v:9.2f} ms  {v / max(total_ms, 1e-9):6.1%}  {k}")
            shown += 1
            if shown >= 25:
                break
        peak = 197e12 if a.precision == "bf16" else 49e12
        hlo = (run_dev.lower(state, dev_batches, jax.random.PRNGKey(4))
               .compile().as_text())
        rows, n_hlo = conv_utilization_table(times, hlo, peak=peak,
                                             repeat=a.iters)
        if rows:
            print(f"\nper-conv utilization ({len(rows)}/{n_hlo} convs "
                  f"matched; fwd+bwd, peak {peak / 1e12:.0f} TF):")
            print(f"  {'ms':>9} {'util':>6}  {'GFLOP':>8}  shape")
            for ms, util, fli, shape, key in rows[:25]:
                print(f"  {ms:9.2f} {util:6.1%}  {fli / 1e9:8.1f}  {shape}  ({key})")
        else:
            print("\n(no conv instructions matched trace names)")


if __name__ == "__main__":
    main()
