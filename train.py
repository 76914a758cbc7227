#! /usr/bin/env python
"""PP-YOLO training entry point (reference train.py re-built TPU-first).

python train.py --config=0

Differences from the reference hot loop (train.py:395-504):
  * forward/loss/grads/SGD/EMA/BN-stats are ONE jitted XLA program
  * multi-device: set --ndev>1 to shard the batch over a device mesh with
    psum'd gradients and real sync-BN (the reference has no multi-card path)
  * checkpoints carry optimizer momentum + EMA + step (the reference loses
    them on resume)
"""
import argparse
import json
import logging
import os
import sys
import time
from collections import deque

import numpy as np
from tools.argparser import str2bool

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s-%(levelname)s: %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S")
logger = logging.getLogger(__name__)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--use_gpu", type=str2bool, default=True)
    p.add_argument("--ndev", type=int, default=0,
                   help="devices for data-parallel training (0 = all)")
    p.add_argument("--precision", type=str, default="fp32",
                   choices=["fp32", "bf16"],
                   help="bf16 = mixed-precision forward (fp32 masters)")
    p.add_argument("--scan_steps", type=int, default=1,
                   help=">1 fuses that many train steps into one lax.scan "
                        "dispatch (amortizes host dispatch latency)")
    args = p.parse_args()
    if not args.use_gpu:  # reference --use_gpu=0 semantics: run on host CPU
        import jax
        jax.config.update("jax_platforms", "cpu")
    from configs import get_config

    cfg = get_config(args.config)
    cfg.train_cfg["precision"] = args.precision
    cfg.train_cfg["scan_steps"] = args.scan_steps
    run_training(cfg, ndev=args.ndev)


def run_training(cfg, *, ndev: int = 0, weights_dir: str = "./weights"):
    import jax
    import jax.numpy as jnp
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train import make_train_step, init_train_state
    from ppyolo_tpu.ops.ema import ema_apply
    from ppyolo_tpu.train.train_step import make_multi_train_step
    from ppyolo_tpu.checkpoint import (load_params_npz, save_params_npz,
                                       save_train_state, load_train_state,
                                       AsyncCheckpointer,
                                       resume_step_from_filename,
                                       gc_checkpoints)
    from ppyolo_tpu.data import (CocoJson, category_maps, data_clean,
                                 train_batches, Prefetcher, DevicePrefetcher)
    from ppyolo_tpu.parallel import (make_mesh, shard_train_step,
                                     shard_multi_train_step, put_replicated,
                                     put_batch, put_scan_batch)
    from ppyolo_tpu.eval import Detector, coco_eval

    tc = cfg.train_cfg

    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # weight load + iter resume (reference train.py:255-261)
    start_iter = 0
    model_path = tc.get("model_path")
    if model_path and os.path.exists(model_path):
        if model_path.endswith(".pt"):
            from ppyolo_tpu.checkpoint import (load_torch_state_dict,
                                               convert_torch_state_dict)
            params = convert_torch_state_dict(
                load_torch_state_dict(model_path), params)
        else:
            params = load_params_npz(model_path, params)
        step = resume_step_from_filename(model_path)
        if step:
            start_iter = step
        logger.info("loaded %s (resume iter %d)", model_path, start_iter)

    state = init_train_state(model, params, cfg)
    state = state._replace(step=jnp.asarray(start_iter, jnp.int32))

    # full-state resume (params + momentum + EMA + step — the reference can
    # only resume params, silently losing optimizer state; SURVEY.md §5)
    resume_state = tc.get("resume_state")
    if resume_state and os.path.exists(resume_state):
        state = load_train_state(resume_state, state)
        logger.info("resumed full train state from %s (step %d)",
                    resume_state, int(np.asarray(state.step)))

    os.makedirs(weights_dir, exist_ok=True)

    ndev = ndev or len(jax.devices())
    use_mesh = ndev > 1
    compute_dtype = (jnp.bfloat16 if tc.get("precision") == "bf16"
                     else jnp.float32)
    if use_mesh:
        mesh = make_mesh(ndev)
        step_fn = shard_train_step(
            make_train_step(model, cfg, axis_name="data",
                            compute_dtype=compute_dtype), mesh)
        state = put_replicated(state, mesh)
        logger.info("data-parallel over %d devices", ndev)
    else:
        # donate the state: old param/velocity/EMA buffers are reused in-place
        step_fn = jax.jit(make_train_step(model, cfg, compute_dtype=compute_dtype),
                          donate_argnums=(0,))
    scan_steps = int(tc.get("scan_steps", 1))
    if scan_steps > 1:
        multi = make_multi_train_step(
            model, cfg, n_steps=scan_steps, compute_dtype=compute_dtype,
            axis_name="data" if use_mesh else None)
        if use_mesh:
            multi_fn = shard_multi_train_step(multi, mesh, donate=True)
        else:
            multi_fn = jax.jit(multi, donate_argnums=(0,))

    # optional orbax backend (cfg.train_cfg['ckpt_backend']='orbax'):
    # cross-host-coordinated atomic commits for multi-host runs; every
    # process participates in save/restore (checkpoint/orbax_io.py).
    # Restore AFTER put_replicated so the target tree carries the mesh
    # sharding — a host-local target would need cross-host device
    # transfers to satisfy (proven by tests/test_multihost.py's 2-process
    # orbax test).
    orbax_ckpt = None
    if tc.get("ckpt_backend", "npz") == "orbax":
        from ppyolo_tpu.checkpoint.orbax_io import OrbaxCheckpointer

        orbax_ckpt = OrbaxCheckpointer(os.path.join(weights_dir, "orbax"),
                                       keep=10)
        if orbax_ckpt.latest_step() is not None:
            state = orbax_ckpt.restore(state)
            logger.info("orbax resume from step %d",
                        int(np.asarray(state.step)))

    # every resume path must also restart the data pipeline (shuffle order,
    # multi-scale shape schedule) and LR from the restored step — resuming
    # state.step alone would replay the epoch-0 data sequence
    start_iter = max(start_iter, int(np.asarray(state.step)))

    # multi-host: each process reads a disjoint record shard and contributes
    # its local slice of the global batch; checkpoints/eval run on process 0
    n_hosts = jax.process_count()
    host_id = jax.process_index()
    is_main = host_id == 0

    # dataset
    coco = CocoJson(cfg.train_path)
    catid2clsid, clsid2catid, class_names = category_maps(coco)
    records = data_clean(coco, coco.get_img_ids(), catid2clsid,
                         cfg.train_pre_path)
    logger.info("%d samples in train set.", len(records))
    if n_hosts > 1:
        logger.info("host %d/%d reads %d-record shard", host_id, n_hosts,
                    len(records[host_id::n_hosts]))

    batches = Prefetcher(
        train_batches(records, cfg, seed=0, start_iter=start_iter,
                      shape_group=scan_steps, num_shards=n_hosts,
                      shard_id=host_id),
        max_batch=max(tc.get("max_batch", 3), scan_steps))

    metrics_path = os.path.join(weights_dir, "metrics.jsonl")
    ckpt = AsyncCheckpointer()
    best_ap = -1.0
    eval_det = None  # reused across periodic evals (set_params avoids retrace)
    time_q = deque(maxlen=20)
    rng = jax.random.PRNGKey(1)

    def to_device_batch(batch):
        keys = ("image", "gt_bbox", "gt_class", "gt_score", "targets")
        return {k: batch[k] for k in keys if k in batch}

    def host_units():
        """Dispatch units: one batch, or scan_steps batches stacked."""
        batch_iter = iter(batches)
        while True:
            if scan_steps > 1:
                group = [to_device_batch(next(batch_iter))
                         for _ in range(scan_steps)]
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
                yield stacked, sum(g["image"].shape[0] for g in group)
            else:
                b = next(batch_iter)
                yield to_device_batch(b), b["image"].shape[0]

    def transfer(unit):
        data, nimg = unit
        if use_mesh:
            data = (put_scan_batch(data, mesh) if scan_steps > 1
                    else put_batch(data, mesh))
        else:
            data = jax.device_put(data)
        return data, nimg

    # double-buffer: batch N+1's H2D overlaps step N's compute
    unit_iter = DevicePrefetcher(host_units(), transfer)
    it = int(np.asarray(state.step))  # one sync at start; tracked on host

    # MFU accounting (reference logs only imgs/s): XLA cost analysis of the
    # dispatched program, lazily per input shape (tracing only, no compile)
    from ppyolo_tpu.utils.mfu import program_flops, mfu as mfu_frac
    flops_by_shape = {}

    def unit_flops(device_batch, sub):
        shp = tuple(device_batch["image"].shape)
        if shp not in flops_by_shape:
            fn = multi_fn if scan_steps > 1 else step_fn
            f = program_flops(fn, state, device_batch, sub)
            # XLA cost analysis counts a while/scan body ONCE (trip count is
            # not folded in — verified on the v5e backend: scan-16 program
            # reports ~= the single step's flops), so scale by scan_steps
            flops_by_shape[shp] = f * scan_steps if f else f
        return flops_by_shape[shp]

    # in-process shape warmup (r4 VERDICT #6): execute one dummy step per
    # size bucket through the SAME jit objects the loop dispatches, so the
    # first real step of every bucket is a pure execute.  The external
    # tools/warmup_shapes.py only fills the PERSISTENT compile cache — a
    # separate jit object still pays trace + executable load (measured
    # 33-55 s/bucket on this runtime, r4 soak) on its own first call per
    # shape.  The dummy state copy eats the donation; results are discarded.
    if tc.get("warmup_shapes") and getattr(cfg, "randomShape", None):
        from tools.warmup_shapes import dummy_batch

        for size in sorted(set(cfg.randomShape["sizes"])):
            t0 = time.time()
            dummy = dummy_batch(cfg, int(size), tc["batch_size"], scan_steps)
            unit, _ = transfer((to_device_batch(dummy), 0))
            st_w = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
            rng, sub = jax.random.split(rng)
            if scan_steps > 1:
                _, wl = multi_fn(st_w, unit, sub)
            else:
                _, wl = step_fn(st_w, unit, sub)
            np.asarray(wl["total_loss"])  # sync through the tunnel
            unit_flops(unit, sub)  # pre-trace the per-shape cost analysis
            dt_w = time.time() - t0
            logger.info("warmup %dx%d: %.1fs", size, size, dt_w)
            if is_main:
                with open(metrics_path, "a") as mf:
                    mf.write(json.dumps({"warmup_size": int(size),
                                         "secs": round(dt_w, 2),
                                         "time": time.time()}) + "\n")

    # 1 = log every step (soak runs); <= 0 disables per-step logging
    log_every = int(tc.get("log_iter", 20))
    while True:
        t0 = time.time()
        rng, sub = jax.random.split(rng)
        device_batch, nimg = next(unit_iter)
        will_log = (log_every > 0
                    and (it + scan_steps) % log_every < scan_steps)
        flops = unit_flops(device_batch, sub) if will_log else None
        if scan_steps > 1:
            state, losses = multi_fn(state, device_batch, sub)
            losses = {k: v[-1] for k, v in losses.items()}
        else:
            state, losses = step_fn(state, device_batch, sub)
        it += scan_steps

        if will_log:
            losses = {k: float(np.asarray(v)) for k, v in losses.items()}
            time_q.append(time.time() - t0)
            unit_s = sum(time_q) / len(time_q)
            spd = nimg / unit_s
            msg = ", ".join(f"{k}={float(v):.3f}" for k, v in losses.items())
            eta_s = (tc["max_iters"] - it) * unit_s / scan_steps
            u = mfu_frac(flops, unit_s, n_chips=ndev)
            perf = ""
            if flops:
                perf = f", {flops / unit_s / 1e12:.2f} TFLOP/s"
                if u is not None:
                    perf += f" (mfu {u:.1%})"
            logger.info("iter %d, %s, %.1f imgs/s%s, eta %.1fh",
                        it, msg, spd, perf, eta_s / 3600)
            if is_main:
                # persistent loss curves (the reference logs to stdout only)
                with open(metrics_path, "a") as mf:
                    mf.write(json.dumps({
                        "iter": it, "time": time.time(), **losses,
                        # [H, W] of the NHWC batch (buckets are square
                        # today, but don't assume it in the log)
                        "size": [int(device_batch["image"].shape[1]),
                                 int(device_batch["image"].shape[2])],
                        "step_s": round(time.time() - t0, 4),
                        "imgs_per_sec": round(spd, 2),
                        "tflops": (round(flops / unit_s / 1e12, 3)
                                   if flops else None),
                        "mfu": round(u, 4) if u is not None else None,
                    }) + "\n")

        if it % tc["save_iter"] < scan_steps and it >= tc["save_iter"]:
            if orbax_ckpt is not None:
                # every process participates (orbax coordinates the commit)
                orbax_ckpt.save(it, state)
                if is_main:
                    logger.info("orbax checkpoint at step %d", it)
            if is_main:
                eval_params = (ema_apply(state.params, state.ema)
                               if state.ema is not None else state.params)
                # async: device->host fetch here, npz encode + write off-loop
                ckpt.save_params(
                    os.path.join(weights_dir, f"step{it:08d}.npz"),
                    eval_params)
                ckpt.save_state(os.path.join(weights_dir, "last_state.npz"),
                                state)
                ckpt.wait()  # GC must see the finished file
                gc_checkpoints(weights_dir, keep=10)
                logger.info("saved %s/step%08d.npz", weights_dir, it)

        if (is_main and it % tc["eval_iter"] < scan_steps
                and it >= tc["eval_iter"] and os.path.exists(cfg.val_path)):
            eval_params = (ema_apply(state.params, state.ema)
                           if state.ema is not None else state.params)
            if eval_det is None:
                # reuse the training mesh for data-parallel eval when the
                # mesh is process-local (multi-host meshes would need every
                # process in the jit, but eval is gated to process 0) and the
                # eval batch divides over it
                eval_mesh = (mesh if use_mesh and jax.process_count() == 1
                             and cfg.eval_cfg["eval_batch_size"] % ndev == 0
                             else None)
                eval_det = Detector(model, eval_params, cfg,
                                    target_size=cfg.eval_cfg["target_size"],
                                    mesh=eval_mesh)
            else:
                eval_det.set_params(eval_params)
            det = eval_det
            val = CocoJson(cfg.val_path)
            images = [im for im in val.dataset["images"]
                      if val.img_anns.get(im["id"])]
            # this call is gated to process 0, so the collective multi-host
            # shard/barrier protocol must be off (it would deadlock)
            stats = coco_eval(det, images, cfg.val_pre_path, cfg.val_path,
                              cfg.eval_cfg["eval_batch_size"],
                              distributed=False)
            ap = float(stats[0]) if stats is not None else -1
            logger.info("box ap: %.4f (best %.4f)", ap, best_ap)
            with open(metrics_path, "a") as mf:
                mf.write(json.dumps({"iter": it, "time": time.time(),
                                     "box_ap": ap}) + "\n")
            if ap > best_ap:
                best_ap = ap
                ckpt.save_params(os.path.join(weights_dir, "best_model.npz"),
                                 eval_params)

        if it >= tc["max_iters"]:
            ckpt.wait()
            if orbax_ckpt is not None:
                orbax_ckpt.wait()
            logger.info("done at iter %d", it)
            return state


if __name__ == "__main__":
    main()
