"""The jitted PP-YOLO train step: forward, loss, grads, SGD, EMA, BN stats —
one XLA program, optionally shard_map'd over a data-parallel mesh.

Replaces the reference's hot loop (train.py:395-504) where loss logging and
EMA each forced a device->host sync every iteration (train.py:428-434,
EMA.py:30-43).  Gradients are computed only w.r.t. trainable leaves
(freeze_at=5 freezes the whole backbone — train.py:264 — so backward stops
at the head), and with a mesh the step runs under shard_map with psum'd
grads and real cross-replica sync-BN.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.module import Ctx, ParamPolicy, flatten_tree, unflatten_tree, merge_updates
from ..ops.ema import ema_update
from .losses import YOLOv3Loss, IouLoss, IouAwareLoss, total_loss
from .lr_schedule import make_lr_fn
from .optimizer import sgd_momentum_update


class TrainState(NamedTuple):
    params: Dict[str, Any]
    velocity: Dict[str, Any]
    ema: Optional[Dict[str, Any]]
    step: jax.Array


def split_trainable(params, flat_policy: Dict[str, ParamPolicy]):
    flat = flatten_tree(params)
    train = {k: v for k, v in flat.items() if flat_policy[k].trainable}
    frozen = {k: v for k, v in flat.items() if not flat_policy[k].trainable}
    return train, frozen


def build_loss(cfg) -> YOLOv3Loss:
    iou_loss = IouLoss(**cfg.iou_loss) if cfg.iou_loss_type else None
    iou_aware_loss = (IouAwareLoss(**cfg.iou_aware_loss)
                      if getattr(cfg, "iou_aware_loss_type", None) else None)
    yl = dict(cfg.yolo_loss)
    yl.pop("use_fine_grained_loss", None)
    return YOLOv3Loss(iou_loss=iou_loss, iou_aware_loss=iou_aware_loss,
                      downsample=cfg.head["downsample"], **yl)


def make_target_builder(cfg):
    """Per-batch on-device Gt2YoloTarget builder closure.

    Targets come from the batch when the host built them, else ON DEVICE
    from the tiny gt arrays (data/targets.py::gt2yolo_targets_device) —
    the host-built [B,gh,gw,an,6+C] tensors are ~24x the image bytes and
    dominated H2D.  The builder is per-image elementwise, so calling it at
    [n*B] (prescan pipelining) is bitwise-identical to n calls at [B]."""
    tcfg = dict(cfg.gt2YoloTarget)

    def batch_targets(batch):
        if "targets" in batch:
            return list(batch["targets"])
        from ..data.targets import gt2yolo_targets_device
        h, w = batch["image"].shape[1:3]
        return gt2yolo_targets_device(
            batch["gt_bbox"], batch["gt_class"], batch["gt_score"], (h, w),
            tcfg["anchors"], tcfg["anchor_masks"], tcfg["downsample_ratios"],
            tcfg["num_classes"], iou_thresh=tcfg.get("iou_thresh", 1.0))

    return batch_targets


def make_train_step(model, cfg, *, axis_name: Optional[str] = None,
                    compute_dtype=jnp.float32, remat: Optional[bool] = None):
    """Returns ``step_fn(state, batch, rng) -> (state, loss_dict)``.

    batch: {'image': [N,H,W,3], 'gt_bbox': [N,50,4] normalized xywh,
            'targets': tuple of per-level [N,S,S,an,6+C]}.
    Jit (or wrap in shard_map + jit) at the call site.

    remat: rematerialize the backbone in the backward pass
    (``jax.checkpoint``) — trades FLOPs for activation memory so larger
    batches/inputs fit HBM.  Defaults to cfg.train_cfg['remat'] (off).
    """
    loss_obj = build_loss(cfg)
    lr_fn = make_lr_fn(cfg.learningRate)
    momentum = cfg.optimizerBuilder["optimizer"]["momentum"]
    l2 = cfg.optimizerBuilder["regularizer"]["factor"]
    flat_policy = model.flat_policy()
    policy_tree = unflatten_tree(dict(flat_policy))
    use_ema = getattr(cfg, "use_ema", False)
    ema_decay = getattr(cfg, "ema_decay", 0.9998)
    num_classes = cfg.head["num_classes"]
    mask_anchors = model.head.mask_anchors
    if remat is None:
        remat = bool(cfg.train_cfg.get("remat", False))
    # device-side normalization: the loader ships uint8 NHWC (4x less H2D
    # through the ~tunnel, no fp32 normalize on the 1-core host) and the
    # step applies (x/255 - mean)/std here, fused by XLA into the stem conv
    norm = getattr(cfg, "normalizeImage", None) or {}
    norm_mean = jnp.asarray(norm.get("mean", (0.0, 0.0, 0.0)), jnp.float32)
    norm_std = jnp.asarray(norm.get("std", (1.0, 1.0, 1.0)), jnp.float32)
    norm_scale = bool(norm.get("is_scale", True))
    permute = getattr(cfg, "permute", None) or {}
    if permute.get("to_bgr", False):
        # reference order is NormalizeImage (RGB constants) -> Permute flip;
        # the loader flips before the uint8 ship, so flip the constants too
        norm_mean = norm_mean[::-1]
        norm_std = norm_std[::-1]

    def prep_images(raw):
        if raw.dtype != jnp.uint8:
            return raw.astype(compute_dtype)   # host-normalized path
        x = raw.astype(jnp.float32)
        if norm_scale:
            x = x * (1.0 / 255.0)
        x = (x - norm_mean) / norm_std
        return x.astype(compute_dtype)

    def forward(params, images, ctx):
        if remat:
            # BN-stat updates must cross the checkpoint boundary as explicit
            # outputs, not closure mutation (leaked-tracer hazard)
            def bb(p, im):
                inner = Ctx(train=ctx.train, rng=ctx.rng, updates={},
                            axis_name=ctx.axis_name)
                feats = model.features(p, im, inner)
                return tuple(feats), inner.updates

            feats, bb_updates = jax.checkpoint(bb)(params, images)
            if ctx.updates is not None:
                ctx.updates.update(bb_updates)
            return model.head.get_outputs(params["head"], list(feats), ctx)
        return model.outputs(params, images, ctx)

    batch_targets = make_target_builder(cfg)

    def loss_fn(trainable_flat, frozen_flat, batch, rng):
        merged = {**trainable_flat, **frozen_flat}
        if compute_dtype != jnp.float32:
            # mixed precision: bf16 forward against fp32 master weights;
            # grads flow through the cast and arrive fp32.  BN running stats
            # stay fp32 — train mode normalizes with (fp32) batch stats and
            # the running-average update must not round through bf16.
            merged = {k: (v.astype(compute_dtype)
                          if v.dtype == jnp.float32
                          and not k.endswith(("running_mean", "running_var"))
                          else v)
                      for k, v in merged.items()}
        params = unflatten_tree(merged)
        updates: Dict[str, jax.Array] = {}
        ctx = Ctx(train=True, rng=rng, updates=updates, axis_name=axis_name)
        images = prep_images(batch["image"])
        outputs = forward(params, images, ctx)
        losses = loss_obj(outputs, list(batch["targets"]), batch["gt_bbox"],
                          mask_anchors, num_classes)
        return total_loss(losses), (losses, updates)

    def step_fn(state: TrainState, batch, rng):
        if "targets" not in batch:
            # build OUTSIDE the grad closure: targets are data, and tracing
            # the dense builder through jax.grad would only bloat the graph
            batch = dict(batch, targets=tuple(batch_targets(batch)))
        trainable, frozen = split_trainable(state.params, flat_policy)
        grad_fn = jax.grad(loss_fn, has_aux=True)
        grads, (losses, bn_updates) = grad_fn(trainable, frozen, batch, rng)
        if axis_name is not None:
            grads = lax.pmean(grads, axis_name)
            losses = lax.pmean(losses, axis_name)
        lr_t = lr_fn(state.step)
        # SGD over the trainable subset (flat dicts are pytrees too)
        flat_pol_sub = {k: flat_policy[k] for k in trainable}
        new_trainable, new_velocity = sgd_momentum_update(
            trainable, grads, state.velocity, flat_pol_sub, lr_t,
            momentum=momentum, l2_factor=l2)
        params = unflatten_tree({**new_trainable, **frozen})
        params = merge_updates(params, bn_updates)
        ema = state.ema
        if use_ema and ema is not None:
            # shadow covers the trainable subset only (flat, like velocity);
            # frozen leaves / BN running stats eval at their current values
            # (reference EMA registers requires_grad params only, EMA.py:24-28)
            ema = ema_update(ema, new_trainable, state.step, ema_decay)
        new_state = TrainState(params, new_velocity, ema, state.step + 1)
        losses = dict(losses)
        losses["total_loss"] = total_loss(
            {k: v for k, v in losses.items() if k != "total_loss"})
        losses["lr"] = lr_t
        return new_state, losses

    return step_fn


def make_multi_train_step(model, cfg, *, n_steps: int,
                          axis_name: Optional[str] = None,
                          compute_dtype=jnp.float32,
                          target_pipeline: Optional[str] = None):
    """Scan ``n_steps`` train steps inside ONE XLA program.

    The host dispatches once per n_steps batches, so per-call dispatch
    latency (meaningful on remote/tunneled TPU runtimes) amortizes away and
    XLA can overlap the tail of one step with the head of the next.

    target_pipeline (default cfg.train_cfg['target_pipeline'], 'step') —
    where the on-device Gt2YoloTarget build runs relative to the scan
    (r4 VERDICT #3 scheduling-overhead attack; bitwise-identical modes,
    tools/probe_target_pipeline.py A/Bs them on the TPU):
      'step'      in the scan body, just before the forward (baseline)
      'prescan'   ONE vectorized [n_steps*B] build before the scan; the
                  scan consumes ready-made target slices as xs.  Costs
                  n_steps x the target memory (~8 MB/img fp32 @608).
      'doublebuf' software pipeline through the carry: step i consumes
                  targets built during step i-1; batch i+1's build sits
                  in the same program as step i so the scheduler may
                  interleave it with the backward/optimizer.

    Returns ``fn(state, batches, rng) -> (state, stacked_losses)`` where
    every leaf of ``batches`` has a leading ``n_steps`` axis.
    """
    step = make_train_step(model, cfg, axis_name=axis_name,
                           compute_dtype=compute_dtype)
    build = make_target_builder(cfg)
    if target_pipeline is None:
        target_pipeline = cfg.train_cfg.get("target_pipeline", "step")
    assert target_pipeline in ("step", "prescan", "doublebuf"), target_pipeline

    def multi(state: TrainState, batches, rng):
        keys = jax.random.split(rng, n_steps)
        mode = target_pipeline if "targets" not in batches else "step"

        if mode == "prescan":
            # one big build: fold the scan axis into the batch axis (the
            # builder is per-image elementwise -> bitwise == per-step calls)
            gt = {k: batches[k] for k in ("gt_bbox", "gt_class", "gt_score")}
            flat = jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), gt)
            h, w = batches["image"].shape[2:4]
            tg = build({"image": jnp.zeros((1, h, w, 1), jnp.uint8), **flat})
            batches = dict(batches, targets=tuple(
                t.reshape((n_steps, -1) + t.shape[1:]) for t in tg))

        if mode == "doublebuf":
            first = jax.tree.map(lambda a: a[0], batches)
            # the builder reads only the gt leaves + the (static) image
            # shape, so roll just those — rolling the full tree would hand
            # the scan a shifted copy of the image stack and rely on XLA's
            # while-loop DCE to strip it
            gt = {k: batches[k] for k in ("gt_bbox", "gt_class", "gt_score")}
            nxt = jax.tree.map(lambda a: jnp.roll(a, -1, axis=0), gt)
            h, w = batches["image"].shape[2:4]
            dummy_im = jnp.zeros((1, h, w, 1), jnp.uint8)

            def body(carry, xs):
                st, tgts = carry
                batch, ngt, key = xs
                new_st, losses = step(st, dict(batch, targets=tgts), key)
                # build batch i+1's targets in step i's program slot (the
                # final iteration's build is wasted — one step of overhead
                # per dispatch group)
                return (new_st,
                        tuple(build({"image": dummy_im, **ngt}))), losses

            (st, _), losses = lax.scan(
                body, (state, tuple(build(first))), (batches, nxt, keys))
            return st, losses

        def body(carry, xs):
            batch, key = xs
            new_state, losses = step(carry, batch, key)
            return new_state, losses

        return lax.scan(body, state, (batches, keys))

    return multi


def init_train_state(model, params, cfg) -> TrainState:
    flat_policy = model.flat_policy()
    trainable, _ = split_trainable(params, flat_policy)
    velocity = {k: jnp.zeros_like(v) for k, v in trainable.items()}
    # real copies: EMA must not alias the param buffers (donation would
    # otherwise see the same buffer twice).  Trainable leaves only — see
    # ops/ema.py scope-parity note.
    ema = ({k: jnp.array(v, copy=True) for k, v in trainable.items()}
           if getattr(cfg, "use_ema", False) else None)
    return TrainState(params, velocity, ema, jnp.zeros((), jnp.int32))
