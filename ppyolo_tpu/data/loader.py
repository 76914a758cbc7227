"""Config-driven input pipeline with background prefetch.

Replaces the reference's thread+dict-as-queue producer (train.py:63-152,
378-391 — spin-waits on a plain dict guarded only by the GIL) with a proper
bounded ``queue.Queue`` producer and a vectorized batch assembly:

  * sample transforms built from ``cfg.sample_transforms_seq`` via the
    registry (the reference dispatches with an if/elif chain,
    train.py:312-344)
  * batch transforms: one random size per batch from the 10-size bucket
    (RandomShape, so XLA compiles at most 10 graphs — SURVEY.md §7 hard
    part 3), normalize, (no-op) permute, and the VECTORIZED Gt2YoloTarget
  * optional worker threads for the per-sample cv2/augment work
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from . import transforms as T
from .coco import get_samples
from .targets import gt2yolo_targets


def build_sample_transforms(cfg) -> List[T.BaseOperator]:
    ops = []
    for name in cfg.sample_transforms_seq:
        cls = T.SAMPLE_OPS[name]
        kwargs = dict(getattr(cfg, name, {}) or {})
        ops.append(cls(**kwargs))
    return ops


def apply_sample_transforms(sample, ops, rng):
    for op in ops:
        sample = op(sample, rng)
    return sample


def assemble_batch(samples: List[dict], cfg, rng: np.random.RandomState,
                   *, fixed_shape: Optional[int] = None,
                   timings: Optional[Dict[str, float]] = None) -> Dict[str, Any]:
    """Batch transforms: RandomShape -> NormalizeImage -> Permute ->
    Gt2YoloTarget (vectorized).  Returns numpy arrays (NHWC).

    ``timings`` (bench hook): accumulates "resize_s"/"pack_s" wall time.
    """
    shape = fixed_shape if fixed_shape is not None else int(
        rng.choice(cfg.randomShape["sizes"]))
    shaper = T.RandomShapeSingle(
        random_inter=cfg.randomShape.get("random_inter", False))
    normalizer = T.NormalizeImage(**cfg.normalizeImage)
    permuter = T.Permute(**cfg.permute)
    # device_normalize (default on): ship uint8 and let the jitted train
    # step apply (x/255 - mean)/std — 4x less H2D and no fp32 normalize on
    # the host.  Pixels are still 0..255 floats here (augmentations), so
    # the uint8 round-trip quantizes by <=0.5/255 — below augmentation noise.
    devnorm = bool(cfg.train_cfg.get("device_normalize", True))
    if devnorm:
        # zero-temporary path (r5): resize into one reusable fp32 scratch,
        # then a single-pass native rint+clip+u8 write straight into the
        # preallocated batch slot (native.pack_u8) — the numpy chain
        # stack([clip(rint(x))]).astype(u8) materialized three full-image
        # temporaries per sample.  Bitwise-identical (tests/test_native.py,
        # test_loader.py); ~1.6x on the pack stage (tools/bench_loader.py).
        from .. import native as _native

        s_int = int(shape)
        images = np.empty((len(samples), s_int, s_int, 3), np.uint8)
        scratch = np.empty((s_int, s_int, 3), np.float32)
        for i, s in enumerate(samples):
            t0 = time.perf_counter() if timings is not None else 0.0
            shaper(shape, s, rng, dst=scratch)
            permuter(s, rng)
            if timings is not None:
                t1 = time.perf_counter()
                timings["resize_s"] = timings.get("resize_s", 0.0) + t1 - t0
                t0 = t1
            img = s["image"]
            if img.dtype == np.float32:
                if not img.flags.c_contiguous:  # e.g. Permute(to_bgr=True)
                    img = np.ascontiguousarray(img)
                if not _native.pack_u8(img, images[i]):
                    np.rint(img, out=img)
                    np.clip(img, 0.0, 255.0, out=img)
                    images[i] = img  # integral-valued: cast is exact
            elif img.dtype == np.uint8:
                # p<1 augmentations (mixup window over, distort/expand
                # draws all miss) leave the image uint8 — rint/clip are
                # identities there, so pack is a straight copy (the old
                # generic rint(u8) materialized a float64 full-image temp)
                images[i] = img
            else:  # float64 or exotic: generic (slow, correct) path
                images[i] = np.clip(np.rint(img), 0.0, 255.0).astype(np.uint8)
            if timings is not None:
                timings["pack_s"] = (timings.get("pack_s", 0.0)
                                     + time.perf_counter() - t0)
    else:
        for s in samples:
            shaper(shape, s, rng)
            normalizer(s, rng)
            permuter(s, rng)
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
    gt_bbox = np.stack([s["gt_bbox"] for s in samples]).astype(np.float32)
    gt_class = np.stack(
        [np.reshape(s["gt_class"], (-1,)) for s in samples]).astype(np.int32)
    gt_score = np.stack([np.reshape(s["gt_score"], (-1,)) for s in samples]).astype(np.float32)
    batch = {
        "image": images,
        "gt_bbox": gt_bbox,
        "gt_class": gt_class,
        "gt_score": gt_score,
        "shape": shape,
    }
    # device_targets (default on): the train step builds the [B,gh,gw,an,6+C]
    # tensors on device from the tiny gt arrays (targets.py
    # gt2yolo_targets_device) — skips both the host scatter and shipping
    # ~24x-the-image-bytes of mostly-zero targets over H2D
    if not cfg.train_cfg.get("device_targets", True):
        tcfg = cfg.gt2YoloTarget
        batch["targets"] = tuple(gt2yolo_targets(
            gt_bbox, gt_class, gt_score, (shape, shape), tcfg["anchors"],
            tcfg["anchor_masks"], tcfg["downsample_ratios"],
            tcfg["num_classes"], iou_thresh=tcfg.get("iou_thresh", 1.0)))
    return batch


def train_batches(records: List[dict], cfg, *, seed: int = 0,
                  start_iter: int = 0, fixed_shape: Optional[int] = None,
                  shape_group: int = 1, num_shards: int = 1,
                  shard_id: int = 0) -> Iterator[Dict[str, Any]]:
    """Infinite shuffled batch stream (reference read_train_data,
    train.py:63-152).

    shape_group > 1 keeps the random input size constant for that many
    consecutive batches so a lax.scan'ed multi-step trainer sees one shape
    per dispatch group.

    num_shards/shard_id: multi-host data sharding — each host reads a
    disjoint slice of the record list (seed identical across hosts so the
    batch SHAPES stay in lock-step, as multi-host jax requires).
    """
    if num_shards > 1:
        records = records[shard_id::num_shards]
    tc = cfg.train_cfg
    batch_size = tc["batch_size"]
    n = len(records)
    steps_per_epoch = max(n // batch_size, 1)
    with_mixup = cfg.decodeImage.get("with_mixup", False)
    with_cutmix = cfg.decodeImage.get("with_cutmix", False)
    mixup_steps = tc.get("mixup_epoch", 0) * steps_per_epoch
    cutmix_steps = tc.get("cutmix_epoch", 0) * steps_per_epoch
    sample_ops = build_sample_transforms(cfg)
    # per-sample worker threads (reference train.py:101-110, num_threads=5);
    # cv2 releases the GIL so threads parallelize imdecode/resize/augment.
    n_threads = int(tc.get("num_threads", 0) or 0)
    pool = ThreadPoolExecutor(n_threads) if n_threads > 1 else None

    # ALL randomness is keyed by (seed, shard, epoch/iter) rather than drawn
    # from continuous streams, so the stream is FAST-FORWARDABLE: starting
    # at start_iter reproduces exactly the batches an uninterrupted run
    # would see there (resume == uninterrupted, proven bitwise by
    # tests/test_integration.py::test_resume_is_equivalent_to_uninterrupted_run
    # — a guarantee the reference lacks: its shuffles restart on resume).
    # The SHAPE key deliberately excludes the shard term so all hosts stay
    # in shape lock-step regardless of how many draws augmentations consume.
    M31 = 2 ** 31 - 1

    def epoch_rng(epoch):
        return np.random.RandomState(
            (seed + 7919 * shard_id + 104729 * epoch) % M31)

    def iter_rng(it, slot=0):
        return np.random.RandomState(
            (seed + 7919 * shard_id + 101 * slot + 15485863 * it) % M31)

    def group_shape(it):
        if fixed_shape is not None:
            return fixed_shape
        gidx = (it - 1) // max(shape_group, 1)
        srng = np.random.RandomState((seed + 6151 * gidx) % M31)
        return int(srng.choice(cfg.randomShape["sizes"]))

    iter_id = start_iter
    epoch = start_iter // steps_per_epoch
    step0 = start_iter % steps_per_epoch
    while True:
        indexes = np.arange(n)
        epoch_rng(epoch).shuffle(indexes)
        for step in range(step0, steps_per_epoch):
            iter_id += 1
            shape = group_shape(iter_id)
            it_rng = iter_rng(iter_id)
            samples = get_samples(records, indexes, step, batch_size, iter_id,
                                  with_mixup, with_cutmix, mixup_steps,
                                  cutmix_steps, it_rng)
            if pool is not None:
                samples = list(pool.map(
                    lambda iv: apply_sample_transforms(
                        iv[1], sample_ops, iter_rng(iter_id, iv[0] + 1)),
                    enumerate(samples)))
            else:
                samples = [apply_sample_transforms(s, sample_ops, it_rng)
                           for s in samples]
            yield assemble_batch(samples, cfg, it_rng, fixed_shape=shape)
        epoch += 1
        step0 = 0


class DevicePrefetcher:
    """Double-buffered host->device transfer.

    Wraps a host-batch iterator and keeps one dispatch unit ahead on device:
    when the caller takes batch N, batch N+1's ``jax.device_put`` (async) is
    issued immediately, so the H2D transfer overlaps the step computing on
    batch N.  The reference moves each batch synchronously inside its hot
    loop (reference train.py:129-137); CLAUDE.md measured this environment's
    tunnel at ~39 MB/s, which makes hiding the transfer significant.

    ``transfer`` maps a host unit to its device-resident form (defaults to
    plain ``jax.device_put``); pass a sharded put for mesh training.
    """

    def __init__(self, it: Iterator, transfer=None):
        import jax

        self._it = iter(it)
        self._transfer = transfer if transfer is not None else jax.device_put
        self._pending = self._fetch()

    def _fetch(self):
        try:
            return self._transfer(next(self._it))
        except StopIteration:
            return None

    def __iter__(self):
        return self

    def __next__(self):
        if self._pending is None:
            raise StopIteration
        current = self._pending
        self._pending = self._fetch()
        return current


class Prefetcher:
    """Background-thread prefetch with a bounded queue (the reference caps at
    max_batch=3 via dict length polling, train.py:83-86)."""

    def __init__(self, it: Iterator, max_batch: int = 3):
        self._it = it
        self._q: queue.Queue = queue.Queue(maxsize=max_batch)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        # A producer crash must NOT look like a clean end-of-stream to the
        # consumer (a mid-eval imread failure would otherwise silently
        # truncate the val set and report a partial mAP as the full result):
        # record the exception and re-raise it from __next__.
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 - relayed to the consumer
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None:
                raise RuntimeError(
                    "data producer thread failed") from self._error
            raise StopIteration
        return item
