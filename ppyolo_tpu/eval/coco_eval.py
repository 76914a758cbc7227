"""COCO evaluation harness (reference tools/cocotools.py re-built).

Keeps the reference's protocol: per-image result shards under
eval_results/bbox/ (cocotools.py:159-191), xywh + catid remap + .2f-round
rows, merged into eval_results/bbox_detections.json, then evaluated — via
pycocotools when importable, else the built-in COCOeval-compatible
``coco_metric.evaluate_map``.  Detection happens in fixed-size batches
through one jitted device program (Detector.predict_batch)."""
from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# COCO class-index <-> category-id maps (reference cocotools.py:22-36)
COCO_CLSID2CATID = {
    0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 8, 8: 9, 9: 10, 10: 11,
    11: 13, 12: 14, 13: 15, 14: 16, 15: 17, 16: 18, 17: 19, 18: 20, 19: 21,
    20: 22, 21: 23, 22: 24, 23: 25, 24: 27, 25: 28, 26: 31, 27: 32, 28: 33,
    29: 34, 30: 35, 31: 36, 32: 37, 33: 38, 34: 39, 35: 40, 36: 41, 37: 42,
    38: 43, 39: 44, 40: 46, 41: 47, 42: 48, 43: 49, 44: 50, 45: 51, 46: 52,
    47: 53, 48: 54, 49: 55, 50: 56, 51: 57, 52: 58, 53: 59, 54: 60, 55: 61,
    56: 62, 57: 63, 58: 64, 59: 65, 60: 67, 61: 70, 62: 72, 63: 73, 64: 74,
    65: 75, 66: 76, 67: 77, 68: 78, 69: 79, 70: 80, 71: 81, 72: 82, 73: 84,
    74: 85, 75: 86, 76: 87, 77: 88, 78: 89, 79: 90,
}
COCO_CATID2CLSID = {v: k for k, v in COCO_CLSID2CATID.items()}


def get_classes(classes_path: str) -> List[str]:
    with open(classes_path) as f:
        return [c.strip() for c in f.readlines() if c.strip()]


def detections_to_coco(pred: np.ndarray, im_id: int,
                       clsid2catid: Dict[int, int]) -> List[dict]:
    """[keep_top_k, 6] rows -> COCO result dicts (cocotools.py:159-191
    format: xywh with the reference's +1 pixel convention, catid remap,
    coordinates rounded to the nearest 0.1 as COCO suggests)."""
    out = []
    for row in pred:
        label, score, x0, y0, x1, y1 = row
        if label < 0:
            continue
        w, h = x1 - x0 + 1, y1 - y0 + 1
        bbox = [round(float(v) * 10) / 10 for v in (x0, y0, w, h)]
        out.append({
            "image_id": int(im_id),
            "category_id": int(clsid2catid[int(label)]),
            "bbox": bbox,
            "score": float(score),
        })
    return out


def evaluate_detections(detections: List[dict], anno_file: str,
                        *, style: str = "bbox"):
    """Evaluate merged detections: pycocotools if available, else built-in."""
    try:  # pragma: no cover - pycocotools not in this image
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
        import tempfile

        coco_gt = COCO(anno_file)
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(detections, f)
            tmp = f.name
        coco_dt = coco_gt.loadRes(tmp)
        ev = COCOeval(coco_gt, coco_dt, style)
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        return ev.stats
    except ImportError:
        from .coco_metric import evaluate_map

        with open(anno_file) as f:
            gt = json.load(f)
        return evaluate_map(gt, detections)


def coco_eval(detector, images: List[dict], eval_pre_path: str, anno_file: str,
              eval_batch_size: int, *, type_: str = "eval",
              result_dir: str = "eval_results",
              clsid2catid: Optional[Dict[int, int]] = None,
              draw_image: bool = False, draw_thresh: float = 0.15,
              class_names: Optional[List[str]] = None,
              distributed: Optional[bool] = None,
              scan_group: int = 1):
    """Drive the detector over the val set and compute mAP
    (reference cocotools.py:195-277).  Returns box AP stats (or writes the
    test-dev submission json when type_=='test_dev').  With draw_image, the
    detections above draw_thresh are rendered to result_dir/images
    (cocotools.py:188-189).

    Multi-host: when the jax runtime spans processes, each process evaluates
    a disjoint image shard into the shared result_dir (the per-image shard
    files are the cross-host merge protocol — the reference's own
    shard-then-merge design, cocotools.py:159-191, extended across hosts);
    process 0 merges + evaluates, the rest return None.  Requires a shared
    filesystem for result_dir.

    ``distributed`` controls the shard/barrier protocol explicitly: it must
    be True only when EVERY jax process calls coco_eval collectively (as
    eval.py does).  A single process calling in from a multi-process runtime
    (e.g. train.py's rank-0-gated periodic eval) must pass False, or it
    would both evaluate only 1/nproc of the val set and deadlock on the
    cross-host barrier.  Default None = ``jax.process_count() > 1``, the
    collective convention.

    ``scan_group`` > 1 runs that many batches per device dispatch via a
    lax.scan (Detector.predict_pipelined) — per-dispatch host latency
    amortizes over scan_group*B images; detections and the shard-json
    protocol are identical (the scanned program is the same per-batch
    program).  It pays only where DISPATCH latency dominates: on this
    repo's dev container eval is H2D-bandwidth-bound (~39 MB/s tunnel;
    uint8 image bytes are identical either way) and the r3 steady-state
    probe measured a wash — 61.4 (sg=1) vs 62.0 (sg=8) img/s, r18vd@416
    bf16, warm jits — so the default stays 1.  The serving path's 103 ->
    717 img/s from the same amortization had device-RESIDENT inputs; for
    eval the win appears on hosts with real PCIe bandwidth."""
    import jax

    nproc, rank = jax.process_count(), jax.process_index()
    dist = nproc > 1 if distributed is None else distributed
    if dist and nproc == 1:
        dist = False  # single-process runtime: nothing to coordinate
    if dist:
        from jax.experimental import multihost_utils

    if not dist:
        rank = 0  # sole evaluator regardless of process index
    clsid2catid = clsid2catid or COCO_CLSID2CATID
    bbox_dir = os.path.join(result_dir, "bbox")
    if rank == 0:
        if os.path.exists(result_dir):
            shutil.rmtree(result_dir, ignore_errors=True)
        os.makedirs(bbox_dir, exist_ok=True)
        if draw_image:
            os.makedirs(os.path.join(result_dir, "images"), exist_ok=True)
    if dist:
        multihost_utils.sync_global_devices("coco_eval_setup")
        images = images[rank::nproc]  # disjoint per-host shards

    all_dets: List[dict] = []
    n = len(images)
    start = time.time()

    def read_batches():
        """Producer: imread + preprocess the next batch while the device runs
        the current one (reference read_eval_data thread, cocotools.py:113-157)."""
        i = 0
        while i < n:
            batch = images[i:i + eval_batch_size]
            pimages, sizes, ids, raw_imgs, names = [], [], [], [], []
            for im in batch:
                img = cv2.imread(os.path.join(eval_pre_path, im["file_name"]))
                p, s = detector.process_image(img)
                pimages.append(p[0])
                sizes.append(s[0])
                ids.append(im["id"])
                raw_imgs.append(img if draw_image else None)
                names.append(im["file_name"])
            # pad the tail so the jitted program shape is stable
            pad = eval_batch_size - len(batch)
            if pad:
                pimages += [pimages[-1]] * pad
                sizes += [sizes[-1]] * pad
            yield (i, np.stack(pimages), np.stack(sizes), ids, raw_imgs, names)
            i += eval_batch_size

    from concurrent.futures import ThreadPoolExecutor

    from ..data.loader import Prefetcher

    def write_one(dets, im_id, pred, raw_img, name):
        """Per-image shard write (+ optional render) — off the device loop,
        mirroring the reference's multi_thread_write_json
        (cocotools.py:159-191, 248-251)."""
        with open(os.path.join(bbox_dir, f"{im_id}.json"), "w") as f:
            f.write(json.dumps(dets) + "\n")
        if draw_image:
            from .visualize import draw

            keep = (pred[:, 0] >= 0) & (pred[:, 1] >= draw_thresh)
            cn = class_names or [str(c) for c in range(1000)]
            draw(raw_img, pred[keep, 2:6], pred[keep, 1],
                 pred[keep, 0].astype(np.int32), cn)
            cv2.imwrite(os.path.join(result_dir, "images",
                                     os.path.basename(name)), raw_img)

    writers = ThreadPoolExecutor(max_workers=4)
    pending = []

    def handle(preds, unit):
        i, _, _, ids, raw_imgs, names = unit
        for j, im_id in enumerate(ids):
            dets = detections_to_coco(preds[j], im_id, clsid2catid)
            if not dist:
                # distributed mode merges from the durable shard files on
                # rank 0 instead — accumulating here would be wasted memory
                all_dets.extend(dets)
            pending.append(writers.submit(write_one, dets, im_id, preds[j],
                                          raw_imgs[j], names[j]))
        done = i + eval_batch_size
        if done % (20 * eval_batch_size) == 0:
            elapsed = time.time() - start
            print(f"Test iter {done}, {done / max(elapsed, 1e-9):.1f} img/s")

    def run_group(buf):
        """scan_group full batches -> ONE scanned device dispatch
        (Detector.predict_pipelined); short tails go per-batch (a tail-sized
        scan would compile a second program for one use)."""
        if len(buf) == scan_group:
            preds = detector.predict_pipelined(
                np.concatenate([u[1] for u in buf]),
                np.concatenate([u[2] for u in buf]), group=len(buf))
            for g, unit in enumerate(buf):
                handle(preds[g * eval_batch_size:(g + 1) * eval_batch_size],
                       unit)
        else:
            for unit in buf:
                handle(detector.predict_batch(unit[1], unit[2]), unit)

    group_buf = []
    for unit in Prefetcher(read_batches(), max_batch=max(3, scan_group + 1)):
        if scan_group <= 1:
            handle(detector.predict_batch(unit[1], unit[2]), unit)
            continue
        group_buf.append(unit)
        if len(group_buf) == scan_group:
            run_group(group_buf)
            group_buf = []
    if group_buf:
        run_group(group_buf)
    for fut in pending:
        fut.result()  # surface writer exceptions; all shards durable
    writers.shutdown()
    cost = time.time() - start
    print(f"total time: {cost:.2f}s, speed: {n / max(cost, 1e-9):.1f} img/s")

    if dist:
        multihost_utils.sync_global_devices("coco_eval_shards")
        if rank != 0:
            return None
        # every host's detections exist only as shard files: merge from disk
        for fname in sorted(os.listdir(bbox_dir)):
            with open(os.path.join(bbox_dir, fname)) as f:
                all_dets.extend(json.load(f))

    merged = os.path.join(result_dir, "bbox_detections.json")
    with open(merged, "w") as f:
        json.dump(all_dets, f)
    if type_ == "test_dev":
        print(f"test-dev submission written to {merged}")
        return None
    stats = evaluate_detections(all_dets, anno_file)
    return stats
