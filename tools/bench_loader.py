"""Host input-pipeline throughput: imgs/s-per-core + per-op attribution.

VERDICT r3 #5 / SURVEY §7 hard-part #6: the device step is fast enough
(~321 img/s frozen b16@608 on one v5e) that the HOST is the plausible
production bottleneck, and the reference hides its answer behind 5 reader
threads (/root/reference/train.py:101-110).  This tool measures the full
train sample chain — JPEG decode -> mixup -> color distort -> expand ->
crop -> flip -> box ops -> RandomShape resize -> uint8 assemble — on a
synthetic image set matching COCO val2017's size distribution, attributes
wall time per transform, and prints how many host cores keep one chip fed.

Usage:  python tools/bench_loader.py [--n_images 48] [--batches 12]
        [--batch_size 16] [--image_dir DIR]

Single-threaded by design: the metric is img/s-per-CORE (loader workers
are independent, so N cores scale linearly; see DESIGN.md host sizing).

One JSON summary line is printed last (machine-readable).
"""
import argparse
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# COCO val2017 (w, h) distribution, coarse quantiles: most images are
# max-side-640 with 4:3-ish aspect; a tail is small or square.
COCO_SIZES = [(640, 480), (640, 427), (640, 478), (480, 640), (640, 360),
              (500, 375), (640, 425), (427, 640), (640, 512), (375, 500),
              (640, 640), (320, 240)]


def make_images(img_dir, n, rng):
    """JPEGs with natural-ish entropy: blurred noise + gradients (pure
    noise over-states decode cost ~2x; flat color understates it)."""
    import cv2

    paths = []
    for i in range(n):
        w, h = COCO_SIZES[i % len(COCO_SIZES)]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([
            127 + 80 * np.sin(xx / 97.0 + i),
            127 + 80 * np.cos(yy / 83.0 - i),
            127 + 60 * np.sin((xx + yy) / 131.0),
        ], axis=-1)
        noise = rng.randn(h // 4 + 1, w // 4 + 1, 3).astype(np.float32) * 40
        noise = cv2.resize(noise, (w, h), interpolation=cv2.INTER_LINEAR)
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        p = os.path.join(img_dir, f"bench_{i:04d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append((p, w, h))
    return paths


def make_records(paths, rng):
    records = []
    for i, (p, w, h) in enumerate(paths):
        n_box = int(rng.randint(1, 9))
        x1 = rng.uniform(0, w * 0.6, n_box)
        y1 = rng.uniform(0, h * 0.6, n_box)
        bw = rng.uniform(8, w * 0.4, n_box)
        bh = rng.uniform(8, h * 0.4, n_box)
        gt_bbox = np.stack([x1, y1, np.minimum(x1 + bw, w - 1),
                            np.minimum(y1 + bh, h - 1)], -1).astype(np.float32)
        records.append({
            "im_file": p, "im_id": np.array([i]), "h": float(h), "w": float(w),
            "is_crowd": np.zeros((n_box, 1), np.int32),
            "gt_class": rng.randint(0, 80, (n_box, 1)).astype(np.int32),
            "anno_id": list(range(n_box)),
            "gt_bbox": gt_bbox,
            "gt_score": np.ones((n_box, 1), np.float32),
        })
    return records


class TimedOp:
    """Wraps a sample transform, accumulating wall seconds per op name."""

    def __init__(self, op, sink):
        self.op = op
        self.sink = sink
        self.name = type(op).__name__

    def __call__(self, sample, rng):
        t0 = time.perf_counter()
        out = self.op(sample, rng)
        self.sink[self.name] += time.perf_counter() - t0
        return out


def bench_serving(paths, target_size, interp, device_img_s, batches=12,
                  batch_size=16):
    """The SERVING host chain (eval/detector.py _preprocess): JPEG decode ->
    BGR->RGB -> uint8 cv2.resize to the square eval size.  The detector
    ships uint8 and normalizes on device, so this IS the whole host side
    of production inference; prints img/s-per-core and the cores needed to
    feed one chip at the serving rate (745 img/s @608 bf16, DESIGN.md)."""
    import cv2

    raw = []
    for p, _, _ in paths:
        with open(p, "rb") as f:
            raw.append(f.read())
    t_dec = t_res = 0.0
    n_img = 0
    warm = 2
    for b in range(batches + warm):
        if b == warm:
            t_dec = t_res = 0.0
            n_img = 0
        for i in range(batch_size):
            buf = raw[(b * batch_size + i) % len(raw)]
            t0 = time.perf_counter()
            im = cv2.imdecode(np.frombuffer(buf, np.uint8), 1)
            im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
            t_dec += time.perf_counter() - t0
            t0 = time.perf_counter()
            cv2.resize(im, (target_size, target_size), interpolation=interp)
            t_res += time.perf_counter() - t0
            n_img += 1
    total = t_dec + t_res
    img_s = n_img / total
    cores = device_img_s / img_s
    print(f"\nserving host chain @ {target_size} (decode+BGR2RGB "
          f"{t_dec / n_img * 1e3:.2f} ms/img, u8 resize "
          f"{t_res / n_img * 1e3:.2f} ms/img)")
    print(f"host serving prep: {img_s:.1f} img/s/core; one chip at "
          f"{device_img_s:.0f} img/s needs ~{cores:.1f} cores "
          f"({int(np.ceil(cores))} rounded up)")
    print(json.dumps({
        "metric": "serving_prep_imgs_per_sec_per_core",
        "value": round(img_s, 2), "unit": "img/s",
        "cores_per_chip": round(cores, 2), "device_img_s": device_img_s,
        "decode_ms": round(t_dec / n_img * 1e3, 2),
        "resize_ms": round(t_res / n_img * 1e3, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=48)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--image_dir", type=str, default=None,
                    help="use real images instead of synthetic ones")
    ap.add_argument("--device_img_s", type=float, default=321.0,
                    help="device step rate to size cores against "
                         "(v5e frozen b16@608 = 321 img/s, DESIGN.md)")
    ap.add_argument("--serving", action="store_true",
                    help="measure the SERVING host chain (decode+resize, "
                         "detector._preprocess semantics) instead of the "
                         "train transform chain; pair with "
                         "--device_img_s 745 --target_size 608")
    ap.add_argument("--target_size", type=int, default=608,
                    help="--serving eval size (608/416/320)")
    args = ap.parse_args()

    from configs import PPYOLO_2x_Config
    from ppyolo_tpu.data import loader as L
    from ppyolo_tpu.data.coco import get_samples

    rng = np.random.RandomState(0)
    tmp = None
    if args.image_dir:
        import cv2
        paths = []
        for f in sorted(os.listdir(args.image_dir))[:args.n_images]:
            p = os.path.join(args.image_dir, f)
            im = cv2.imread(p)
            if im is not None:
                paths.append((p, im.shape[1], im.shape[0]))
    else:
        tmp = tempfile.mkdtemp(prefix="bench_loader_")
        paths = make_images(tmp, args.n_images, rng)

    if args.serving:
        cfg = PPYOLO_2x_Config()
        bench_serving(paths, args.target_size,
                      int(cfg.resizeImage.get("interp", 2)),
                      args.device_img_s, args.batches, args.batch_size)
        return

    records = make_records(paths, rng)

    cfg = PPYOLO_2x_Config()
    # deliberately single-threaded: the metric is img/s-per-core (workers
    # are independent, so N cores scale linearly — DESIGN.md host sizing)
    cfg.train_cfg = dict(cfg.train_cfg, batch_size=args.batch_size,
                         mixup_epoch=10 ** 9)  # production window: mixup ON

    sink = defaultdict(float)
    ops = [TimedOp(op, sink) for op in L.build_sample_transforms(cfg)]
    n_img = 0
    t_sample = 0.0
    t_assemble = 0.0
    t_getsamples = 0.0
    asm_split = {}  # assemble_batch resize_s / pack_s attribution
    indexes = list(range(len(records)))
    warm = 2
    for b in range(args.batches + warm):
        if b == warm:  # drop warmup (numpy/cv2 first-call costs)
            for k in sink:
                sink[k] = 0.0
            t_sample = t_assemble = t_getsamples = n_img = 0
            asm_split.clear()
        it_rng = np.random.RandomState(100 + b)
        step = b % max(len(records) // args.batch_size, 1)
        t0 = time.perf_counter()
        samples = get_samples(records, indexes, step, args.batch_size, b,
                              True, False, 10 ** 9, 0, it_rng)
        t_getsamples += time.perf_counter() - t0
        t0 = time.perf_counter()
        samples = [L.apply_sample_transforms(s, ops, it_rng)
                   for s in samples]
        t_sample += time.perf_counter() - t0
        t0 = time.perf_counter()
        L.assemble_batch(samples, cfg, it_rng, timings=asm_split)
        t_assemble += time.perf_counter() - t0
        n_img += len(samples)

    total = t_getsamples + t_sample + t_assemble
    img_s = n_img / total
    cores = args.device_img_s / img_s
    print(f"\n{n_img} images, batch {args.batch_size}, "
          f"{'synthetic COCO-size' if not args.image_dir else args.image_dir}"
          f" set")
    print(f"{'op':<22}{'ms/img':>9}{'share':>8}")
    rows = sorted(sink.items(), key=lambda kv: -kv[1])
    for name, sec in rows:
        print(f"{name:<22}{sec / n_img * 1e3:>9.2f}{sec / total:>8.1%}")
    print(f"{'get_samples(deepcopy)':<22}{t_getsamples / n_img * 1e3:>9.2f}"
          f"{t_getsamples / total:>8.1%}")
    print(f"{'assemble(resize+pack)':<22}{t_assemble / n_img * 1e3:>9.2f}"
          f"{t_assemble / total:>8.1%}")
    for k, label in (("resize_s", "  - cv2.resize"), ("pack_s", "  - u8 pack")):
        if k in asm_split:
            print(f"{label:<22}{asm_split[k] / n_img * 1e3:>9.2f}"
                  f"{asm_split[k] / total:>8.1%}")
    print(f"{'TOTAL':<22}{total / n_img * 1e3:>9.2f}{1:>8.0%}")
    print(f"\nhost pipeline: {img_s:.1f} img/s/core; one chip at "
          f"{args.device_img_s:.0f} img/s needs ~{cores:.1f} cores "
          f"({int(np.ceil(cores))} rounded up)")
    worst = max(rows + [("get_samples(deepcopy)", t_getsamples),
                        ("assemble(resize+pack)", t_assemble)],
                key=lambda kv: kv[1])
    print(json.dumps({
        "metric": "loader_imgs_per_sec_per_core", "value": round(img_s, 2),
        "unit": "img/s", "cores_per_chip": round(cores, 2),
        "device_img_s": args.device_img_s,
        "worst_op": worst[0], "worst_ms_per_img": round(worst[1] / n_img * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
