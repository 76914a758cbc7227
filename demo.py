#! /usr/bin/env python
"""Single-image inference + FPS benchmark (reference demo.py re-built).

python demo.py --config=0 [--image_dir images/test]

The reference measures FPS over images/test after 10 warmup iters
(demo.py:120-160); the TPU build does the whole decode+NMS on device with
one [1, keep_top_k, 6] transfer per image.
"""
import argparse
import glob
import logging
import os
import sys
import time
from tools.argparser import str2bool

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s-%(levelname)s: %(message)s",
                    datefmt="%Y-%m-%d %H:%M:%S")
logger = logging.getLogger(__name__)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--use_gpu", type=str2bool, default=True)
    p.add_argument("--precision", type=str, default="fp32", choices=["fp32", "bf16", "int8"],
                   help="bf16 = ~2x faster inference (fp32 decode/NMS kept)")
    p.add_argument("--image_dir", type=str, default="images/test")
    p.add_argument("--out_dir", type=str, default="images/res")
    args = p.parse_args()
    if not args.use_gpu:  # reference --use_gpu=0 semantics: run on host CPU
        import jax
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax
    from configs import get_config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.checkpoint import load_params_npz
    from ppyolo_tpu.eval import Detector, draw, get_classes

    cfg = get_config(args.config)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    model_path = cfg.test_cfg.get("model_path")
    if model_path and os.path.exists(model_path):
        if model_path.endswith(".pt"):
            from ppyolo_tpu.checkpoint import (load_torch_state_dict,
                                               convert_torch_state_dict)
            params = convert_torch_state_dict(
                load_torch_state_dict(model_path), params)
        else:
            params = load_params_npz(model_path, params)
        logger.info("loaded %s", model_path)
    else:
        logger.warning("model file %s missing - using random init", model_path)

    class_names = (get_classes(cfg.classes_path)
                   if os.path.exists(cfg.classes_path)
                   else [str(i) for i in range(cfg.num_classes)])
    det = Detector(model, params, cfg, target_size=cfg.test_cfg["target_size"],
                   precision=args.precision)

    paths = sorted(glob.glob(os.path.join(args.image_dir, "*")))
    paths = [p for p in paths if p.lower().endswith((".jpg", ".jpeg", ".png"))]
    if not paths:
        logger.error("no images under %s", args.image_dir)
        return
    os.makedirs(args.out_dir, exist_ok=True)

    # warmup (reference demo.py:120-123)
    img = cv2.imread(paths[0])
    for _ in range(10):
        det.detect_image(img)

    # reader thread: imdecode of image N+1 overlaps the device running image N
    # (reference read_test_data thread, demo.py:30-47)
    from ppyolo_tpu.data.loader import Prefetcher

    def read_images():
        for path in paths:
            yield path, cv2.imread(path)

    t0 = time.time()
    n = 0
    for path, img in Prefetcher(read_images(), max_batch=4):
        boxes, scores, classes = det.detect_image(
            img, draw_thresh=cfg.test_cfg["draw_thresh"]
            if cfg.test_cfg.get("draw_image") else None)
        n += 1
        if cfg.test_cfg.get("draw_image"):
            draw(img, boxes, scores, classes, class_names)
            cv2.imwrite(os.path.join(args.out_dir, os.path.basename(path)), img)
        if n % 50 == 0:
            logger.info("%d imgs, fps=%.1f", n, n / (time.time() - t0))
    cost = time.time() - t0
    logger.info("total %d images, cost %.2fs, fps=%.1f", n, cost, n / cost)


if __name__ == "__main__":
    main()
