#! /usr/bin/env python
"""Serve detections from an exported StableHLO artifact — no model code.

  python tools/serve_artifact.py --artifact ppyolo_2x_608_b8.shlo \
      --image_dir images/test --out detections.json [--draw_dir out/] \
      [--score_thresh 0.15] [--use_gpu 1]

The artifact fixes (batch, size); images are uint8-resized on host (the
exact Detector.process_image contract), batched (last batch padded by
repetition), and the [B, keep_top_k, 6] rows are written as one JSON list of
{image, label, score, bbox(xyxy, original-image coords)} entries.  This is
the deployment loop the reference lacks — its demo.py needs the full model
source + checkpoint; this needs the artifact bytes and a jax runtime.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from tools.argparser import str2bool

    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out", default="detections.json")
    p.add_argument("--draw_dir", default="")
    p.add_argument("--score_thresh", type=float, default=0.15)
    p.add_argument("--interp", default="cubic",
                   choices=["nearest", "linear", "cubic", "area", "lanczos"],
                   help="host resize interpolation — must match the "
                        "exporting config's resizeImage['interp'] "
                        "(cubic for all shipped configs)")
    p.add_argument("--use_gpu", type=str2bool, default=True)
    args = p.parse_args()
    if not args.use_gpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp
    from jax import export as jexport

    interp = {"nearest": cv2.INTER_NEAREST, "linear": cv2.INTER_LINEAR,
              "cubic": cv2.INTER_CUBIC, "area": cv2.INTER_AREA,
              "lanczos": cv2.INTER_LANCZOS4}[args.interp]

    with open(args.artifact, "rb") as f:
        exp = jexport.deserialize(f.read())
    # the artifact's input contract fixes (batch, size)
    batch, size = (int(exp.in_avals[0].shape[0]),
                   int(exp.in_avals[0].shape[1]))

    def serve(images, im_size):
        return exp.call(jnp.asarray(images), jnp.asarray(im_size))

    files = sorted(
        f for f in glob.glob(os.path.join(args.image_dir, "*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not files:
        raise SystemExit(f"no images in {args.image_dir}")

    results = []
    skipped = []
    for i in range(0, len(files), batch):
        chunk = []
        ims, sizes = [], []
        for f in files[i:i + batch]:
            bgr = cv2.imread(f)
            if bgr is None:
                skipped.append(f)
                continue
            chunk.append(f)
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            sizes.append([bgr.shape[0], bgr.shape[1]])
            ims.append(cv2.resize(rgb, (size, size),
                                  interpolation=interp))
        if not chunk:
            continue
        while len(ims) < batch:          # pad the tail by repetition
            ims.append(ims[-1])
            sizes.append(sizes[-1])
        dets = np.asarray(serve(np.stack(ims).astype(np.uint8),
                                np.asarray(sizes, np.float32)))
        for f, d in zip(chunk, dets):
            keep = (d[:, 0] >= 0) & (d[:, 1] >= args.score_thresh)
            for row in d[keep]:
                results.append({
                    "image": os.path.basename(f),
                    "label": int(row[0]),
                    "score": float(row[1]),
                    "bbox": [float(v) for v in row[2:6]],
                })
            if args.draw_dir:
                os.makedirs(args.draw_dir, exist_ok=True)
                img = cv2.imread(f)
                for row in d[keep]:
                    x0, y0, x1, y1 = (int(v) for v in row[2:6])
                    cv2.rectangle(img, (x0, y0), (x1, y1), (0, 255, 0), 1)
                cv2.imwrite(os.path.join(args.draw_dir,
                                         os.path.basename(f)), img)

    with open(args.out, "w") as f:
        json.dump(results, f)
    for f in skipped:
        print(f"WARNING: unreadable image skipped: {f}", file=sys.stderr)
    print(f"{len(files) - len(skipped)} images -> {len(results)} detections "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
