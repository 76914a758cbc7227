#! /usr/bin/env python
"""Draw ground-truth boxes for annotation verification
(reference 1_draw_gt.py re-built)."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anno", default="annotation_json/voc2012_val.json")
    p.add_argument("--pre_path", default="../VOCdevkit/VOC2012/JPEGImages/")
    p.add_argument("--out_dir", default="images/draw_gt")
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args()

    import cv2
    from ppyolo_tpu.data import CocoJson, category_maps, data_clean
    from ppyolo_tpu.eval import draw

    coco = CocoJson(args.anno)
    catid2clsid, _, names = category_maps(coco)
    records = data_clean(coco, coco.get_img_ids()[:args.limit], catid2clsid,
                         args.pre_path)
    os.makedirs(args.out_dir, exist_ok=True)
    for rec in records:
        img = cv2.imread(rec["im_file"])
        if img is None:
            continue
        classes = rec["gt_class"][:, 0]
        scores = np.ones(len(classes), np.float32)
        draw(img, rec["gt_bbox"], scores, classes, names)
        cv2.imwrite(os.path.join(args.out_dir,
                                 os.path.basename(rec["im_file"])), img)
    print(f"wrote {len(records)} images to {args.out_dir}")


if __name__ == "__main__":
    main()
