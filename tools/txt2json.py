#! /usr/bin/env python
"""txt annotations -> COCO json (reference 1_txt2json.py re-built).

Input line format: ``<image> x1,y1,x2,y2,cid ...``; writes
annotation_json/<name>.json in COCO format (segmentation rectangle,
area=w*h, category ids = class ids as in the reference :30-72).
"""
from __future__ import annotations

import argparse
import json
import os

try:
    import cv2
except ImportError:
    cv2 = None


def get_classes(classes_path):
    with open(classes_path) as f:
        return [c.strip() for c in f.readlines() if c.strip()]


def txt_to_json(txt_path, img_path, class_names, im_id=0, anno_id=0,
                out_dir="annotation_json"):
    with open(txt_path) as f:
        txt_lines = [l for l in f.readlines() if l.strip()]
    images, annos = [], []
    for line in txt_lines:
        parts = line.split()
        fname = parts[0]
        img = cv2.imread(os.path.join(img_path, fname)) if img_path else None
        if img is not None:
            img_h, img_w = img.shape[:2]
        else:  # tolerate missing images: fall back to bbox extent
            img_h = img_w = 0
            for p in parts[1:]:
                b = p.split(",")
                img_w = max(img_w, int(float(b[2])) + 1)
                img_h = max(img_h, int(float(b[3])) + 1)
        images.append({
            "license": 1, "file_name": fname, "coco_url": "a",
            "height": img_h, "width": img_w, "date_captured": "a",
            "flickr_url": "a", "id": im_id,
        })
        for p in parts[1:]:
            b = p.split(",")
            x1, y1, x2, y2 = map(float, b[:4])
            cid = int(b[4])
            w, h = x2 - x1, y2 - y1
            annos.append({
                "segmentation": [[x2, y2, x2, y1, x1, y1, x1, y2, x2, y2]],
                "area": w * h, "iscrowd": 0, "image_id": im_id,
                "bbox": [x1, y1, w, h], "category_id": cid, "id": anno_id,
            })
            anno_id += 1
        im_id += 1
    target = {
        "info": {"description": "converted by ppyolo_tpu tools/txt2json.py"},
        "images": images, "annotations": annos, "licenses": [],
        "categories": [{"id": i, "name": n, "supercategory": "none"}
                       for i, n in enumerate(class_names)],
    }
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(txt_path))[0]
    out = os.path.join(out_dir, f"{name}.json")
    with open(out, "w") as f:
        json.dump(target, f)
    print(f"wrote {out}: {len(images)} images, {len(annos)} annos")
    return im_id, anno_id


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_path", default="annotation/voc2012_train.txt")
    p.add_argument("--val_path", default="annotation/voc2012_val.txt")
    p.add_argument("--test_path", default=None)
    p.add_argument("--classes_path", default="data/voc_classes.txt")
    p.add_argument("--train_pre_path", default="../VOCdevkit/VOC2012/JPEGImages/")
    p.add_argument("--val_pre_path", default="../VOCdevkit/VOC2012/JPEGImages/")
    p.add_argument("--test_pre_path", default=None)
    args = p.parse_args()
    class_names = get_classes(args.classes_path)
    im_id = anno_id = 0
    im_id, anno_id = txt_to_json(args.train_path, args.train_pre_path,
                                 class_names, im_id, anno_id)
    im_id, anno_id = txt_to_json(args.val_path, args.val_pre_path,
                                 class_names, im_id, anno_id)
    if args.test_path:
        txt_to_json(args.test_path, args.test_pre_path, class_names,
                    im_id, anno_id)


if __name__ == "__main__":
    main()
