#! /usr/bin/env python
"""VOC XML annotations -> txt lines (reference 1_voc2txt.py re-built).

Line format (1_voc2txt.py:16-22):
  <image name> x1,y1,x2,y2,cid x1,y1,x2,y2,cid ...
Outputs annotation/<name>_train.txt / _val.txt (+ _test) and the class list.
"""
from __future__ import annotations

import argparse
import os
import xml.etree.ElementTree as ET

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def parse_xml(xml_path: str, class_to_id, train_difficult: bool):
    root = ET.parse(xml_path).getroot()
    fname = root.findtext("filename")
    objs = []
    for obj in root.findall("object"):
        name = obj.findtext("name")
        difficult = int(obj.findtext("difficult") or 0)
        if difficult and not train_difficult:
            continue
        if name not in class_to_id:
            continue
        b = obj.find("bndbox")
        x1, y1 = float(b.findtext("xmin")), float(b.findtext("ymin"))
        x2, y2 = float(b.findtext("xmax")), float(b.findtext("ymax"))
        objs.append(f"{x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f},{class_to_id[name]}")
    return fname, objs


def convert_split(ids_file: str, annos_dir: str, out_path: str, class_to_id,
                  train_difficult: bool = True):
    lines = []
    with open(ids_file) as f:
        ids = [l.strip().split()[0] for l in f if l.strip()]
    for img_id in ids:
        xml_path = os.path.join(annos_dir, img_id + ".xml")
        if not os.path.exists(xml_path):
            continue
        fname, objs = parse_xml(xml_path, class_to_id, train_difficult)
        if objs:
            lines.append(fname + " " + " ".join(objs))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", default="../VOCdevkit/VOC2012/")
    p.add_argument("--name", default="voc2012")
    p.add_argument("--train_difficult", action="store_true", default=True)
    args = p.parse_args()
    d = args.dataset_dir
    class_to_id = {n: i for i, n in enumerate(VOC_CLASSES)}
    os.makedirs("annotation", exist_ok=True)
    os.makedirs("data", exist_ok=True)
    with open("data/voc_classes.txt", "w") as f:
        f.write("\n".join(VOC_CLASSES) + "\n")
    for split in ("train", "val"):
        ids = os.path.join(d, f"ImageSets/Main/{split}.txt")
        if os.path.exists(ids):
            n = convert_split(ids, os.path.join(d, "Annotations"),
                              f"annotation/{args.name}_{split}.txt",
                              class_to_id, args.train_difficult)
            print(f"{split}: {n} images")


if __name__ == "__main__":
    main()
