"""Custom-dataset (VOC) end-to-end: XML -> voc2txt -> txt2json -> training
with the config=2 recipe — the full workflow of the reference's
custom-dataset README section (README.md: 'custom datasets' steps with
1_voc2txt.py / 1_txt2json.py then train.py --config=2)."""
import json
import os

import numpy as np
import pytest

from tools.voc2txt import convert_split
from tools.txt2json import txt_to_json
from configs import PPYOLO_2x_Custom_Config

pytestmark = pytest.mark.slow


def _make_voc(root, n=4):
    cv2 = pytest.importorskip("cv2")
    jp = os.path.join(root, "JPEGImages")
    an = os.path.join(root, "Annotations")
    ids_dir = os.path.join(root, "ImageSets", "Main")
    for d in (jp, an, ids_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    classes = ["dog", "cat"]
    for i in range(n):
        name = f"im{i}"
        img = rng.randint(30, 220, (80, 96, 3)).astype(np.uint8)
        img[20:50, 25:65] = (0, 255, 0)
        cv2.imwrite(os.path.join(jp, name + ".jpg"), img)
        cls = classes[i % 2]
        xml = f"""<annotation>
  <filename>{name}.jpg</filename>
  <size><width>96</width><height>80</height><depth>3</depth></size>
  <object><name>{cls}</name><difficult>0</difficult>
    <bndbox><xmin>25</xmin><ymin>20</ymin><xmax>65</xmax><ymax>50</ymax></bndbox>
  </object>
</annotation>"""
        with open(os.path.join(an, name + ".xml"), "w") as f:
            f.write(xml)
        names.append(name)
    with open(os.path.join(ids_dir, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return root, classes


def test_voc_pipeline_to_training(tmp_path):
    root, classes = _make_voc(str(tmp_path))
    class_to_id = {c: i for i, c in enumerate(classes)}

    txt = str(tmp_path / "voc_train.txt")
    convert_split(os.path.join(root, "ImageSets", "Main", "train.txt"),
                  os.path.join(root, "Annotations"), txt, class_to_id)
    assert sum(1 for _ in open(txt)) == 4

    aj_dir = str(tmp_path / "aj")
    txt_to_json(txt, os.path.join(root, "JPEGImages"), classes,
                out_dir=aj_dir)
    anno_json = os.path.join(aj_dir, "voc_train.json")
    d = json.load(open(anno_json))
    assert len(d["images"]) == 4 and len(d["categories"]) == 2
    # txt2json keeps the 0-based class ids as category_id (reference
    # 1_txt2json.py convention; data_clean's catid2clsid maps them back)
    assert {a["category_id"] for a in d["annotations"]} == {0, 1}

    class Cfg(PPYOLO_2x_Custom_Config):
        def __init__(self):
            super().__init__()
            self.num_classes = 2
            self.head = dict(self.head, num_classes=2, drop_block=False)
            self.gt2YoloTarget = dict(self.gt2YoloTarget, num_classes=2)
            self.train_path = anno_json
            self.val_path = anno_json
            self.train_pre_path = os.path.join(root, "JPEGImages") + "/"
            self.val_pre_path = self.train_pre_path
            self.train_cfg = dict(self.train_cfg, batch_size=2, max_iters=2,
                                  save_iter=2, eval_iter=10**9,
                                  model_path="", mixup_epoch=0)
            self.randomShape = dict(sizes=[96], random_inter=True)

    from train import run_training
    wdir = str(tmp_path / "w")
    state = run_training(Cfg(), ndev=1, weights_dir=wdir)
    assert int(np.asarray(state.step)) == 2
    assert any(f.startswith("step") for f in os.listdir(wdir))
    # the VOC LR rule survives the override: 0.01 * bs / 192
    assert abs(Cfg().learningRate["base_lr"] - 0.01 * 8 / 192) < 1e-12
