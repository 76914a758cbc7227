"""Dataset tool tests: voc2txt XML parsing, txt2json conversion, EMA rule."""
import json
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.voc2txt import parse_xml, convert_split, VOC_CLASSES
from tools.txt2json import txt_to_json
from ppyolo_tpu.ops.ema import ema_update, ema_init


VOC_XML = """<annotation>
  <filename>img1.jpg</filename>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>220</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>1</difficult>
    <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
  </object>
</annotation>"""


def test_voc2txt_roundtrip(tmp_path):
    (tmp_path / "annos").mkdir()
    (tmp_path / "annos" / "img1.xml").write_text(VOC_XML)
    ids = tmp_path / "ids.txt"
    ids.write_text("img1\n")
    class_to_id = {n: i for i, n in enumerate(VOC_CLASSES)}

    out = tmp_path / "out.txt"
    n = convert_split(str(ids), str(tmp_path / "annos"), str(out), class_to_id,
                      train_difficult=True)
    assert n == 1
    line = out.read_text().strip()
    name, *objs = line.split()
    assert name == "img1.jpg" and len(objs) == 2
    x1, y1, x2, y2, cid = objs[0].split(",")
    assert int(cid) == VOC_CLASSES.index("dog")
    assert (x1, y1, x2, y2) == ("10", "20", "110", "220")

    # difficult filtered when train_difficult=False
    n = convert_split(str(ids), str(tmp_path / "annos"), str(out), class_to_id,
                      train_difficult=False)
    assert len(out.read_text().split()) == 2  # name + 1 object


def test_txt2json(tmp_path):
    txt = tmp_path / "d_train.txt"
    txt.write_text("img1.jpg 10,20,110,220,3 5,6,50,60,0\n")
    os.chdir(tmp_path)
    im_id, anno_id = txt_to_json(str(txt), "", ["a", "b", "c", "d"],
                                 out_dir=str(tmp_path / "aj"))
    assert im_id == 1 and anno_id == 2
    data = json.load(open(tmp_path / "aj" / "d_train.json"))
    assert len(data["images"]) == 1 and len(data["annotations"]) == 2
    a = data["annotations"][0]
    assert a["bbox"] == [10.0, 20.0, 100.0, 200.0]
    assert a["category_id"] == 3
    assert len(data["categories"]) == 4


def test_ema_warmup_rule():
    # decay_t = min(decay, (1+step)/(10+step)) — reference EMA.py:37
    shadow = ema_init({"w": jnp.zeros(3)})
    p = {"w": jnp.ones(3)}
    s0 = ema_update(shadow, p, 0, 0.9998)
    # early: decay=1/10 -> shadow tracks params fast (0.1*0 + 0.9*1)
    np.testing.assert_allclose(np.asarray(s0["w"]), 0.9, rtol=1e-6)
    s_late = ema_update(shadow, p, 10 ** 6, 0.9998)
    np.testing.assert_allclose(np.asarray(s_late["w"]), 0.0002, rtol=2e-4)


def test_ema_scope_trainable_only():
    """Reference EMA registers only requires_grad params (EMA.py:24-28):
    frozen leaves and BN running stats eval at CURRENT values, the shadow
    covers the trainable subset only."""
    import jax
    from ppyolo_tpu.ops.ema import ema_apply
    from ppyolo_tpu.train.train_step import init_train_state
    from ppyolo_tpu.models import PPYOLO
    from configs import PPYOLO_r18vd_Config

    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 4
    cfg.head = dict(cfg.head, num_classes=4)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    assert state.ema is not None
    flat_policy = model.flat_policy()
    # exactly the trainable leaves, no running stats, no frozen params
    assert set(state.ema) == {k for k, pol in flat_policy.items()
                              if pol.trainable}
    assert not any(k.endswith(("running_mean", "running_var"))
                   for k in state.ema)
    # ema_apply: shadow overrides trainables, current values elsewhere
    tk = next(iter(state.ema))
    shadow = dict(state.ema)
    shadow[tk] = shadow[tk] + 1.0
    merged = ema_apply(state.params, shadow)
    from ppyolo_tpu.ops.module import flatten_tree
    flat_merged = flatten_tree(merged)
    flat_params = flatten_tree(state.params)
    np.testing.assert_allclose(np.asarray(flat_merged[tk]),
                               np.asarray(flat_params[tk]) + 1.0)
    rk = next(k for k in flat_params if k.endswith("running_mean"))
    np.testing.assert_array_equal(np.asarray(flat_merged[rk]),
                                  np.asarray(flat_params[rk]))
