"""run_training with scan_steps>1 + bf16 over the synthetic dataset."""
import os

import numpy as np

from tests.test_integration import _make_dataset, ItCfg


def test_run_training_scan_bf16(tmp_path):
    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    cfg.train_cfg = dict(cfg.train_cfg, max_iters=4, save_iter=4,
                         scan_steps=2, precision="bf16")
    from train import run_training
    state = run_training(cfg, ndev=1, weights_dir=str(tmp_path / "w"))
    assert int(np.asarray(state.step)) >= 4
    assert any(f.startswith("step") for f in os.listdir(tmp_path / "w"))
