"""run_training with scan_steps>1 + bf16 over the synthetic dataset."""
import os

import numpy as np

from tests.test_integration import _make_dataset, ItCfg
import pytest

pytestmark = pytest.mark.slow


def test_run_training_scan_bf16(tmp_path):
    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    cfg.train_cfg = dict(cfg.train_cfg, max_iters=4, save_iter=4,
                         scan_steps=2, precision="bf16")
    from train import run_training
    state = run_training(cfg, ndev=1, weights_dir=str(tmp_path / "w"))
    assert int(np.asarray(state.step)) >= 4
    assert any(f.startswith("step") for f in os.listdir(tmp_path / "w"))


def test_multi_shape_training_compiles_per_bucket(tmp_path):
    """Random-shape training: consecutive batches at different sizes reuse
    the per-shape compiled step (SURVEY.md §7 hard part 3)."""
    import jax
    import jax.numpy as jnp
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train import make_train_step, init_train_state
    from ppyolo_tpu.data import train_batches
    from tests.test_integration import _make_dataset, ItCfg

    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    cfg.randomShape = dict(sizes=[96, 128], random_inter=True)
    from ppyolo_tpu.data.coco import CocoJson
    from ppyolo_tpu.data import category_maps, data_clean
    coco = CocoJson(anno_path)
    c2c, _, _ = category_maps(coco)
    recs = data_clean(coco, coco.get_img_ids(), c2c, img_dir)

    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = init_train_state(model, params, cfg)
    step = jax.jit(make_train_step(model, cfg))
    shapes_seen = set()
    it = train_batches(recs, cfg, seed=3)
    import numpy as np
    for i in range(6):
        b = next(it)
        shapes_seen.add(b["shape"])
        device_batch = {"image": jnp.asarray(b["image"]),
                        "gt_bbox": jnp.asarray(b["gt_bbox"]),
                        "gt_class": jnp.asarray(b["gt_class"]),
                        "gt_score": jnp.asarray(b["gt_score"])}
        state, losses = step(state, device_batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(losses["total_loss"]))
    assert shapes_seen == {96, 128}
    # 2 shapes -> exactly 2 compiled variants cached
    assert step._cache_size() == 2


def test_warmup_shapes_compiles_each_bucket(tmp_path):
    """tools/warmup_shapes pre-compiles one executable per size bucket
    (round-2 VERDICT item #6: un-warmed first epochs stall on up to 10
    remote compiles)."""
    from tests.test_integration import _make_dataset, ItCfg
    from tools.warmup_shapes import warmup, dummy_batch

    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    cfg = ItCfg(anno_path, img_dir, str(tmp_path))
    times = warmup(cfg, sizes=[96, 128], verbose=False)
    assert set(times) == {96, 128}
    assert all(t > 0 for t in times.values())

    # the dummy batch matches the loader's shipped shapes/dtypes
    b = dummy_batch(cfg, 96, cfg.train_cfg["batch_size"])
    assert b["image"].shape[1:] == (96, 96, 3)
    assert b["image"].dtype == np.uint8


def test_target_pipeline_modes_bitwise_equal():
    """The three multi-step target pipelines ('step' baseline, 'prescan'
    vectorized build, 'doublebuf' carry pipeline — r4 VERDICT #3) must
    produce BITWISE-identical states and losses: the Gt2YoloTarget builder
    is per-image elementwise, so only program structure may differ."""
    import jax
    import jax.numpy as jnp
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.train import make_train_step, init_train_state
    from ppyolo_tpu.train.train_step import make_multi_train_step
    from configs import PPYOLO_r18vd_Config

    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 3
    cfg.head = dict(cfg.head, num_classes=3, drop_block=False)
    cfg.gt2YoloTarget = dict(cfg.gt2YoloTarget, num_classes=3)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))

    n, b, size = 3, 2, 96
    r = np.random.RandomState(0)
    gt_bbox = np.zeros((n, b, 50, 4), np.float32)
    gt_bbox[:, :, :2, :2] = r.uniform(0.3, 0.6, (n, b, 2, 2))
    gt_bbox[:, :, :2, 2:] = r.uniform(0.1, 0.3, (n, b, 2, 2))
    gt_score = np.zeros((n, b, 50), np.float32)
    gt_score[:, :, :2] = 1.0
    batches = {
        "image": jnp.asarray(r.randint(0, 256, (n, b, size, size, 3)),
                             jnp.uint8),
        "gt_bbox": jnp.asarray(gt_bbox),
        "gt_class": jnp.asarray(r.randint(0, 3, (n, b, 50)), jnp.int32),
        "gt_score": jnp.asarray(gt_score),
    }
    rng = jax.random.PRNGKey(7)
    results = {}
    for mode in ("step", "prescan", "doublebuf"):
        fn = jax.jit(make_multi_train_step(model, cfg, n_steps=n,
                                           target_pipeline=mode))
        st = init_train_state(model, params, cfg)
        st2, losses = fn(st, batches, rng)
        results[mode] = (jax.tree.map(np.asarray, st2.params),
                         np.asarray(losses["total_loss"]))
    ref_p, ref_l = results["step"]
    for mode in ("prescan", "doublebuf"):
        p, l = results[mode]
        np.testing.assert_array_equal(ref_l, l, err_msg=mode)
        for ka, kb in zip(jax.tree.leaves(ref_p), jax.tree.leaves(p)):
            np.testing.assert_array_equal(ka, kb, err_msg=mode)
