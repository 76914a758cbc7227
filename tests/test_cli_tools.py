"""CLI tool drives: convert_weights on a real torch .pt, draw_gt rendering."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_weights_cli_torch_pt(tmp_path):
    torch = pytest.importorskip("torch")
    import jax
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.ops.module import flatten_tree
    from configs import PPYOLO_r18vd_Config

    # fabricate a reference-style .pt (state_dict with OIHW conv weights)
    cfg = PPYOLO_r18vd_Config()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    sd = {}
    for k, v in flatten_tree(params).items():
        v = np.asarray(v)
        shape = ((v.shape[3], v.shape[2], v.shape[0], v.shape[1])
                 if v.ndim == 4 else v.shape)
        sd[k] = torch.tensor(rng.randn(*shape).astype(np.float32))
    src = str(tmp_path / "ppyolo_r18vd.pt")
    torch.save(sd, src)

    out = str(tmp_path / "ppyolo_r18vd.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_weights.py"),
         "--config=1", "--src", src, "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    data = np.load(out)
    k = "backbone.stage2_0.conv1.conv.weight"
    np.testing.assert_allclose(
        data[k], sd[k].numpy().transpose(2, 3, 1, 0), rtol=1e-6)


def test_draw_gt_cli(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.random.RandomState(0).randint(0, 255, (80, 100, 3)).astype(np.uint8)
    cv2.imwrite(str(img_dir / "a.jpg"), img)
    anno = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 80}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [10, 10, 40, 30], "area": 1200, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "thing"}],
    }
    anno_path = tmp_path / "gt.json"
    anno_path.write_text(json.dumps(anno))
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "draw_gt.py"),
         "--anno", str(anno_path), "--pre_path", str(img_dir) + "/",
         "--out_dir", str(out_dir)],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    drawn = cv2.imread(str(out_dir / "a.jpg"))
    assert drawn is not None
    assert not np.array_equal(drawn, img)  # boxes actually rendered


def test_run_real_weights_cli(tmp_path):
    """The north-star one-command runner (tools/run_real_weights.py) drives
    convert -> eval end-to-end from a REAL-format .pdparams (fabricated
    weights, fluid.save serialization) on a synthetic val set — so the
    moment the true pretrained files appear, this path is known-good."""
    import pickle
    from tests.test_integration import _make_dataset
    from tests.test_checkpoint import fabricate_paddle_sd
    from configs import PPYOLO_r18vd_Config
    from ppyolo_tpu.models import PPYOLO

    anno_path, img_dir = _make_dataset(str(tmp_path), n_images=4)
    model = PPYOLO.from_config(PPYOLO_r18vd_Config())
    sd = fabricate_paddle_sd(model, seed=3)
    wpath = tmp_path / "fake.pdparams"
    with open(wpath, "wb") as f:
        pickle.dump(sd, f, protocol=2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # CPU forcing happens via jax.config.update in the -c preamble
    # (JAX_PLATFORMS env is ignored under the axon sitecustomize)
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['x','--config','1',"
         f"'--weights',{str(wpath)!r},'--val_json',{anno_path!r},"
         f"'--val_images',{img_dir!r},'--sizes','96',"
         f"'--converted_out',{str(tmp_path / 'conv.npz')!r}];"
         "import runpy; runpy.run_path('tools/run_real_weights.py',"
         "run_name='__main__')"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "converted" in r.stdout
    assert '"mAP"' in r.stdout
    # fabricated random weights on synthetic data: any finite mAP; the
    # wiring (convert + full eval stack + verdict print) is what's tested
    assert "config 1 @96: mAP" in r.stdout


def test_plot_metrics_cli(tmp_path):
    """tools/plot_metrics.py renders a metrics.jsonl (loss rows + eval rows,
    incl. a null tflops/mfu like the CPU trainer writes) to a PNG."""
    rows = []
    for it in (20, 40, 60):
        rows.append({"iter": it, "time": it * 0.05, "total_loss": 100.0 / it,
                     "loss_xy": 1.0 / it, "loss_obj": 90.0 / it, "lr": 1e-3,
                     "imgs_per_sec": 300.0, "tflops": None, "mfu": None})
    rows.append({"iter": 60, "time": 3.0, "box_ap": 0.25})
    mpath = tmp_path / "metrics.jsonl"
    mpath.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    out = tmp_path / "curves.png"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_metrics.py"),
         "--metrics", str(mpath), "--out", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists() and out.stat().st_size > 10_000
    assert "4 panels" in r.stdout  # loss, lr, throughput, eval mAP (no MFU)


def test_bench_loader_serving_cli(tmp_path):
    """tools/bench_loader.py --serving measures the inference host chain
    (decode + BGR->RGB + u8 resize) and prints the machine-readable JSON
    line with decode/resize attribution and cores-per-chip sizing."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_loader.py"),
         "--serving", "--n_images", "4", "--batches", "2",
         "--batch_size", "2", "--device_img_s", "745",
         "--target_size", "320"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["metric"] == "serving_prep_imgs_per_sec_per_core"
    assert row["value"] > 0 and row["cores_per_chip"] > 0
    assert row["decode_ms"] > 0 and row["resize_ms"] > 0
