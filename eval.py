#! /usr/bin/env python
"""COCO val mAP evaluation (reference eval.py re-built).

python eval.py --config=0
"""
import argparse
import logging
import os
import sys
from tools.argparser import str2bool

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s-%(levelname)s: %(message)s",
                    datefmt="%Y-%m-%d %H:%M:%S")
logger = logging.getLogger(__name__)


def main(type_: str = "eval"):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--use_gpu", type=str2bool, default=True)
    p.add_argument("--precision", type=str, default="fp32", choices=["fp32", "bf16", "int8"],
                   help="bf16 = ~2x faster inference (fp32 decode/NMS kept)")
    p.add_argument("--ndev", type=int, default=1,
                   help="data-parallel inference over the first N devices "
                        "(eval_batch_size must divide by N)")
    p.add_argument("--scan_group", type=int, default=1,
                   help=">1 scans that many batches per device dispatch "
                        "(amortizes dispatch latency; identical detections)")
    args = p.parse_args()
    if not args.use_gpu:  # reference --use_gpu=0 semantics: run on host CPU
        import jax
        jax.config.update("jax_platforms", "cpu")
    from configs import get_config

    return run_eval(get_config(args.config), type_=type_,
                    precision=args.precision, ndev=args.ndev,
                    scan_group=args.scan_group)


def run_eval(cfg, *, type_: str = "eval", params=None, precision: str = "fp32",
             ndev: int = 1, result_dir: str = "eval_results",
             scan_group: int = 1):
    import jax
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.checkpoint import load_params_npz
    from ppyolo_tpu.data import CocoJson, category_maps
    from ppyolo_tpu.eval import Detector, coco_eval, COCO_CLSID2CATID

    model = PPYOLO.from_config(cfg)
    if params is None:
        params = model.init(jax.random.PRNGKey(0))
        model_path = cfg.eval_cfg.get("model_path")
        if model_path and os.path.exists(model_path):
            if model_path.endswith(".pt"):
                from ppyolo_tpu.checkpoint import (load_torch_state_dict,
                                                   convert_torch_state_dict)
                params = convert_torch_state_dict(
                    load_torch_state_dict(model_path), params)
            else:
                params = load_params_npz(model_path, params)
            logger.info("loaded %s", model_path)
        else:
            logger.warning("model file %s missing - using random init",
                           model_path)

    anno_path = cfg.test_path if type_ == "test_dev" else cfg.val_path
    pre_path = cfg.test_pre_path if type_ == "test_dev" else cfg.val_pre_path
    coco = CocoJson(anno_path)
    catid2clsid, clsid2catid, _ = category_maps(coco)
    if cfg.num_classes == 80:
        clsid2catid = COCO_CLSID2CATID
    images = list(coco.dataset["images"])
    if type_ == "eval":  # keep only images with gt (reference eval.py:66-72)
        images = [im for im in images if coco.img_anns.get(im["id"])]

    mesh = None
    if ndev > 1:  # data-parallel eval — the reference is single-GPU-only
        from ppyolo_tpu.parallel import make_mesh

        assert cfg.eval_cfg["eval_batch_size"] % ndev == 0, (
            f"eval_batch_size {cfg.eval_cfg['eval_batch_size']} must divide "
            f"by --ndev {ndev}")
        # per-process mesh: each process feeds host-local numpy batches of
        # its own image shard, so the mesh must hold only addressable devices
        mesh = make_mesh(ndev, local=True)
        logger.info("data-parallel eval over %d local devices", ndev)
    det = Detector(model, params, cfg, target_size=cfg.eval_cfg["target_size"],
                   precision=precision, mesh=mesh)
    from ppyolo_tpu.eval import get_classes
    class_names = (get_classes(cfg.classes_path)
                   if os.path.exists(cfg.classes_path) else None)
    stats = coco_eval(det, images, pre_path, anno_path,
                      cfg.eval_cfg["eval_batch_size"], type_=type_,
                      result_dir=result_dir, clsid2catid=clsid2catid,
                      draw_image=cfg.eval_cfg.get("draw_image", False),
                      draw_thresh=cfg.eval_cfg.get("draw_thresh", 0.15),
                      class_names=class_names, scan_group=scan_group)
    if stats is not None:
        logger.info("box ap: %.4f", float(stats[0]))
    return stats


if __name__ == "__main__":
    main()
