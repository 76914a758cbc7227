#! /usr/bin/env python
"""Export a self-contained serving artifact (StableHLO, weights baked in).

  python tools/export_serving.py --config=0 --src ppyolo_2x.npz \
      --out ppyolo_2x_608_b8.shlo --batch 8 [--size 608] [--precision bf16] \
      [--platforms tpu,cpu]

Serve it with nothing but jax:

  from ppyolo_tpu.eval.export import load_serving_file
  serve = load_serving_file("ppyolo_2x_608_b8.shlo")
  dets = serve(images_u8, im_size)     # [B, 100, 6], -1-padded
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--src", default="", help="weights .npz (random init if empty)")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=0, help="0 = config test size")
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    p.add_argument("--dcn", default="onehot",
                   choices=["onehot", "gather", "pallas"],
                   help="DCN formulation in the artifact (onehot = pure "
                        "StableHLO, portable; pallas = mosaic custom-call, "
                        "fastest but tied to the exporting libtpu)")
    from tools.argparser import str2bool

    p.add_argument("--use_gpu", type=str2bool, default=True)
    args = p.parse_args()
    if not args.use_gpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from configs import get_config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.eval.detector import Detector
    from ppyolo_tpu.eval.export import export_detector, save_serving
    from ppyolo_tpu.checkpoint import load_params_npz

    cfg = get_config(args.config)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if args.src:
        params = load_params_npz(args.src, params)
    det = Detector(model, params, cfg, precision=args.precision,
                   target_size=args.size or None)
    platforms = [s for s in args.platforms.split(",") if s] or None
    data = export_detector(det, batch=args.batch, platforms=platforms,
                           dcn=args.dcn)
    save_serving(args.out, data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB, batch={args.batch}, "
          f"size={det.target_size}, precision={args.precision}, "
          f"dcn={args.dcn}, platforms={platforms or [jax.default_backend()]}")


if __name__ == "__main__":
    main()
