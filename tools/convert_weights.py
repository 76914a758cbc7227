#! /usr/bin/env python
"""Convert reference checkpoints into the TPU build's .npz format.

Replaces 1_ppyolo_2x_2pytorch.py / 1_ppyolo_r18vd_2pytorch.py: reads either
the Paddle ``ppyolo.pdparams`` (name contract of the reference converters)
or the reference's produced ``ppyolo_2x.pt`` torch state_dict (path-identical
to our tree), and writes ``<out>.npz``.

  python tools/convert_weights.py --config=0 --src ppyolo.pdparams --out ppyolo_2x.npz
  python tools/convert_weights.py --config=1 --src ppyolo_r18vd.pt  --out ppyolo_r18vd.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_classes", type=int, default=80,
                   help="pretrained checkpoints are COCO-80 "
                        "(reference converter forces 80)")
    args = p.parse_args()

    import jax

    # pure tensor renaming/transposes — never worth an accelerator, and on
    # tunneled TPU runtimes platform init alone can take minutes
    jax.config.update("jax_platforms", "cpu")
    from configs import get_config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.checkpoint import (
        load_torch_state_dict, convert_torch_state_dict,
        load_paddle_state_dict, convert_paddle_state_dict, save_params_npz)

    cfg = get_config(args.config)
    cfg.num_classes = args.num_classes
    cfg.head = dict(cfg.head, num_classes=args.num_classes)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))

    if args.src.endswith(".pt"):
        params = convert_torch_state_dict(load_torch_state_dict(args.src), params)
    else:
        params = convert_paddle_state_dict(
            load_paddle_state_dict(args.src), model, params)
    save_params_npz(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
