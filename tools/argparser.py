"""CLI arg parsing (reference tools/argparser.py:15-58 compatible):
``--config=N`` selects the config class; ``--use_gpu`` kept for CLI parity
(device selection is JAX-managed on the TPU build)."""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")  # allow running from repo root

from configs import get_config


def str2bool(v):
    """argparse-safe bool: 'False'/'0'/'no' parse as False (type=bool treats
    any non-empty string as True — a reference-CLI parsing trap)."""
    if isinstance(v, bool):
        return v
    return str(v).lower() not in ("false", "0", "no", "off", "")


class ArgParser:
    def __init__(self, argv=None):
        p = argparse.ArgumentParser(description="PPYOLO TPU")
        p.add_argument("--use_gpu", type=str2bool, default=True,
                       help="kept for reference-CLI parity; ignored (JAX "
                            "selects the TPU/CPU backend)")
        p.add_argument("--config", type=int, default=0, choices=[0, 1, 2],
                       help="0=ppyolo_2x, 1=ppyolo_r18vd, 2=ppyolo_2x_custom")
        self.args = p.parse_args(argv)

    def get_use_gpu(self):
        return self.args.use_gpu

    def get_cfg(self):
        return get_config(self.args.config)
