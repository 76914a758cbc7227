#! /usr/bin/env python
"""Back-to-back A/B of the serving dispatch scan length (bench.py GROUP).

Each dispatch pays a fixed tunnel/D2H overhead (~20 ms observed: 737 img/s
device-side vs 717 e2e at GROUP=64, r3); a longer `lax.scan` amortizes it
over more batches.  The trade: a new scan length is a fresh HLO (slow remote
compile) and a bigger device-resident input pool (GROUP x 17.7 MB @608 bf16
batch 8).  Protocol follows tools/probe_target_pipeline.py: run the
candidates, then RE-RUN THE BASELINE LAST as a same-process drift control —
day variance on this relay is +-2-4%, so only back-to-back deltas count.

Usage (TPU must be otherwise idle):
    python tools/probe_scan_group.py            # 64, 96, 128, then 64 again
    python tools/probe_scan_group.py --groups 64 128 64

Reference protocol being amortized: demo.py:120-160 (the reference times
single-image dispatches; its per-call overhead is the CUDA-stream analogue).
"""
import argparse
import contextlib
import io
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, nargs="+",
                    default=[64, 96, 128, 64],
                    help="scan lengths to time, in order (repeat the "
                         "baseline last as the drift control)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import bench

    rows = []
    for g in args.groups:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main(batch=args.batch, group=g)
        rec = json.loads(buf.getvalue().strip().splitlines()[-1])
        rows.append((g, rec["value"]))
        print(f"group {g:4d}: {rec['value']:8.2f} img/s "
              f"({rec['vs_baseline']:.1f}x baseline)", flush=True)

    base = next(v for gg, v in rows if gg == args.groups[0])
    print("\nsummary (first run of the leading group = reference):")
    for g, v in rows:
        print(f"  group {g:4d}: {v:8.2f} img/s  {100.0 * (v / base - 1):+.1f}%")


if __name__ == "__main__":
    main()
