#! /usr/bin/env python
"""Render a training run's ``weights/metrics.jsonl`` to one PNG.

  python tools/plot_metrics.py --metrics weights/metrics.jsonl [--out run.png]

The trainer appends two kinds of records (train.py): per-log-interval rows
with the loss components, lr, imgs/s, TFLOP/s and MFU, and per-eval rows
with ``box_ap``.  This renders them as stacked time panels over a shared
iteration axis — losses (multi-series), lr, throughput, MFU, and eval mAP —
skipping panels whose data is absent.  The reference repo logs to stdout
only (reference train.py:447-457); this is the persistent-curves companion.
"""
import argparse
import json
import os
import sys

import numpy as np

# Categorical series colors: the dataviz default palette's fixed slot order
# (validated for adjacent-pair CVD/normal-vision separation on the light
# surface; identity is also carried by the text legend, never color alone).
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
          "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e6e4df"


def load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def series(rows, key):
    pts = [(r["iter"], r[key]) for r in rows
           if r.get(key) is not None and "iter" in r]
    if not pts:
        return None, None
    it, v = zip(*pts)
    return np.asarray(it), np.asarray(v, np.float64)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--metrics", default="weights/metrics.jsonl")
    p.add_argument("--out", default=None,
                   help="output PNG (default: <metrics dir>/metrics.png)")
    p.add_argument("--dpi", type=int, default=130)
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_rows(args.metrics)
    if not rows:
        print(f"no records in {args.metrics}", file=sys.stderr)
        return 1

    loss_keys = sorted({k for r in rows for k in r
                        if k.startswith("loss_")})
    if any("total_loss" in r for r in rows):
        loss_keys = ["total_loss"] + loss_keys

    panels = []  # (title, [(label, it, val)], yscale)
    losses = [(k, *series(rows, k)) for k in loss_keys]
    losses = [(k, it, v) for k, it, v in losses if it is not None]
    if losses:
        vmax = max(float(v.max()) for _, _, v in losses)
        vmin = min(float(v[v > 0].min()) for _, _, v in losses
                   if (v > 0).any())
        panels.append(("loss", losses,
                       "log" if vmax / max(vmin, 1e-12) > 50 else "linear"))
    for key, title in [("lr", "learning rate"),
                       ("imgs_per_sec", "throughput (imgs/s)"),
                       ("mfu", "MFU"), ("box_ap", "eval mAP (0.50:0.95)")]:
        it, v = series(rows, key)
        if it is not None:
            panels.append((title, [(title, it, v)], "linear"))

    fig, axes = plt.subplots(len(panels), 1, sharex=True,
                             figsize=(8.4, 1.9 * len(panels) + 0.9))
    axes = np.atleast_1d(axes)
    fig.patch.set_facecolor(SURFACE)
    for ax, (title, curves, yscale) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        multi = len(curves) > 1
        for i, (label, it, v) in enumerate(curves):
            ax.plot(it, v, color=SERIES[i % len(SERIES)], linewidth=1.8,
                    label=label if multi else None,
                    marker="o" if len(it) < 3 else None, markersize=4)
        ax.set_yscale(yscale)
        ax.set_title(title, loc="left", fontsize=10,
                     color=INK, fontweight="bold")
        if multi:
            # one legend row across the top, with y-headroom so it never
            # sits on a curve
            lo, hi = ax.get_ylim()
            ax.set_ylim(lo, hi * 8 if yscale == "log"
                        else hi + 0.25 * (hi - lo))
            ax.legend(loc="upper center", fontsize=7, frameon=False,
                      ncol=min(len(curves), 4), labelcolor=INK2,
                      columnspacing=1.2, handlelength=1.6)
        ax.grid(True, color=GRID, linewidth=0.7)
        ax.set_axisbelow(True)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(GRID)
        ax.tick_params(colors=INK2, labelsize=8)
    axes[-1].set_xlabel("iteration", fontsize=9, color=INK2)
    fig.tight_layout()

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.metrics)), "metrics.png")
    fig.savefig(out, dpi=args.dpi, facecolor=SURFACE)
    print(f"wrote {out} ({len(rows)} records, {len(panels)} panels)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
