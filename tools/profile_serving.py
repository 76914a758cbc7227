#! /usr/bin/env python
"""Per-op / per-conv profile of the serving program (round-2 VERDICT #5).

  python tools/profile_serving.py --config=0 [--batch 8] [--size 608]
      [--precision bf16] [--stage full|backbone|head] [--iters 8]

Three outputs:
  1. stage ablation: backbone / +head / +decode+NMS wall ms per batch
     (in-graph scan repetition so the ~28 ms tunnel dispatch amortizes);
  2. hot-op table from a jax.profiler device trace of the chosen stage;
  3. per-conv MXU-utilization table: convolution instructions are parsed
     out of the optimized HLO (output/operand shapes -> FLOPs) and joined
     against the trace's per-instruction device times; utilization =
     achieved FLOP/s vs the chip's bf16 peak.

The per-conv join is best-effort (XLA may fuse a conv with its epilogue;
the fused op inherits the conv's name on TPU), but it is exactly the
attribution round 2 lacked when it wrote '~47% MXU' without naming convs.
"""
import argparse
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ppyolo_tpu.utils.profiling import (trace_op_times, conv_flops_from_hlo,
                                        conv_utilization_table)

PEAK_BF16 = 197e12   # v5e chip peak
PEAK_FP32 = 49e12


def main():
    from tools.argparser import str2bool

    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--use_gpu", type=str2bool, default=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=608)
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--scan", type=int, default=32,
                   help="in-graph repetitions per timing dispatch")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--stage", default="full",
                   choices=["full", "backbone", "head"])
    p.add_argument("--trace_dir", default="/tmp/ppyolo_serving_trace")
    p.add_argument("--skip_ablation", action="store_true")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()
    if not args.use_gpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from configs import get_config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.ops.module import Ctx
    from ppyolo_tpu.eval.optimize import optimize_for_inference

    cfg = get_config(args.config)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.float32
    if args.precision == "bf16":
        params = optimize_for_inference(params, precision="bf16", fold_bn=True)
        dtype = jnp.bfloat16
    else:
        params = optimize_for_inference(params, precision="fp32", fold_bn=True)

    rng = np.random.RandomState(0)
    b, s, n = args.batch, args.size, args.scan
    # DISTINCT data per scan iteration (loop-invariant inputs let XLA hoist
    # the whole body out of the scan — measured: backbone "0.01 ms")
    images_scan = jnp.asarray(rng.rand(n, b, s, s, 3), dtype)
    sizes_scan = jnp.asarray(
        np.tile([[480.0, 640.0]], (n, b, 1)).astype(np.float32))
    ctx = Ctx(train=False)

    stages = {
        "backbone": lambda im, sz: model.features(params, im, ctx),
        "head": lambda im, sz: model.outputs(params, im, ctx),
        "full": lambda im, sz: model.predict(params, im, sz, ctx),
    }

    def scan_of(fn):
        """Scan fn over the n input slices; only the LAST output is kept
        (as the loop carry — materializing every iteration's feature maps
        would blow HBM for the backbone stage), and the caller receives a
        SCALAR reduction of it: np.asarray on a backbone feature map would
        drag ~47 MB through the ~40 MB/s tunnel and dominate the timing.
        Device time per batch = wall / n with the dispatch amortized."""
        def wrapped(ims, szs):
            def body(carry, xs):
                return fn(*xs), None
            init = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype),
                jax.eval_shape(fn, ims[0], szs[0]))
            last, _ = jax.lax.scan(body, init, (ims, szs))
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(last))
        return wrapped

    jits = {}

    def get_stage(name):
        if name not in jits:
            jits[name] = jax.jit(scan_of(stages[name]))
        return jits[name]

    def sync(out):
        np.asarray(out)  # scalar D2H — the only reliable sync on this relay

    def time_stage(name):
        f = get_stage(name)
        sync(f(images_scan, sizes_scan))  # compile + warm
        best = 1e9
        for _ in range(args.iters):
            t0 = time.time()
            sync(f(images_scan, sizes_scan))
            best = min(best, (time.time() - t0) / n)
        return best * 1000.0

    if not args.skip_ablation:
        t_bb = time_stage("backbone")
        t_head = time_stage("head")
        t_full = time_stage("full")
        print(f"ablation b{b}@{s} {args.precision} (ms/batch, scan {args.scan}):")
        print(f"  backbone          {t_bb:8.2f}")
        print(f"  +head (raw maps)  {t_head:8.2f}  (+{t_head - t_bb:.2f})")
        print(f"  +decode+NMS       {t_full:8.2f}  (+{t_full - t_head:.2f})")
        print(f"  imgs/s e2e        {1000.0 * b / t_full:8.1f}")

    # ---- device trace of the chosen stage (reuses the compiled callable)
    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)  # stale traces sum in
    jstage = get_stage(args.stage)
    sync(jstage(images_scan, sizes_scan))
    jax.profiler.start_trace(args.trace_dir)
    sync(jstage(images_scan, sizes_scan))
    jax.profiler.stop_trace()
    times = trace_op_times(args.trace_dir)

    print(f"\nhot ops ({args.stage}, one scan-{args.scan} dispatch):")
    shown = 0
    total_ms = sum(v for k, v in times.items()
                   if not (k.startswith("$") or k.isdigit()))
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        if k.startswith("$") or k.isdigit() or "Function" in k:
            continue
        print(f"  {v:9.2f} ms  {v / max(total_ms, 1e-9):6.1%}  {k}")
        shown += 1
        if shown >= args.top:
            break

    # ---- per-conv utilization: join HLO conv FLOPs with trace times
    # (.lower() retraces but .compile() hits the XLA compilation cache)
    hlo = (get_stage(args.stage).lower(images_scan, sizes_scan)
           .compile().as_text())
    peak = PEAK_BF16 if args.precision == "bf16" else PEAK_FP32
    rows, n_hlo = conv_utilization_table(times, hlo, peak=peak,
                                         repeat=args.scan)
    if rows:
        print(f"\nper-conv utilization ({args.stage}; {len(rows)} convs "
              f"matched of {n_hlo} in HLO; peak {peak / 1e12:.0f} TF):")
        print(f"  {'ms':>9} {'util':>6}  {'GFLOP':>8}  shape")
        for ms, util, fl, shape, key in rows[:args.top]:
            print(f"  {ms:9.2f} {util:6.1%}  {fl / 1e9:8.1f}  {shape}  ({key})")
        tot_ms = sum(r[0] for r in rows)
        tot_fl = sum(r[2] for r in rows)
        print(f"  convs total: {tot_ms:.2f} ms, {tot_fl / 1e12:.2f} TFLOP, "
              f"mean util {tot_fl / (tot_ms / 1e3) / peak:.1%}")
    else:
        print("\n(no conv instructions matched trace names; inspect "
              f"{args.trace_dir} + HLO manually)")

    # ---- non-conv hot ops: attribute to repo source via HLO metadata
    conv_names = {r[4] for r in rows}
    src_pat = re.compile(
        r"%?([\w.\-]+) = (\S+?)\{?[^=]*? (?:fusion|copy|custom-call|sort|"
        r"reduce|slice|reshape|convert|transpose|concatenate|select-and-"
        r"scatter|dynamic-slice|dynamic-update-slice|iota|broadcast|pad)\(")
    meta_pat = re.compile(
        r'op_name="([^"]*)"(?:.*?source_file="([^"]*)".*?source_line=(\d+))?')
    info = {}
    for line in hlo.splitlines():
        ls = line.strip()
        if " = " not in ls:
            continue
        nm = ls.split(" = ", 1)[0].lstrip("%")
        shape = ls.split(" = ", 1)[1].split(" ", 1)[0]
        m = meta_pat.search(ls)
        if m:
            op, sf, sl = m.groups()
            tail = op.split("/")[-1]
            loc = f"{sf.split('/')[-1]}:{sl}" if sf else ""
            info[nm] = (shape, tail, loc)
        else:
            info.setdefault(nm, (shape, "", ""))
    print(f"\ntop non-conv ops with source attribution:")
    shown = 0
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        base = k.split("/")[-1]
        if (k.startswith("$") or k.isdigit() or "Function" in k
                or "asarray" in k or base in conv_names or k in conv_names
                or base.startswith("while") or base.startswith("jit_")):
            continue
        shape, op, loc = info.get(base, ("?", "", ""))
        print(f"  {v:9.2f} ms  {base:32s} {shape:28s} {op:22s} {loc}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
