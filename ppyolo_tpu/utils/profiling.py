"""Profiling hooks: jax.profiler traces + simple wall-clock timers.

The reference has only wall-clock instrumentation (SURVEY.md §5).  The TPU
build adds real device traces: wrap any region in ``trace(logdir)`` and view
in TensorBoard/XProf, or use ``device_timer`` for synced wall-clock of a
jitted callable (forces one tiny D2H per call — on the axon relay this is
the only reliable sync primitive; block_until_ready does not round-trip)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ppyolo_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(logdir: str, top: int = 25):
    """Aggregate per-op device time from a jax.profiler trace directory.

    Returns [(name, total_ms)] sorted desc — the quick hot-op view used to
    find the NMS sort and DCN gather bottlenecks (docs/DESIGN.md)."""
    import collections
    import glob
    import gzip
    import json

    dur: "collections.Counter[str]" = collections.Counter()
    for f in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                n = ev.get("name", "?")
                if (n.startswith("$") or n.isdigit() or "Function" in n
                        or "asarray" in n or n.startswith("np.")):
                    continue
                dur[n] += ev["dur"]
    return [(name, d / 1000.0) for name, d in dur.most_common(top)]


def trace_op_times(logdir: str):
    """{instruction_name: total_ms} from a jax.profiler trace directory,
    keeping full per-instruction names (no aggregation across instances) —
    the join key for per-conv attribution (tools/profile_serving.py)."""
    import collections
    import glob
    import gzip
    import json

    dur: "collections.Counter[str]" = collections.Counter()
    for f in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                dur[ev.get("name", "?")] += ev["dur"]
    return {k: v / 1000.0 for k, v in dur.items()}


def conv_flops_from_hlo(hlo_text: str):
    """Convolution FLOPs per TRACE-VISIBLE instruction name from optimized
    HLO text: {name: (flops, 'NxOHxOWxCout kKHxKWxCin')}.

    On TPU almost every conv is wrapped in a fusion instruction (the trace
    shows ``fusion.N``, not ``convolution.M``), and inside fused-computation
    bodies conv operands are bare names whose shapes live on their defining
    lines / the computation signature.  So: walk computations, record every
    definition's shape, compute each conv's FLOPs (b01f_01io assumed --
    repo-wide NHWC/HWIO; other dim_labels are skipped, not mis-counted),
    then credit the fusion instruction that ``calls=`` the computation.
    """
    import re

    def_pat = re.compile(r"%?([\w.\-]+) = (\w+)\[([\d,]*)\]")
    sig_pat = re.compile(r"([\w.\-]+): \w+\[([\d,]*)\]")
    conv_pat = re.compile(
        r"%?([\w.\-]+) = \w+\[([\d,]*)\]\S* convolution\(([^)]*)\)(.*)")
    call_pat = re.compile(r"calls=%?([\w.\-]+)")
    comp_pat = re.compile(r"^(?:ENTRY )?%?([\w.\-]+)\b.*\{$")

    comp = "?"
    shapes = {}          # (comp, name) -> [dims]
    convs = []           # (comp, conv_name, out_dims, operand_names, rest)
    fusion_of = {}       # computation name -> fusion instruction name
    for raw in hlo_text.splitlines():
        line = raw.strip()
        m = comp_pat.match(line)
        if m and " = " not in line:
            comp = m.group(1)
            for nm, dims in sig_pat.findall(line):
                try:
                    shapes[(comp, nm)] = [int(v) for v in dims.split(",") if v]
                except ValueError:
                    pass
            continue
        m = def_pat.match(line)
        if m:
            nm, _dt, dims = m.groups()
            try:
                shapes[(comp, nm)] = [int(v) for v in dims.split(",") if v]
            except ValueError:
                pass
        m = conv_pat.match(line)
        if m:
            nm, odims, operands, rest = m.groups()
            # operand names: "%p0" refs (entry level carries inline shapes
            # whose commas break a naive split); fall back to stripping
            # bracketed segments when names are unprefixed
            ops = re.findall(r"%([\w.\-]+)", operands)
            if len(ops) < 2:
                clean = re.sub(r"\[[^\]]*\]|\{[^}]*\}", "", operands)
                ops = [p.split()[-1] for p in clean.split(",") if p.strip()]
            try:
                out_dims = [int(v) for v in odims.split(",") if v]
            except ValueError:
                continue
            convs.append((comp, nm, out_dims, ops, rest))
        if " fusion(" in line:
            dm = def_pat.match(line)
            cm = call_pat.search(line)
            if dm and cm:
                fusion_of[cm.group(1)] = dm.group(1)

    out = {}

    def credit(name, flops, label):
        if name in out:
            f0, l0 = out[name]
            out[name] = (f0 + flops, l0 + " + " + label)
        else:
            out[name] = (flops, label)

    for comp_name, nm, o, ops, _rest in convs:
        if len(o) != 4 or len(ops) < 2:
            continue
        w = shapes.get((comp_name, ops[1]))
        if w is None or len(w) != 4:
            continue
        n, oh, ow, cout = o
        kh, kw, cin, cout2 = w
        if cout2 != cout:
            continue
        flops = 2.0 * n * oh * ow * cout * kh * kw * cin
        label = f"{n}x{oh}x{ow}x{cout} k{kh}x{kw}x{cin}"
        # credit the trace-visible instruction: the fusion wrapping this
        # computation, or the conv itself when unfused (entry-level)
        credit(fusion_of.get(comp_name, nm), flops, label)
    return out


def conv_utilization_table(times: dict, hlo_text: str, *, peak: float,
                           repeat: int = 1):
    """Join trace times with HLO conv FLOPs -> rows of
    (ms, util, flops, shape, name) sorted by time desc.  ``repeat`` scales
    FLOPs when the traced program ran the conv ``repeat`` times (lax.scan)."""
    convs = conv_flops_from_hlo(hlo_text)
    rows = []
    for name, ms in times.items():
        base = name.split("/")[-1]
        for key in (name, base):
            if key in convs:
                fl, shape = convs[key]
                rows.append((ms, fl * repeat / (ms / 1e3) / peak,
                             fl * repeat, shape, key))
                break
    return sorted(rows, key=lambda r: -r[0]), len(convs)


def timeit_sync(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Mean seconds/call of a jitted fn, syncing via np.asarray on a leaf."""
    import jax

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        sync(fn(*args))
    return (time.time() - t0) / iters
