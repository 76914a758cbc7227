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
