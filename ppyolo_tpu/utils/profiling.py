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
