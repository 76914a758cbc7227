"""Model-FLOPs-utilization accounting.

The reference logs only imgs/s (train.py:447-457) — "fast" is never related
to what the hardware could do.  Here every compiled program can report its
FLOP count (from XLA's own cost analysis of the lowered HLO) and the train
loop/bench relate measured step time to the chip's peak matmul throughput.

MFU = (program FLOPs / step seconds) / peak FLOP/s.  For a conv detector the
number is dominated by conv-as-matmul work on the MXU; fp32-pinned epilogues
(decode/NMS/loss) contribute <1% of FLOPs.
"""
from __future__ import annotations

from typing import Optional

import jax

# peak dense matmul FLOP/s (bf16 with fp32 accumulate) per chip
_PEAK_BY_KIND = (
    ("v6e", 918e12),
    ("v6 lite", 918e12),
    ("v5p", 459e12),
    ("v5e", 197e12),
    ("v5 lite", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def peak_flops_per_chip(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s of one chip, or None when unknown (e.g. CPU)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for tag, peak in _PEAK_BY_KIND:
        if tag in kind:
            return peak
    return None


def program_flops(fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one invocation of ``fn(*args)`` per XLA's cost analysis.

    ``fn`` may be jitted or plain (it is wrapped).  Tracing only — nothing
    executes and nothing compiles on the backend.
    """
    def _flops(cost):
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        flops = cost.get("flops") if cost else None
        return float(flops) if flops else None

    try:
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        lowered = jitted.lower(*args, **kwargs)
        out = _flops(lowered.cost_analysis())
        if out is None:
            # some backends (e.g. the axon TPU plugin) only expose cost
            # analysis post-compile; by the time MFU is asked for, the step
            # is already in the persistent compilation cache, so this is a
            # cache hit, not a second real compile
            out = _flops(lowered.compile().cost_analysis())
        return out
    except Exception:
        return None


def mfu(flops_per_step: Optional[float], step_seconds: float,
        n_chips: int = 1, device: Optional[jax.Device] = None) -> Optional[float]:
    """Achieved fraction of peak (0..1), or None when peak/flops unknown."""
    peak = peak_flops_per_chip(device)
    if not flops_per_step or not peak or step_seconds <= 0:
        return None
    return flops_per_step / step_seconds / (peak * n_chips)
