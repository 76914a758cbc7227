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


def custom_call_flops(fn, *args, **kwargs) -> list:
    """FLOPs of every Pallas kernel in the traced program.

    XLA's cost analysis reports 0 FLOPs for custom calls, so a program with
    Pallas kernels (DCN fwd/bwd, fused stem) understates MFU.  Each
    ``pallas_call`` in this repo carries a hand-derived ``CostEstimate``
    (the DESIGN.md roofline arithmetic); this walks the traced jaxpr and
    returns ``[(kernel_name, flops, interpreted), ...]`` — one entry per
    pallas_call equation, counted ONCE per syntactic occurrence exactly
    like XLA counts a scan body (callers scale by scan steps).

    ``interpreted=True`` kernels (the CPU fallback) lower to ordinary HLO
    that XLA's analysis already counts — only ``interpreted=False`` entries
    should be ADDED on top of the XLA number (``program_flops`` does this).
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return _pallas_calls(jaxpr)


def _pallas_calls(closed_jaxpr) -> list:
    """Walk an already-traced (closed) jaxpr for pallas_call equations."""
    from jax.extend import core as jex_core

    CJ, J = jex_core.ClosedJaxpr, jex_core.Jaxpr
    found = []

    def walk(jxp):
        for eqn in jxp.eqns:
            if eqn.primitive.name == "pallas_call":
                est = eqn.params.get("cost_estimate")
                kj = eqn.params.get("jaxpr")
                name = "pallas_call"
                dbg = getattr(getattr(kj, "jaxpr", kj), "debug_info", None)
                if dbg is not None and getattr(dbg, "func_name", None):
                    name = dbg.func_name
                found.append((name,
                              float(est.flops) if est is not None else 0.0,
                              bool(eqn.params.get("interpret", False))))
            for v in eqn.params.values():
                for u in (v if isinstance(v, (list, tuple)) else (v,)):
                    if isinstance(u, CJ):
                        walk(u.jaxpr)
                    elif isinstance(u, J):
                        walk(u)

    walk(closed_jaxpr.jaxpr)
    return found


def program_flops(fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one invocation of ``fn(*args)``: XLA's cost analysis of the
    lowered HLO plus the hand-derived FLOPs of every non-interpreted Pallas
    custom call (XLA reports those as 0 — the r3 MFU understatement).

    ``fn`` may be jitted or plain (it is wrapped).  Tracing only — nothing
    executes and nothing compiles on the backend.
    """
    def _flops(cost):
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        flops = cost.get("flops") if cost else None
        return float(flops) if flops else None

    try:
        jitted = fn if hasattr(fn, "trace") else jax.jit(fn)
        # ONE trace serves both consumers (the host has a single core; the
        # full train program used to be traced twice per new shape here)
        traced = jitted.trace(*args, **kwargs)
        lowered = traced.lower()
        out = _flops(lowered.cost_analysis())
        if out is None:
            # some backends (e.g. the axon TPU plugin) only expose cost
            # analysis post-compile; by the time MFU is asked for, the step
            # is already in the persistent compilation cache, so this is a
            # cache hit, not a second real compile
            out = _flops(lowered.compile().cost_analysis())
        if out is not None:
            try:
                out += sum(f for _, f, interp in _pallas_calls(traced.jaxpr)
                           if not interp)
            except Exception:
                pass  # registry is additive-only; never lose the XLA number
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
