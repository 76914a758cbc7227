"""MFU accounting (utils/mfu.py): XLA cost-analysis FLOPs + peak mapping."""
import jax
import jax.numpy as jnp
import pytest

from ppyolo_tpu.utils.mfu import mfu, peak_flops_per_chip, program_flops


def test_program_flops_counts_matmul():
    n = 256
    fn = lambda a, b: a @ b  # noqa: E731
    x = jnp.zeros((n, n), jnp.float32)
    flops = program_flops(fn, x, x)
    assert flops is not None
    assert abs(flops - 2 * n ** 3) / (2 * n ** 3) < 0.05


def test_mfu_handles_unknown_peak():
    # CPU device kind is unknown -> peak None -> mfu None (never a crash)
    assert peak_flops_per_chip(jax.devices("cpu")[0]) is None
    assert mfu(1e12, 0.1, device=jax.devices("cpu")[0]) is None
    assert mfu(None, 0.1) is None


def test_mfu_fraction():
    class FakeDev:
        device_kind = "TPU v5 lite"

    # 19.7 TFLOP in 0.1 s on one 197-TFLOP/s chip = 100%... use half
    assert mfu(9.85e12, 0.1, n_chips=1, device=FakeDev()) == pytest.approx(0.5)
    assert mfu(9.85e12, 0.1, n_chips=2, device=FakeDev()) == pytest.approx(0.25)
