"""Profiling helpers: HLO conv-FLOPs parser + trace/time join.

The per-conv attribution tool (tools/profile_serving.py, round-2 VERDICT
item #5) depends on parsing optimized HLO text; these tests pin the parser
against representative HLO shapes: an unfused entry-level conv, a conv
inside a fused computation (operand shapes on defining lines / signature),
and the fusion instruction credit via ``calls=``.
"""
import numpy as np

from ppyolo_tpu.utils.profiling import (conv_flops_from_hlo,
                                        conv_utilization_table)

HLO = """\
HloModule jit_wrapped, entry_computation_layout={...}

%fused_computation.7 (param_0.3: bf16[8,78,78,64], param_1.4: bf16[3,3,64,64]) -> bf16[8,76,76,64] {
  %param_0.3 = bf16[8,78,78,64]{3,2,1,0} parameter(0)
  %param_1.4 = bf16[3,3,64,64]{3,2,1,0} parameter(1)
  %convolution.12 = bf16[8,76,76,64]{3,2,1,0} convolution(%param_0.3, %param_1.4), window={size=3x3}, dim_labels=b01f_01io->b01f
  ROOT %maximum.3 = bf16[8,76,76,64]{3,2,1,0} maximum(%convolution.12, %convolution.12)
}

ENTRY %main (p0: bf16[8,304,304,3], p1: bf16[7,7,3,64]) {
  %p0 = bf16[8,304,304,3]{3,2,1,0} parameter(0)
  %p1 = bf16[7,7,3,64]{3,2,1,0} parameter(1)
  %convolution.1 = bf16[8,152,152,64]{3,2,1,0} convolution(bf16[8,304,304,3]{3,2,1,0} %p0, bf16[7,7,3,64]{3,2,1,0} %p1), window={size=7x7 stride=2x2}, dim_labels=b01f_01io->b01f
  %fusion.42 = bf16[8,76,76,64]{3,2,1,0} fusion(bf16[8,152,152,64]{3,2,1,0} %convolution.1), kind=kOutput, calls=%fused_computation.7
  ROOT %tuple.1 = (bf16[8,76,76,64]{3,2,1,0}) tuple(%fusion.42)
}
"""


def test_conv_flops_parser_entry_and_fused():
    convs = conv_flops_from_hlo(HLO)
    # unfused entry conv credited under its own name
    assert "convolution.1" in convs
    fl, label = convs["convolution.1"]
    assert fl == 2.0 * 8 * 152 * 152 * 64 * 7 * 7 * 3
    assert label == "8x152x152x64 k7x7x3"
    # fused conv credited to the fusion instruction the trace will show
    assert "fusion.42" in convs
    fl2, label2 = convs["fusion.42"]
    assert fl2 == 2.0 * 8 * 76 * 76 * 64 * 3 * 3 * 64
    assert "k3x3x64" in label2
    assert "convolution.12" not in convs


def test_conv_utilization_join():
    times = {"fusion.42": 2.0, "convolution.1": 1.0, "unrelated.5": 9.0}
    rows, n_hlo = conv_utilization_table(times, HLO, peak=100e12, repeat=4)
    assert n_hlo == 2
    assert len(rows) == 2
    # sorted by time desc: fusion.42 first
    ms, util, fl, shape, name = rows[0]
    assert name == "fusion.42" and ms == 2.0
    expect_fl = 4 * 2.0 * 8 * 76 * 76 * 64 * 3 * 3 * 64
    assert fl == expect_fl
    np.testing.assert_allclose(util, expect_fl / (2.0 / 1e3) / 100e12)
