"""The HLO conv FLOP ranker (scripts/dump_step_hlo.py) against a synthetic
module — the ranking drives kernel go/no-go decisions, so its FLOP formula
(2 * out_elems * window * rhs_input_feature) is pinned here."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "dump_step_hlo",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "dump_step_hlo.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

HLO = """
HloModule test
%p0 = bf16[16,64,64,64,32] parameter(0)
%p1 = bf16[3,3,3,32,32] parameter(1)
%conv.1 = bf16[16,64,64,64,32] convolution(%p0, %p1), window={size=3x3x3 pad=1_1x1_1x1_1}, dim_labels=b012f_012io->b012f
%g = bf16[16,64,64,64,32] parameter(2)
%dw.1 = bf16[3,3,3,32,32] convolution(%p0, %g), window={size=64x64x64 pad=1_1x1_1x1_1}, dim_labels=f012b_i012o->012bf
"""


def test_flop_rank_formula(capsys):
    rows = _mod.flop_rank(HLO, top=5)
    capsys.readouterr()
    assert len(rows) == 2
    flops = {name: fl for fl, name, *_ in rows}
    # fwd conv: 2 * 16*64^3*32 (out) * 27 (window) * 32 (ci)
    assert flops["conv.1"] == 2 * 16 * 64 ** 3 * 32 * 27 * 32
    # dW conv: 2 * 27*32*32 (out) * 64^3 (window) * 16 (batch as rhs 'i')
    assert flops["dw.1"] == 2 * 27 * 32 * 32 * 64 ** 3 * 16
    # both express the same contraction — identical FLOPs
    assert flops["conv.1"] == flops["dw.1"]
