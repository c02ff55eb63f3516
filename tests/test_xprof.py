"""runtime/xprof.py attribution logic on synthetic HLO text: fusions map
to phases via member-instruction source metadata, heavy opcodes dominate
mixed fusions, library frames defer to project frames, and class-span
categorization tracks the CURRENT source layout of nerfh_nff.py."""

import numpy as np

from runtime.xprof import attribute, categorize, parse_hlo

HLO = """\
HloModule jit_refine

%fused_computation.1 (p0: f32[8,128]) -> f32[8,128] {
  %p0 = f32[8,128] parameter(0)
  %sine.1 = f32[8,128] sine(%p0), metadata={op_name="embed" source_file="/root/repo/nefes_tpu/fields/embedder.py" source_line=70}
  ROOT %add.1 = f32[8,128] add(%sine.1, %p0), metadata={op_name="add" source_file="/opt/venv/lib/python3.12/site-packages/jax/_src/numpy/lax_numpy.py" source_line=10}
}

%fused_computation.2 (p1: f32[8,128]) -> f32[8,128] {
  %p1 = f32[8,128] parameter(1)
  %dot.7 = f32[8,128] dot(%p1, %p1), metadata={op_name="dense" source_file="/root/repo/nefes_tpu/ops/sorting.py" source_line=50}
  ROOT %tanh.2 = f32[8,128] tanh(%dot.7), metadata={op_name="t" source_file="/root/repo/nefes_tpu/render/compositor.py" source_line=40}
}

ENTRY %main (a: f32[8,128]) -> f32[8,128] {
  %a = f32[8,128] parameter(0)
  %fusion.1 = f32[8,128] fusion(%a), kind=kLoop, calls=%fused_computation.1
  ROOT %fusion.2 = f32[8,128] fusion(%fusion.1), kind=kOutput, calls=%fused_computation.2
}
"""


def test_parse_hlo_structure():
    idx = parse_hlo(HLO)
    assert idx.instr_op["%fusion.1"] == "fusion"
    assert idx.instr_calls["%fusion.1"] == ["%fused_computation.1"]
    assert "%sine.1" in idx.comp_members["%fused_computation.1"]
    assert idx.instr_src["%sine.1"][1] == 70


def test_attribute_phases_and_heavy_weighting():
    ops = {"%fusion.1": {"ms": 10.0, "count": 5, "hlo": "x"},
           "%fusion.2": {"ms": 20.0, "count": 5, "hlo": "y"}}
    phases, per_op = attribute(ops, HLO)
    # fusion.1: jax-internal member is dropped in favour of the project
    # source -> all 10 ms land on 'embed'
    assert phases["embed"] == 10.0
    # fusion.2: dot (weight 30) in sorting.py vs tanh (1) in compositor
    assert phases["sampling+sort"] > 18.0
    assert 0 < phases["composite"] < 2.0
    assert per_op[0][0] == 20.0  # sorted by time


def test_attribute_bytes_floor():
    # f32[8,128] = 4096 B. fusion.1 reads %a and writes its result ->
    # 8192 B per execution x count 5; fusion.2 likewise reads fusion.1.
    ops = {"%fusion.1": {"ms": 10.0, "count": 5, "hlo": "x"},
           "%fusion.2": {"ms": 20.0, "count": 5, "hlo": "y"}}
    phases, per_op, phase_bytes = attribute(ops, HLO, want_bytes=True)
    assert phase_bytes["embed"] == 2 * 4096 * 5
    # fusion.2's main phase is sampling+sort (dot weight dominates)
    assert phase_bytes["sampling+sort"] == 2 * 4096 * 5
    idx = parse_hlo(HLO)
    assert idx.instr_bytes["%fusion.1"] == 4096
    assert idx.instr_operands["%fusion.2"] == ["%fusion.1"]


def test_categorize_tracks_source_layout():
    # find the REAL current line of FusionNet's conv in nerfh_nff.py —
    # the categorizer must follow the file as it shifts between rounds
    path = "nefes_tpu/fields/nerfh_nff.py"
    src = open(path).read().splitlines()
    fusion_line = next(i + 1 for i, l in enumerate(src)
                       if "class FusionNet" in l) + 2
    expo_line = next(i + 1 for i, l in enumerate(src)
                     if "class ExposureMLP" in l) + 2
    mlp_line = next(i + 1 for i, l in enumerate(src)
                    if "class NeRFHNFF" in l) + 2
    assert categorize((path, fusion_line)) == "fusion_net"
    assert categorize((path, expo_line)) == "exposure"
    assert categorize((path, mlp_line)) == "field_mlp"
    assert categorize(("/x/optax/_src/transform.py", 5)) == "optimizer"
    assert categorize(None) == "uncategorized"
