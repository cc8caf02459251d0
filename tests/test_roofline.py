"""Unit tests for the roofline tooling parsers (round-5 evidence chain:
dump_step_hlo.py -> trace_step.py -> roofline.py).  The HLO shape/operand
parsing is pure string work — pin it on a synthetic HLO snippet so the
bytes-floor argument in README stays reproducible."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))


def test_shape_bytes():
    from benchmarks.dump_step_hlo import shape_bytes

    assert shape_bytes("f32[256,32,128]{2,1,0:T(8,128)}") == 256 * 32 * 128 * 4
    assert shape_bytes("bf16[128,1024,128]{2,1,0}") == 128 * 1024 * 128 * 2
    assert shape_bytes("pred[7]{0}") == 7
    assert shape_bytes("s32[]") == 1 * 4  # scalar: empty dims -> one element
    assert shape_bytes("(f32[2,2], s32[4])") == 0  # tuples unparsable -> 0


def test_parse_hlo_operand_bytes(tmp_path):
    from benchmarks.roofline import parse_hlo

    hlo = """
HloModule jit_step
ENTRY %main (p0: f32[8,16]) -> f32[8,16] {
  %p0 = f32[8,16]{1,0} parameter(0)
  %c1 = f32[] constant(2)
  %bcast = f32[8,16]{1,0} broadcast(%c1), dimensions={}
  %mul = f32[8,16]{1,0} multiply(%p0, %bcast), metadata={op_name="x"}
  ROOT %add.1 = f32[8,16]{1,0} add(%mul, %p0)
}
"""
    p = tmp_path / "hlo.txt"
    p.write_text(hlo)
    table = parse_hlo(str(p))
    # parameter/constant are skipped; compute ops are present
    assert "p0" not in table and "c1" not in table
    out_b, in_b, opcode = table["mul"]
    assert opcode == "multiply"
    assert out_b == 8 * 16 * 4
    assert in_b == 2 * 8 * 16 * 4  # two distinct f32[8,16] operands
    out_b, in_b, opcode = table["add.1"]
    assert opcode == "add" and out_b == 8 * 16 * 4
