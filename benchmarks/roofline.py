"""Per-op HBM roofline: join a device trace with the compiled HLO's shapes.

VERDICT r4 #5 asks either ≤17 ms/step @256 or a committed bytes-moved
roofline showing the remaining step time is HBM-bound.  This tool produces
that argument from ground truth:

1. ``dump_step_hlo.py`` writes the compiled step HLO (op -> output shape,
   operand names) to HLO_TXT.
2. ``trace_step.py`` writes a device trace (op -> total duration).
3. This script builds an op->shape symbol table from the HLO, estimates
   per-op HBM traffic as output bytes + sum of distinct operand bytes
   (the standard fusion lower bound: every operand read once, output
   written once), joins with the trace durations, and prints per-op and
   aggregate effective GB/s against the chip's HBM bandwidth.

An op running at >=70% of peak HBM bandwidth cannot be made meaningfully
faster without moving fewer bytes; the aggregate "time-weighted %% of
device time at >=X%% of BW roofline" line is the step-level verdict.

Usage:
    HLO_MB=128 python benchmarks/dump_step_hlo.py
    TRACE_MB=128 python benchmarks/trace_step.py
    python benchmarks/roofline.py          # HBM_GBPS=819 default (v5e)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dump_step_hlo import shape_bytes  # noqa: E402

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/molsde_trace")
HLO_TXT = os.environ.get("HLO_TXT", "/tmp/step_hlo.txt")
HBM_GBPS = float(os.environ.get("HBM_GBPS", 819.0))  # v5e HBM2E
MXU_TFLOPS = float(os.environ.get("MXU_TFLOPS", 197.0))  # v5e bf16 peak
TRACE_STEPS = int(os.environ.get("TRACE_STEPS", 5))
TOP = int(os.environ.get("TOP", 30))

# ops whose "bytes" estimate is meaningless (control flow, tuples)
_SKIP = {"tuple", "get-tuple-element", "parameter", "constant", "while",
         "conditional", "call", "after-all", "partition-id"}


def parse_hlo(path: str):
    """op name -> (output_bytes, operand_bytes_sum, opcode).

    Handles both top-level entry ops and ops inside (non-fused) nested
    computations; fused computations' internals are skipped — the fusion
    op itself carries the operand list that matters for HBM traffic."""
    shapes = {}     # %name -> output shape string
    lines = open(path).read().splitlines()
    op_re = re.compile(
        r"\s*(?:ROOT )?(%?[\w.-]+) = (\([^)]*\)|\S+) ([\w-]+)\((.*)")
    entries = []
    for line in lines:
        m = op_re.match(line)
        if not m:
            continue
        name, shape, opcode, rest = m.groups()
        name = name.lstrip("%")
        if not shape.startswith("("):
            shapes[name] = shape
        entries.append((name, shape, opcode, rest))
    table = {}
    for name, shape, opcode, rest in entries:
        if opcode in _SKIP:
            continue
        out_b = 0
        if shape.startswith("("):
            # tuple output (e.g. fusion with multiple results)
            out_b = sum(shape_bytes(s.strip())
                        for s in shape[1:-1].split(","))
        else:
            out_b = shape_bytes(shape)
        # distinct operand names before any ), kind=/metadata suffix
        ops_str = rest.split("),")[0]
        operand_names = set(re.findall(r"%([\w.-]+)", ops_str))
        in_b = sum(shape_bytes(shapes.get(o, "")) for o in operand_names)
        table[name] = (out_b, in_b, opcode)
    return table


def trace_durations(trace_dir: str):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        sys.exit(f"no trace under {trace_dir}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    durs = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            if name.startswith("$") or " " in name or "(" in name:
                continue  # host frames / jit wrappers
            durs[name] += ev["dur"]
    return path, durs


def main():
    table = parse_hlo(HLO_TXT)
    tpath, durs = trace_durations(TRACE_DIR)
    print(f"hlo: {HLO_TXT} ({len(table)} ops); trace: {tpath}")

    rows = []
    matched_us = unmatched_us = 0.0
    for name, us in durs.items():
        ent = table.get(name)
        if ent is None:
            unmatched_us += us
            continue
        matched_us += us
        out_b, in_b, opcode = ent
        bts = out_b + in_b
        sec = us / 1e6 / TRACE_STEPS
        gbps = bts / sec / 1e9 if sec > 0 else 0.0
        rows.append((us / TRACE_STEPS, bts, gbps, opcode, name))
    rows.sort(reverse=True)

    print(f"device time: {matched_us / 1e3 / TRACE_STEPS:.2f} ms/step "
          f"matched to HLO, {unmatched_us / 1e3 / TRACE_STEPS:.2f} ms/step "
          f"unmatched (carries, run-id rollups)")
    print(f"\n{'us/step':>9} {'MB':>8} {'GB/s':>7} {'%BW':>5}  op")
    for us, bts, gbps, opcode, name in rows[:TOP]:
        print(f"{us:9.1f} {bts / 1e6:8.2f} {gbps:7.1f} "
              f"{100 * gbps / (HBM_GBPS):5.1f}  {name[:80]}")

    # aggregate verdict: share of matched device time at >= X% of BW roofline
    total = sum(r[0] for r in rows) or 1.0
    for thresh in (0.5, 0.7, 0.9):
        t = sum(us for us, _, gbps, _, _ in rows
                if gbps >= thresh * HBM_GBPS)
        print(f"time at >={100 * thresh:.0f}% of {HBM_GBPS:.0f} GB/s HBM "
              f"roofline: {t / 1e3:.2f} ms/step ({100 * t / total:.1f}% of "
              f"matched)")
    bytes_total = sum(bts * TRACE_STEPS for _, bts, _, _, _ in rows)
    floor_ms = bytes_total / TRACE_STEPS / (HBM_GBPS * 1e9) * 1e3
    print(f"\nbytes-moved floor: {bytes_total / TRACE_STEPS / 1e9:.3f} GB/step"
          f" / {HBM_GBPS:.0f} GB/s = {floor_ms:.2f} ms/step minimum "
          f"(vs {total / 1e3:.2f} ms/step matched device time -> "
          f"{100 * floor_ms / (total / 1e3):.1f}% HBM-bound overall)")


if __name__ == "__main__":
    main()
