"""Join a device trace with the compiled-HLO metadata: ms per source line.

Dev tool closing the loop between ``trace_step.py`` (which op is slow) and
``dump_step_hlo.py`` (where an op comes from): parses the newest perfetto
trace under TRACE_DIR, maps each device op name to the ``source_file`` /
``source_line`` recorded in the HLO text (HLO_TXT, default the
dump_step_hlo.py output), and prints total device milliseconds per source
location and per module.  Ops with no metadata (carries, tuples, run-id
rollups) land in ``(unattributed)``.

Usage:
    HLO_MB=128 python benchmarks/dump_step_hlo.py      # writes /tmp/step_hlo.txt
    TRACE_MB=128 python benchmarks/trace_step.py       # writes the trace
    python benchmarks/trace_attribute.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/molsde_trace")
HLO_TXT = os.environ.get("HLO_TXT", "/tmp/step_hlo.txt")
TOP = int(os.environ.get("TOP", 40))
STEPS = int(os.environ.get("TRACE_STEPS", 5))


def newest_trace() -> str:
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        sys.exit(f"no trace under {TRACE_DIR}")
    return max(files, key=os.path.getmtime)


def hlo_source_map(path: str) -> dict:
    """op name -> 'file:line' from the HLO text metadata."""
    out = {}
    pat = re.compile(r"%([\w.-]+) = .*?source_file=\"[^\"]*?([\w.]+)\" "
                     r"source_line=(\d+)")
    for line in open(path):
        m = pat.search(line)
        if m:
            out[m.group(1)] = f"{m.group(2)}:{m.group(3)}"
    return out


def main():
    src = hlo_source_map(HLO_TXT)
    path = newest_trace()
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # device lane detection: the 'XLA Ops' thread of the TPU process (same
    # heuristic as trace_categorize.py)
    names = {}
    lanes = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if ev["args"].get("name") == "XLA Ops":
                lanes.add((ev.get("pid"), ev.get("tid")))
    by_line = defaultdict(float)
    by_file = defaultdict(float)
    unattributed = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in lanes:
            continue
        name = ev.get("name", "")
        if name.startswith(("while", "jit_", "Pjit")):
            continue  # outer frames double-count their inner ops
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        total += dur
        loc = src.get(name) or src.get(name.replace("%", ""))
        if loc is None:
            unattributed[re.sub(r"[.\d]+$", "", name)] += dur
            continue
        by_line[loc] += dur
        by_file[loc.split(":")[0]] += dur

    print(f"trace: {path}")
    print(f"attributed device time: {total:.1f} ms over {STEPS} steps "
          f"({total / STEPS:.2f} ms/step)\n")
    print("-- ms/step by module --")
    for k, v in sorted(by_file.items(), key=lambda kv: -kv[1]):
        print(f"{v / STEPS:8.3f}  {k}")
    un = sum(unattributed.values())
    print(f"{un / STEPS:8.3f}  (unattributed)")
    print(f"\n-- top {TOP} source lines (ms/step) --")
    for k, v in sorted(by_line.items(), key=lambda kv: -kv[1])[:TOP]:
        print(f"{v / STEPS:8.3f}  {k}")
    print("\n-- top unattributed op families (ms/step) --")
    for k, v in sorted(unattributed.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v / STEPS:8.3f}  {k}")


if __name__ == "__main__":
    main()
