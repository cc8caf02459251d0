"""Categorize device-op time in the newest perfetto trace under TRACE_DIR.

Development tool (companion to trace_step.py / trace_sampler.py): groups the
TensorCore-lane events by HLO op family (fusion, copy, convert, dot, ...)
and prints per-family totals plus the top individual ops, restricted to the
device thread so host-side python frames don't pollute the totals.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/molsde_trace")
TOP = int(os.environ.get("TOP", 30))


def newest_trace():
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        sys.exit(f"no trace under {TRACE_DIR}")
    return max(files, key=os.path.getmtime)


def family(name: str) -> str:
    # strip trailing .NNN / digits; merge obvious XLA families
    base = re.sub(r"[.\d]+$", "", name)
    if not base:
        return "run_id_rollup"
    for fam in ("fusion", "copy", "convert", "transpose", "reshape", "dot",
                "cudnn", "reduce", "broadcast", "select", "concatenate",
                "dynamic", "iota", "slice", "bitcast", "custom-call", "scan",
                "while", "all-reduce", "rng"):
        if fam in base:
            return base[:base.index(fam) + len(fam)] \
                if base.endswith(fam) else base
    return base


def main():
    path = newest_trace()
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    evs = trace.get("traceEvents", [])
    # find device threads: names on TPU traces look like "/device:TPU:0" pids
    # or "TensorFlow Op" lanes; robust approach: a thread is "device" when it
    # contains HLO-looking names (fusion.N / copy.N) and no python frames.
    meta_name = {}
    for ev in evs:
        if ev.get("ph") == "M" and ev.get("name") in ("process_name",
                                                      "thread_name"):
            key = (ev.get("pid"), ev.get("tid"), ev["name"])
            meta_name[key] = ev.get("args", {}).get("name", "")
    lane_stats = defaultdict(lambda: [0.0, 0, False])  # (pid,tid) -> dur,n,py
    for ev in evs:
        if ev.get("ph") == "X" and "dur" in ev:
            st = lane_stats[(ev.get("pid"), ev.get("tid"))]
            st[0] += ev["dur"]
            st[1] += 1
            if "$" in ev.get("name", "") or ".py" in ev.get("name", ""):
                st[2] = True
    dev_lanes = {k for k, st in lane_stats.items() if not st[2] and st[1] > 50}
    fam_tot = defaultdict(float)
    fam_cnt = defaultdict(int)
    op_tot = defaultdict(float)
    op_cnt = defaultdict(int)
    total = 0.0
    n = 0
    for ev in evs:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if (ev.get("pid"), ev.get("tid")) not in dev_lanes:
            continue
        name = ev.get("name", "?")
        if re.fullmatch(r"\d+", name):
            continue  # run-id rollups double-count their children
        fam_tot[family(name)] += ev["dur"]
        fam_cnt[family(name)] += 1
        op_tot[name] += ev["dur"]
        op_cnt[name] += 1
        total += ev["dur"]
        n += 1
    print(f"trace: {path}")
    print(f"device lanes: {sorted(dev_lanes)}")
    for k in sorted(dev_lanes):
        nm = meta_name.get((k[0], k[1], "thread_name"), "")
        pn = meta_name.get((k[0], None, "process_name"), "")
        print(f"  lane {k}: thread={nm!r} proc={pn!r} "
              f"dur={lane_stats[k][0]/1e3:.2f}ms n={lane_stats[k][1]}")
    print(f"total device op time: {total/1e3:.2f} ms over {n} events")
    print("\n-- by family --")
    for fam, dur in sorted(fam_tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur/1e3:9.2f} ms  n={fam_cnt[fam]:5d}  {fam}")
    print(f"\n-- top {TOP} individual ops --")
    for name, dur in sorted(op_tot.items(), key=lambda kv: -kv[1])[:TOP]:
        print(f"{dur/1e3:9.2f} ms  n={op_cnt[name]:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
