"""Compare two device traces of the same program at different batch sizes.

Usage:
  python benchmarks/trace_compare.py TRACE_DIR_A TRACE_DIR_B [SCALE]

Aggregates TensorCore ops by their ``source`` attribution (the jaxpr
file:line that produced them), prints per-source time and HBM traffic at
both sizes, the time-scaling ratio vs the expected ``SCALE`` (default 4.0 =
batch ratio), and the achieved bandwidth — the tool that answers "which op
family stops scaling linearly, and is it bandwidth- or occupancy-bound?"
(round-4 investigation of the inverted batch-scaling curve, VERDICT r3 #1).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load(trace_dir):
    path = max(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                         recursive=True), key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    # device lane: thread with HLO events carrying device_duration_ps
    per_src = defaultdict(lambda: [0.0, 0, 0.0])  # dur_ms, count, bytes
    total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        src = a.get("source", "?")
        # strip the repo prefix for readability
        src = src.replace("/root/repo/", "")
        d = e["dur"] / 1e3  # us -> ms
        per_src[src][0] += d
        per_src[src][1] += 1
        per_src[src][2] += float(a.get("bytes_accessed", 0) or 0)
        total += d
    return per_src, total


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    a, ta = load(a_dir)
    b, tb = load(b_dir)
    print(f"A={a_dir}: {ta:.1f} ms   B={b_dir}: {tb:.1f} ms   "
          f"B/A={tb / ta:.2f} (expected {scale})")
    rows = []
    for src in set(a) | set(b):
        da, na, ba = a.get(src, [0.0, 0, 0.0])
        db, nb, bb = b.get(src, [0.0, 0, 0.0])
        excess = db - scale * da   # ms of super-linear excess
        bw = bb / (db * 1e-3) / 1e9 if db else 0.0  # GB/s at size B
        rows.append((excess, src, da, db, na, nb, bw))
    rows.sort(reverse=True)
    print(f"{'excess':>8} {'A ms':>8} {'B ms':>8} {'xB/A':>6} "
          f"{'nA':>5} {'nB':>5} {'GB/s@B':>7}  source")
    for excess, src, da, db, na, nb, bw in rows[:int(
            os.environ.get("TOP", 40))]:
        ratio = db / da if da else float("inf")
        print(f"{excess:8.2f} {da:8.2f} {db:8.2f} {ratio:6.2f} "
              f"{na:5d} {nb:5d} {bw:7.1f}  {src[:90]}")


if __name__ == "__main__":
    main()
