"""Capture a jax.profiler trace of the PC sampler scan and summarize hot ops.

Development tool (pattern of trace_step.py): writes a trace under
/tmp/molsde_trace_sampler and prints the top-k ops by total duration from
the perfetto json — the standalone timings in profile_sampler.py are bounded
below by the tunnel round-trip (~3ms), so only a device trace localizes the
in-scan cost.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D
from moleculesde_tpu.sampling import sample_positions_pc

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/molsde_trace_sampler")
BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
SCAN_STEPS = int(os.environ.get("SCAN_STEPS", 50))


SCORE_DTYPE = os.environ.get("SCORE_DTYPE", "float32")
LAYOUT = os.environ.get("SAMPLER_LAYOUT", "channel")


def main():
    print(f"devices: {jax.devices()}")
    print(f"score_dtype={SCORE_DTYPE} layout={LAYOUT}")
    model = SDEModel2Dto3D(emb_dim=EMB, hidden_dim=32, variant=1,
                           score_dtype=SCORE_DTYPE)
    batch = jax.device_put(synthetic_batch(num_graphs=BATCH, n_max=N_MAX, seed=1))
    key = jax.random.PRNGKey(0)
    node_2d = jax.random.normal(key, (batch.num_nodes, EMB)) * 0.1
    variables = model.init({"params": key, "dropout": key}, node_2d, batch,
                           key, method=SDEModel2Dto3D.loss)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    f = jax.jit(lambda v, r, k: sample_positions_pc(
        model, v, r, batch, k, n_steps=SCAN_STEPS, layout=LAYOUT))
    out = f(variables, node_2d, key)
    jax.block_until_ready(out)

    with jax.profiler.trace(TRACE_DIR):
        out = f(variables, node_2d, jax.random.PRNGKey(7))
        jax.block_until_ready(out)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", TRACE_DIR)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    durations = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            durations[ev.get("name", "?")] += ev["dur"]
            counts[ev.get("name", "?")] += 1
    top = sorted(durations.items(), key=lambda kv: -kv[1])[:45]
    total = sum(durations.values())
    print(f"trace: {path}\ntotal event time: {total / 1e3:.1f} ms "
          f"({SCAN_STEPS} PC steps)")
    for name, dur in top:
        print(f"{dur / 1e3:9.2f} ms x{counts[name]:5d}  {name[:100]}")

    # device-op category rollup (host python frames excluded): the chain is
    # op-count-bound, so per-category totals localize the next target better
    # than the top-k list
    import re
    cats = defaultdict(float)
    cat_counts = defaultdict(int)
    for name, dur in durations.items():
        if name.startswith("$") or " " in name or "(" in name:
            continue  # host frames / jit wrappers
        base = re.sub(r"[.\d]+$", "", name)
        cats[base] += dur
        cat_counts[base] += counts[name]
    print("\n-- device op categories (total across trace) --")
    for base, dur in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / 1e3:9.2f} ms x{cat_counts[base]:6d}  {base}")


if __name__ == "__main__":
    main()
