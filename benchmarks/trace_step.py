"""Capture a jax.profiler trace of the pretrain step and summarize hot ops.

Development tool: writes a trace under /tmp/molsde_trace and prints the
top-k ops by total duration parsed from the perfetto trace json.
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

from moleculesde_tpu.data.synthetic import synthetic_batch, synthetic_compact_batch
from moleculesde_tpu.pretrain import PretrainConfig, create_pretrain_state, make_pretrain_step

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/molsde_trace")


def main():
    b = int(os.environ.get("TRACE_BATCH", 256))
    cfg = PretrainConfig(emb_dim=300, dropout_ratio=0.0,
                         cl_similarity_metric="EBM_node_dot_prod",
                         model_3d=os.environ.get("TRACE_MODEL3D", "SchNet"),
                         attn_impl_3dto2d=os.environ.get("TRACE_ATTN", "auto"),
                         schnet_cfconv=os.environ.get("TRACE_CFCONV", "auto"),
                         gnn2d_msg=os.environ.get("TRACE_GINMSG", "auto"),
                         microbatch=int(os.environ.get("TRACE_MB", 0)))
    # production compact-ingest path (same as bench.py headline);
    # TRACE_INGEST=graph traces the host-extended GraphBatch form instead
    if os.environ.get("TRACE_INGEST", "compact") == "compact":
        batch = jax.device_put(
            synthetic_compact_batch(num_graphs=b, n_max=32, seed=0))
    else:
        batch = jax.device_put(synthetic_batch(num_graphs=b, n_max=32, seed=0))
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, batch, key)
    step = make_pretrain_step(models, cfg)
    state, m = step(state, batch, key, jnp.asarray(1.0))
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, sub, jnp.asarray(1.0))
        jax.block_until_ready(m["loss"])

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", TRACE_DIR)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    durations = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            durations[ev.get("name", "?")] += ev["dur"]
    top = sorted(durations.items(), key=lambda kv: -kv[1])[:40]
    total = sum(durations.values())
    print(f"trace: {path}\ntotal event time: {total/1e3:.1f} ms (5 steps)")
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
