"""Dump the optimized HLO of the PC sampler program and summarize the
while-body copy/fusion ops by shape (dev tool; compile cache makes this
cheap after a trace/bench run)."""

import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D
from moleculesde_tpu.sampling import sample_positions_pc

BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
SCAN_STEPS = int(os.environ.get("SCAN_STEPS", 50))
SCORE_DTYPE = os.environ.get("SCORE_DTYPE", "bfloat16")
OUT = os.environ.get("HLO_OUT", "/tmp/sampler_hlo.txt")


def main():
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
        model, v, r, batch, k, n_steps=SCAN_STEPS))
    txt = f.lower(variables, node_2d, key).compile().as_text()
    with open(OUT, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {OUT}")

    # summarize copies by operand shape
    copies = Counter()
    for m in re.finditer(r"copy[.\d]*\s*=\s*(\S+?)\[", txt):
        pass
    for line in txt.splitlines():
        lm = re.search(r"%?(copy[.\d]*) = (\S+) copy\(", line)
        if lm:
            copies[lm.group(2)] += 1
    print("\n-- copy ops by result shape --")
    for shape, n in copies.most_common(30):
        print(f"x{n:4d}  {shape}")


if __name__ == "__main__":
    main()
