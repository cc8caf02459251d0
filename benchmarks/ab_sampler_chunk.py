"""A/B the in-scan score_chunk on the 2D->3D PC sampler at large batch
(VERDICT r4 #4: conformers/s fell 453 @256 -> 306 @1024; the B=1024 device
trace shows the per-molecule step cost rising 1.5-4.6x in the score
pipeline's pair fusions/copies — the same VMEM-residency cliff the training
step had).  Times full 200-step chains, sync-dispatch windows.

Usage: timeout 3000 python benchmarks/ab_sampler_chunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D
from moleculesde_tpu.sampling import sample_positions_pc

N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
N_STEPS = int(os.environ.get("SAMPLER_STEPS", 200))


def main():
    print(f"devices: {jax.devices()}")
    model = SDEModel2Dto3D(emb_dim=EMB, hidden_dim=32, variant=1,
                           score_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    b0 = synthetic_batch(num_graphs=64, n_max=N_MAX, seed=1)
    node0 = jax.random.normal(key, (b0.num_nodes, EMB)) * 0.1
    variables = model.init({"params": key, "dropout": key}, node0, b0, key,
                           method=SDEModel2Dto3D.loss)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    first = True
    import json
    cfgs = json.loads(os.environ.get(
        "AB_CONFIGS",
        "[[1024,0,1],[1024,256,1],[1024,128,1],[256,0,2],[2048,256,1]]"))
    for b_s, chunk, rounds in cfgs:
        batch = jax.device_put(synthetic_batch(num_graphs=b_s, n_max=N_MAX,
                                               seed=1))
        node_2d = jnp.zeros((batch.num_nodes, EMB))
        f = jax.jit(lambda v, r, k, sb=batch, c=chunk: sample_positions_pc(
            model, v, r, sb, k, n_steps=N_STEPS, score_chunk=c or None))
        pos = f(variables, node_2d, key)
        float(pos[0, 0])  # drain compile (+ sync-mode switch on first)
        if first:
            first = False
        t0 = time.time()
        for i in range(rounds):
            pos = f(variables, node_2d, jax.random.PRNGKey(7 + i))
        float(pos[0, 0])
        dt = time.time() - t0
        print(f"B={b_s:5d} chunk={chunk or '-':>4}: "
              f"{rounds * N_STEPS / dt:7.1f} PC steps/s, "
              f"{b_s * rounds / dt:7.1f} conformers/s "
              f"({1e3 * dt / (rounds * N_STEPS):6.2f} ms/step)", flush=True)
        del batch, f, pos


if __name__ == "__main__":
    main()
