"""A/B timing of PC-sampler variants in one TPU process.

Times the 50-step PC scan per variant with the honest sync recipe
(trailing scalar read).  Flips module-level experiment flags between
variants (each variant builds a fresh jit instance).

Usage: python benchmarks/ab_sampler.py  (runs the default flag grid)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import moleculesde_tpu.models.score_2d3d as s23
from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D
from moleculesde_tpu.sampling import sample_positions_pc

BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
SCAN_STEPS = int(os.environ.get("SCAN_STEPS", 100))
REPS = int(os.environ.get("AB_REPS", 5))


def main():
    print(f"devices: {jax.devices()}  B={BATCH} N={N_MAX} "
          f"scan={SCAN_STEPS}")
    model = SDEModel2Dto3D(emb_dim=EMB, hidden_dim=32, variant=1,
                           score_dtype="bfloat16")
    batch = jax.device_put(
        synthetic_batch(num_graphs=BATCH, n_max=N_MAX, seed=1))
    key = jax.random.PRNGKey(0)
    node_2d = jax.random.normal(key, (batch.num_nodes, EMB)) * 0.1
    variables = model.init({"params": key, "dropout": key}, node_2d, batch,
                           key, method=SDEModel2Dto3D.loss)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    results = []
    for name, attend_flat in [("attend_flat", True),
                              ("attend_blocked", False)]:
        s23.ATTEND_FLAT = attend_flat
        f = jax.jit(lambda v, r, k: sample_positions_pc(
            model, v, r, batch, k, n_steps=SCAN_STEPS, corrector_steps=1,
            layout="channel"))
        t0 = time.time()
        pos = f(variables, node_2d, key)
        _ = float(jnp.asarray(pos).ravel()[0])
        print(f"[{name}] compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(REPS):
            pos = f(variables, node_2d, key)
        _ = float(jnp.asarray(pos).ravel()[0])
        dt = (time.time() - t0) / (REPS * SCAN_STEPS)
        results.append((name, dt))
        print(f"[{name}] {dt * 1e3:.3f} ms/PC step "
              f"({1.0 / dt:.0f} steps/s)", flush=True)

    print("\n== summary ==")
    for name, dt in results:
        print(f"{name:24s} {dt * 1e3:8.3f} ms/PC step")


if __name__ == "__main__":
    main()
