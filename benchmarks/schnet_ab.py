"""A/B microbench of the SchNet CFConv aggregation form (development tool).

Times SchNet forward and fwd+bwd at pretrain shapes for both aggregation
implementations (``agg="einsum"`` — dot_general with (b, f) batch dims —
vs ``agg="reduce"`` — broadcast-multiply + neighbor-axis sum).  Both run in
one process so compiles share the TPU claim.  Honest-timing recipe per
CLAUDE.md: sync-mode switch via one scalar read, windows closed with a
trailing scalar read.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models.schnet import SchNet

BATCH = int(os.environ.get("BENCH_BATCH", 256))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
REPS = int(os.environ.get("REPS", 20))


def main():
    batch = jax.device_put(synthetic_batch(num_graphs=BATCH, n_max=N_MAX, seed=0))
    args = (batch.atomic_numbers, batch.positions, batch.node_mask,
            batch.num_graphs, batch.n_max)
    key = jax.random.PRNGKey(0)
    variables = None
    for agg in ("einsum", "reduce"):
        model = SchNet(hidden_channels=EMB, num_filters=128,
                       num_interactions=6, num_gaussians=51, cutoff=10.0,
                       compute_dtype="bfloat16", agg=agg)
        if variables is None:
            variables = model.init(key, *args)

        @jax.jit
        def fwd(v, m=model):
            return m.apply(v, *args)[1].sum()

        @jax.jit
        def fwdbwd(v, m=model):
            return jax.grad(lambda vv: m.apply(vv, *args)[1].sum())(v)[
                "params"]["Dense_0"]["kernel"]

        for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            out = fn(variables)
            float(jnp.asarray(out).reshape(-1)[0])  # sync-mode + drain
            t0 = time.time()
            for _ in range(REPS):
                out = fn(variables)
            float(jnp.asarray(out).reshape(-1)[0])
            dt = (time.time() - t0) / REPS
            print(f"schnet {agg:7s} {name:8s} {dt * 1000:8.2f} ms  (B={BATCH})")


if __name__ == "__main__":
    main()
