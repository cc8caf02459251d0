"""3D->2D graph-sampler rate (development tool): PC steps/sec of the joint
(x, adj) chain at reference shapes.

Run on the TPU: ``python benchmarks/profile_sampler_3d2d.py``.  Honest
timing per CLAUDE.md: sync-mode switch via a scalar read, windows closed
with a trailing scalar read.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel3Dto2D, SchNet
from moleculesde_tpu.sampling import sample_graph_pc

BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
STEPS = int(os.environ.get("BENCH_STEPS", 200))
REPS = int(os.environ.get("REPS", 5))


def main():
    batch = jax.device_put(synthetic_batch(num_graphs=BATCH, n_max=N_MAX,
                                           seed=0))
    key = jax.random.PRNGKey(0)
    # conditioning latent from an untrained SchNet (shape-correct; the
    # sampler rate does not depend on parameter values)
    schnet = SchNet(hidden_channels=EMB, num_filters=128,
                    num_interactions=6, num_gaussians=51,
                    compute_dtype="bfloat16")
    sv = schnet.init(key, batch.atomic_numbers, batch.positions,
                     batch.node_mask, batch.num_graphs, batch.n_max)
    node_3d = schnet.apply(sv, batch.atomic_numbers, batch.positions,
                           batch.node_mask, batch.num_graphs, batch.n_max)[1]

    # reference driver hyperparameters (pretrain_MoleculeSDE.py:309-315)
    model = SDEModel3Dto2D(dim3d=EMB, c_init=2, c_hid=8, c_final=4,
                           num_heads=4, adim=16, nhid=16, num_layers=4,
                           num_linears=3, variant=1)
    variables = model.init(key, node_3d, batch, key,
                           method=SDEModel3Dto2D.loss)

    f = jax.jit(lambda v, r, k: sample_graph_pc(
        model, v, r, batch, k, n_steps=STEPS, corrector_steps=1)[1])

    adj = f(variables, node_3d, key)
    float(adj.reshape(-1)[0])  # sync-mode switch + drain
    t0 = time.time()
    for i in range(REPS):
        adj = f(variables, node_3d, jax.random.fold_in(key, i))
    float(adj.reshape(-1)[0])
    dt = (time.time() - t0) / REPS
    rate = STEPS / dt
    print(f"3d2d sampler: {STEPS}-step joint (x, adj) PC chain, B={BATCH}: "
          f"{dt:.3f} s/chain -> {rate:.1f} PC steps/sec")


if __name__ == "__main__":
    main()
