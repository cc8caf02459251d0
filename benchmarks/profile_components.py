"""Per-component TPU timing of the pretrain step (development tool).

Times each sub-model's forward (and the full fwd+bwd) separately to locate
bottlenecks. Run on the TPU: ``python benchmarks/profile_components.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.models import SDEModel2Dto3D, SDEModel3Dto2D
from moleculesde_tpu.pretrain import PretrainConfig, create_pretrain_state, make_pretrain_step
from moleculesde_tpu.pretrain.contrastive import dual_cl

BATCH = int(os.environ.get("BENCH_BATCH", 256))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
REPS = int(os.environ.get("REPS", 10))


def _sync(out):
    # close the window with a device READ: on this tunneled TPU
    # block_until_ready returns at enqueue (r3 honest-measurement fix)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def timeit(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:35s} {dt*1000:8.2f} ms")
    return dt


def main():
    print(f"devices: {jax.devices()}  B={BATCH} N={N_MAX} emb={EMB}")
    cfg = PretrainConfig(emb_dim=EMB, dropout_ratio=0.0,
                         cl_similarity_metric="EBM_node_dot_prod")
    batch = jax.device_put(synthetic_batch(num_graphs=BATCH, n_max=N_MAX, seed=0))
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, batch, key)
    p, bs = state.params, state.batch_stats

    @jax.jit
    def gin_fwd(p, bs, batch):
        return models["model_2D"].apply(
            {"params": p["model_2D"], "batch_stats": bs["model_2D"]},
            batch, deterministic=True, use_running_average=False,
            mutable=["batch_stats"])[0]

    @jax.jit
    def schnet_fwd(p, batch):
        return models["model_3D"].apply(
            {"params": p["model_3D"]}, batch.atomic_numbers, batch.positions,
            batch.node_mask, batch.num_graphs, batch.n_max)[1]

    node_2d = gin_fwd(p, bs, batch)
    node_3d = schnet_fwd(p, batch)

    @jax.jit
    def cl_fwd(x, y, key):
        return dual_cl(x, y, key, metric=cfg.cl_similarity_metric,
                       mask=batch.node_mask)[0]

    @jax.jit
    def sde23_fwd(p, bs, node_2d, batch, key):
        out, _ = models["SDE_2Dto3D_model"].apply(
            {"params": p["SDE_2Dto3D_model"], "batch_stats": bs["SDE_2Dto3D_model"]},
            node_2d, batch, key, 0.0, True, False,
            mutable=["batch_stats"], method=SDEModel2Dto3D.loss)
        return out["position"]

    @jax.jit
    def sde32_fwd(p, node_3d, batch, key):
        lx, ladj = models["SDE_3Dto2D_model"].apply(
            {"params": p["SDE_3Dto2D_model"]}, node_3d, batch, key,
            method=SDEModel3Dto2D.loss)
        return lx + ladj

    timeit("GIN fwd", gin_fwd, p, bs, batch)
    timeit("SchNet fwd", schnet_fwd, p, batch)
    timeit("contrastive fwd", cl_fwd, node_2d, node_3d, key)
    timeit("SDE 2D->3D loss fwd", sde23_fwd, p, bs, node_2d, batch, key)
    timeit("SDE 3D->2D loss fwd", sde32_fwd, p, node_3d, batch, key)

    step = make_pretrain_step(models, cfg)
    state, m = step(state, batch, key, jnp.asarray(1.0))
    float(m["loss"])  # sync-mode switch + drain (honest timing, r3)
    coeff = jnp.asarray(1.0)
    t0 = time.time()
    for _ in range(REPS):
        state, m = step(state, batch, key, coeff)
    float(m["loss"])
    print(f"{'FULL train step (fwd+bwd+adam)':35s} {(time.time()-t0)/REPS*1000:8.2f} ms")


if __name__ == "__main__":
    main()
