"""Per-component TPU timing of the 2D->3D PC sampler (development tool).

Locates the cost of one PC step (2 score evaluations + predictor/corrector
algebra) by timing: the full scan, one score eval, the frame/feature half,
the score network half, and a scan whose score function is a stub.
Run on the TPU: ``python benchmarks/profile_sampler.py``.
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

BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_MAX = int(os.environ.get("BENCH_NMAX", 32))
EMB = int(os.environ.get("BENCH_EMB", 300))
REPS = int(os.environ.get("REPS", 10))
SCAN_STEPS = int(os.environ.get("SCAN_STEPS", 200))


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
    print(f"{name:45s} {dt * 1000:9.3f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}  B={BATCH} N={N_MAX} emb={EMB} "
          f"scan={SCAN_STEPS}")
    model = SDEModel2Dto3D(emb_dim=EMB, hidden_dim=32, variant=1)
    batch = jax.device_put(synthetic_batch(num_graphs=BATCH, n_max=N_MAX, seed=1))
    key = jax.random.PRNGKey(0)
    node_2d = jax.random.normal(key, (batch.num_nodes, EMB)) * 0.1
    variables = model.init({"params": key, "dropout": key}, node_2d, batch,
                           key, method=SDEModel2Dto3D.loss)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    # full PC chain
    f_full = jax.jit(lambda v, r, k: sample_positions_pc(
        model, v, r, batch, k, n_steps=SCAN_STEPS))
    dt = timeit("full PC scan (f32)", f_full, variables, node_2d, key)
    print(f"  -> {SCAN_STEPS / dt:.1f} PC steps/sec", flush=True)

    model_bf16 = model.clone(score_dtype="bfloat16")
    f_bf16 = jax.jit(lambda v, r, k: sample_positions_pc(
        model_bf16, v, r, batch, k, n_steps=SCAN_STEPS, fused=False))
    dt = timeit("full PC scan (bf16 score path)", f_bf16, variables, node_2d,
                key)
    print(f"  -> {SCAN_STEPS / dt:.1f} PC steps/sec", flush=True)

    f_fused = jax.jit(lambda v, r, k: sample_positions_pc(
        model, v, r, batch, k, n_steps=SCAN_STEPS, fused=True))
    dt = timeit("full PC scan (fused kernel, f32)", f_fused, variables,
                node_2d, key)
    print(f"  -> {SCAN_STEPS / dt:.1f} PC steps/sec", flush=True)

    f_fused16 = jax.jit(lambda v, r, k: sample_positions_pc(
        model_bf16, v, r, batch, k, n_steps=SCAN_STEPS, fused=True))
    dt = timeit("full PC scan (fused kernel, bf16)", f_fused16, variables,
                node_2d, key)
    print(f"  -> {SCAN_STEPS / dt:.1f} PC steps/sec", flush=True)

    # conditioning precompute (once per chain)
    f_cond = jax.jit(lambda v, r: model.apply(
        v, r, batch, True, method=SDEModel2Dto3D.precompute_conditioning))
    cond = f_cond(variables, node_2d)
    timeit("precompute_conditioning", f_cond, variables, node_2d)

    # one score eval from cond
    pos = batch.positions
    t_nodes = jnp.full((batch.num_nodes,), 0.5)
    f_score = jax.jit(lambda v, c, p: model.apply(
        v, c, batch, p, method=SDEModel2Dto3D.score_from_cond))
    timeit("score_from_cond (1 eval)", f_score, variables, cond, pos)
    f_scoref = jax.jit(lambda v, c, p: model.apply(
        v, c, batch, p, method=SDEModel2Dto3D.score_from_cond_fused))
    timeit("score_from_cond_fused (1 eval)", f_scoref, variables, cond, pos)
    f_scoref16 = jax.jit(lambda v, c, p: model_bf16.apply(
        v, c, batch, p, method=SDEModel2Dto3D.score_from_cond_fused))
    timeit("score_from_cond_fused bf16 (1 eval)", f_scoref16, variables, cond,
           pos)

    # frames + invariant features only
    from moleculesde_tpu.models.score_2d3d import dense_frames

    f_frames = jax.jit(lambda p: dense_frames(p.reshape(BATCH, N_MAX, 3)))
    timeit("dense_frames", f_frames, pos)

    # score network only (on fixed edge features)
    b, n = BATCH, N_MAX
    edge_attr = jnp.zeros((b, n, n, 32))
    node_attr = jnp.zeros((b, n, 32))
    pair_mask = jnp.ones((b, n, n), bool)
    basis = tuple(tuple(jnp.zeros((b, n, n)) for _ in range(3))
                  for _ in range(3))

    def score_net_only(v):
        return model.apply(
            v, node_attr, edge_attr, pair_mask, basis, True,
            method=lambda m, *a: m.score_network(*a))

    f_net = jax.jit(score_net_only)
    timeit("score_network (1 eval)", f_net, variables)

    # scan skeleton with stub score: PRNG + SNR rule + predictor algebra only
    import moleculesde_tpu.sampling.pc as pc_mod

    sde = model.sde_pos
    mask = batch.node_mask

    def stub_chain(v, r, k):
        timesteps = jnp.linspace(sde.T, 1e-4, SCAN_STEPS)
        pos0 = sde.prior_sampling(k, batch.positions.shape) * mask[:, None]

        def get_score(p, t):
            return -p * 0.1

        def scan_step(carry, t):
            p, key = carry
            key, kc, kp = jax.random.split(key, 3)
            t_nodes = jnp.full((batch.num_nodes,), t)
            g = get_score(p, t_nodes)
            alpha = sde.corrector_alpha(t_nodes)
            noise = jax.random.normal(kc, p.shape) * mask[:, None]
            gn = pc_mod._masked_mean_rownorm(g, mask)
            nn_ = pc_mod._masked_mean_rownorm(noise, mask)
            step = (0.2 * nn_ / jnp.maximum(gn, 1e-12)) ** 2 * 2 * alpha
            p = p + step[:, None] * g + jnp.sqrt(step * 2)[:, None] * noise
            s2 = get_score(p, t_nodes)
            f, G = sde.reverse_discretize(p, t_nodes, s2, False)
            z = jax.random.normal(kp, p.shape) * mask[:, None]
            p = (p - f + G[:, None] * z) * mask[:, None]
            return (p, key), None

        (p, _), _ = jax.lax.scan(scan_step, (pos0, k), timesteps)
        return p

    f_stub = jax.jit(stub_chain)
    dt = timeit("stub-score PC scan (overhead floor)", f_stub,
                variables, node_2d, key)
    print(f"  -> {SCAN_STEPS / dt:.1f} PC steps/sec")


if __name__ == "__main__":
    main()
