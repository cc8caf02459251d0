"""Reverse-SDE predictor-corrector samplers under ``lax.scan``.

TPU re-design of the reference inference scripts:
- 2D->3D conformer generation (reference
  examples/pretrain_MoleculeSDE_inference_2D_to_3D_VE_VP.py:92-212):
  ReverseDiffusionPredictor + LangevinCorrector over
  ``linspace(T, eps, N)``, conditioning representation computed once.
- 3D->2D joint (x, adj) generation (reference
  examples/pretrain_MoleculeSDE_inference_3D_to_2D_VE_VP.py:95-252):
  interleaved corrector/predictor updates for adj then x per timestep, with
  oracle node flags from the true adjacency.

The reference loops 1000 Python iterations with per-step H2D syncs (and ships
debug early-breaks at step 10, l.130-132); here the whole chain is one
``lax.scan`` inside jit — the full N steps compile once and run on-device.
All reference semantics are preserved, including the global (batch-mean) SNR
step-size rule and the corrector's stale conditioning within inner steps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moleculesde_tpu.core.batch import GraphBatch
from moleculesde_tpu.core.masks import mask_adjs, mask_x, node_flags
from moleculesde_tpu.models import SDEModel2Dto3D, SDEModel3Dto2D


def repeat_graph_batch(graph: dict, num_repeat: int, n_max: int,
                       e_max: int, ext_e_max: Optional[int] = None) -> GraphBatch:
    """Clone one molecule ``num_repeat`` times into a padded batch
    (TPU equivalent of the reference's ``repeat_data``, inference 2D->3D l.29-39)."""
    from moleculesde_tpu.core.batch import pad_graphs

    return pad_graphs([graph] * num_repeat, n_max=n_max, e_max=e_max,
                      ext_e_max=ext_e_max)


def _masked_mean_rownorm(v: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """mean over rows of ||row|| (reference corrector's global SNR statistic,
    2D->3D inference l.207-208). ``v``: [R, ...] flattened per row."""
    flat = v.reshape(v.shape[0], -1)
    norms = jnp.sqrt(jnp.sum(flat ** 2, axis=-1) + 1e-24)
    if mask is None:
        return norms.mean()
    m = mask.astype(norms.dtype)
    return (norms * m).sum() / jnp.maximum(m.sum(), 1.0)


def sample_positions_pc(
    model: SDEModel2Dto3D,
    variables: Dict[str, Any],
    node_2d_repr: jnp.ndarray,
    batch: GraphBatch,
    key: jax.Array,
    *,
    n_steps: Optional[int] = None,
    snr: float = 0.2,
    scale_eps: float = 0.9,
    corrector_steps: int = 1,
    eps: float = 1e-4,
    denoise: bool = True,
    probability_flow: bool = False,
    fused: Optional[bool] = None,
    layout: str = "channel",
    score_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Generate 3D conformers from 2D graphs with PC sampling.

    Returns positions ``[N_nodes, 3]`` (the ``x_mean`` of the final predictor
    step when ``denoise``, matching reference l.135-138).

    ``layout`` selects the score pipeline's pair-tensor layout:
    ``"channel"`` (default) runs every pair tensor as ``[B, C, N*N]`` —
    lane-padding-free on TPU, where the feature-minor layout wastes 4x
    bandwidth and computes at 25% VPU utilization at H=32 (the device
    trace showed two such fusions carrying 58% of the PC chain);
    ``"feature"`` is the reference-shaped ``[B, N, N, C]`` path.

    ``fused`` selects the fully-fused Pallas score kernel
    (ops/score_kernel.py).  Default OFF: at the flagship sizes (H=32,
    c_head=4) its VMEM tiling caps the batch tile at 2 and it loses to the
    XLA channel-major path; kept as a validated building block for larger
    score networks.  ``fused`` requires ``layout="feature"`` conditioning
    and overrides ``layout``.

    ``score_chunk`` evaluates the score model over batch chunks of that
    size inside each PC step (a ``lax.map``, the forward-only analogue of
    the training step's microbatching): at large B the score pipeline's
    [B, C, N*N] pair tensors fall out of VMEM residency (the same cliff
    the r4 training step hit), and chunking restores the small-batch
    per-molecule rate.  Semantics are EXACT — the corrector's global
    (batch-mean) SNR statistic still reduces over the full batch; only the
    pair-tensor working set shrinks.  ``None`` or ``>= B`` disables.
    """
    sde = model.sde_pos
    diff_steps = n_steps if n_steps is not None else sde.N
    timesteps = jnp.linspace(sde.T, eps, diff_steps)
    mask = batch.node_mask

    k_init, k_scan = jax.random.split(key)
    pos = sde.prior_sampling(k_init, batch.positions.shape)
    pos = pos * mask[:, None]

    if fused is None:
        fused = False
    if fused:
        layout = "feature"

    # The conditioning (2D pair embedding, node embedding, pair mask) is
    # position-independent: compute it ONCE and close over it, instead of
    # rebuilding it inside every one of the ``2 * corrector_steps * N`` score
    # evaluations of the chain (the reference recomputes it per call,
    # SDE_model_2D_to_3D.py:393-445).
    cond = model.apply(variables, node_2d_repr, batch, True,
                       layout=("channel" if layout == "channel" else "feature"),
                       method=SDEModel2Dto3D.precompute_conditioning)

    score_method = (SDEModel2Dto3D.score_from_cond_fused if fused
                    else SDEModel2Dto3D.score_from_cond_cm
                    if layout == "channel" else SDEModel2Dto3D.score_from_cond)

    b, n = batch.num_graphs, batch.n_max
    n_chunks = 1
    if score_chunk and 0 < score_chunk < b and b % score_chunk == 0:
        n_chunks = b // score_chunk
    if n_chunks > 1:
        # stack the (loop-invariant) conditioning into [n_chunks, chunk, ...]
        # once; each in-scan score evaluation maps over chunks sequentially.
        # The score methods read only the static sizes from ``batch``.
        cond_st = jax.tree_util.tree_map(
            lambda v: v.reshape((n_chunks, score_chunk) + v.shape[1:]), cond)
        from types import SimpleNamespace
        sub_batch = SimpleNamespace(num_graphs=score_chunk, n_max=n,
                                    num_nodes=score_chunk * n)

        def raw_score(p):
            def one(c):
                cnd, pc_ = c
                return model.apply(variables, cnd, sub_batch, pc_,
                                   method=score_method)
            return jax.lax.map(
                one, (cond_st, p.reshape(n_chunks, score_chunk * n, 3))
            ).reshape(b * n, 3)
    else:
        def raw_score(p):
            return model.apply(variables, cond, batch, p, method=score_method)

    # Hoisted per-chain randomness + schedule scalars.  Every node shares a
    # step's scalar t, so the marginal std and corrector alpha are [n_steps]
    # lookups computed once; ALL chain noise comes from one batched threefry
    # instead of 2*(corrector_steps)+3 small RNG programs per scan step —
    # the chain is op-count-bound (~190 device ops/step at ~2-4us each), so
    # in-scan threefry/splits were a measurable slice of the step.  The
    # corrector slab is hoisted only while it stays under 128 MB
    # (steps_pos=100-style inner loops fall back to in-scan draws).
    stds = sde.marginal_prob(jnp.zeros_like(timesteps), timesteps)[1]
    alphas = sde.corrector_alpha(timesteps)
    k_pred, k_corr = jax.random.split(k_scan)
    noise_p = (jax.random.normal(k_pred, (diff_steps,) + pos.shape)
               * mask[:, None])
    hoist_corr = (diff_steps * corrector_steps * pos.size * 4
                  <= 128 * 1024 * 1024)
    noise_c = (jax.random.normal(
        k_corr, (diff_steps, corrector_steps) + pos.shape) * mask[:, None]
        if hoist_corr else None)

    def get_score(pos, std):
        return -raw_score(pos) / std

    def corrector(pos, std, alpha, noises, key):
        x = pos
        x_mean = pos
        for i in range(corrector_steps):
            grad = get_score(x, std)
            if hoist_corr:
                noise = noises[i]
            else:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, x.shape) * mask[:, None]
            grad_norm = _masked_mean_rownorm(grad, mask)
            noise_norm = _masked_mean_rownorm(noise, mask)
            step_size = (snr * noise_norm / jnp.maximum(grad_norm, 1e-12)) ** 2 * 2 * alpha
            x_mean = x + step_size * grad
            x = x_mean + jnp.sqrt(step_size * 2) * noise * scale_eps
        return x, x_mean

    def predictor(pos, t_nodes, std, noise):
        score = get_score(pos, std)
        f, G = sde.reverse_discretize(pos, t_nodes, score, probability_flow)
        x_mean = pos - f
        x = x_mean + G[:, None] * noise
        return x, x_mean

    def scan_step(carry, xs):
        pos, _, key = carry
        if hoist_corr:
            t, std, alpha, np_, nc = xs
            kc = key
        else:
            t, std, alpha, np_ = xs
            nc = None
            key, kc = jax.random.split(key)
        t_nodes = jnp.full((batch.num_nodes,), t)
        pos, _ = corrector(pos, std, alpha, nc, kc)
        pos, pos_mean = predictor(pos, t_nodes, std, np_)
        pos = pos * mask[:, None]
        pos_mean = pos_mean * mask[:, None]
        return (pos, pos_mean, key), None

    xs = (timesteps, stds, alphas, noise_p) + (
        (noise_c,) if hoist_corr else ())
    (pos, pos_mean, _), _ = jax.lax.scan(
        scan_step, (pos, pos, k_scan), xs)
    return pos_mean if denoise else pos


def sample_graph_pc(
    model: SDEModel3Dto2D,
    variables: Dict[str, Any],
    node_3d_repr: jnp.ndarray,
    batch: GraphBatch,
    key: jax.Array,
    *,
    n_steps: Optional[int] = None,
    snr: float = 0.2,
    scale_eps: float = 0.9,
    corrector_steps: int = 1,
    eps: float = 1e-4,
    probability_flow: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Joint (x, adj) PC generation conditioned on the 3D latent.

    Oracle node flags come from the true bond adjacency (atom count given;
    reference 3D->2D inference l.119-126).  Returns (x, adj, x_mean, adj_mean),
    shapes [B, N, C] / [B, N, N].
    """
    sde_x, sde_adj = model.sde_x, model.sde_adj
    diff_steps = n_steps if n_steps is not None else sde_adj.N
    timesteps = jnp.linspace(sde_adj.T, eps, diff_steps)
    b, n = batch.num_graphs, batch.n_max
    c = model.num_class_x if model.noise_on_one_hot else 1

    edge_attr = batch.edge_feats[:, 0].astype(jnp.float32) + 1.0
    edge_attr = jnp.where(batch.edge_mask, edge_attr, 0.0)
    adj_oracle = batch.dense_adjacency(edge_attr)
    flags = node_flags(adj_oracle)
    node_3d = batch.dense_nodes(node_3d_repr)

    k_x, k_adj, k_scan = jax.random.split(key, 3)
    x = mask_x(sde_x.prior_sampling(k_x, (b, n, c)), flags)
    # NB: reference initializes adj from the *asymmetric* prior (l.121)
    adj = mask_adjs(sde_adj.prior_sampling(k_adj, (b, n, n)), flags)

    def scores_both(x_cond, adj_in, t):
        return model.apply(variables, node_3d, x_cond, adj_in, flags, t,
                           method=SDEModel3Dto2D.scores)

    def score_adj(x_cond, adj_in, t):
        return model.apply(variables, node_3d, x_cond, adj_in, flags, t,
                           method=SDEModel3Dto2D.score_adj)

    def shape_noise_x(z):
        return mask_x(z.reshape(b, n, c), flags)

    def shape_noise_adj(z):
        z = z.reshape(b, n, n)
        z = jnp.triu(z, k=1)
        return mask_adjs(z + jnp.swapaxes(z, -1, -2), flags)

    # Hoisted per-chain randomness + schedule scalars (same op-count rationale
    # as sample_positions_pc above): every graph shares a step's scalar t, so
    # both corrector alphas are [n_steps] lookups computed once, and ALL chain
    # noise comes from one batched threefry — each scan step consumes one
    # pre-drawn flat slab sliced into its 2*(1 + corrector_steps) noises,
    # instead of a 5-way key split plus 4+ small RNG programs per step.  The
    # slab is hoisted only while it stays under 128 MB; above that, each step
    # draws its own flat slab from a per-step key (one RNG program/step).
    alphas_x = sde_x.corrector_alpha(timesteps)
    alphas_adj = sde_adj.corrector_alpha(timesteps)
    flat_x, flat_adj = b * n * c, b * n * n
    per_step = (1 + corrector_steps) * (flat_x + flat_adj)
    hoist_noise = diff_steps * per_step * 4 <= 128 * 1024 * 1024
    if hoist_noise:
        noise_xs = jax.random.normal(k_scan, (diff_steps, per_step))
        step_keys = None
    else:
        noise_xs = None
        step_keys = jax.random.split(k_scan, diff_steps)

    def slice_noises(slab):
        """Split one flat [per_step] slab into (corrector adj[s], corrector
        x[s], predictor adj, predictor x) shaped noises."""
        off = 0
        c_adj, c_x = [], []
        for _ in range(corrector_steps):
            c_adj.append(shape_noise_adj(slab[off:off + flat_adj]))
            off += flat_adj
        for _ in range(corrector_steps):
            c_x.append(shape_noise_x(slab[off:off + flat_x]))
            off += flat_x
        p_adj = shape_noise_adj(slab[off:off + flat_adj])
        off += flat_adj
        p_x = shape_noise_x(slab[off:off + flat_x])
        return c_adj, c_x, p_adj, p_x

    # Both corrector updates read the pre-phase (x, adj) (ref l.135-138) and
    # both predictor updates read the post-corrector (x, adj) (ref l.140-143),
    # so each phase needs ONE dual-network evaluation, not two single-score
    # evaluations that each run the full dual network (2x fewer score-model
    # passes per PC step at corrector_steps=1; the x-corrector additionally
    # holds its gradient at the phase entry — reference quirk l.227-236 —
    # and only the adj-corrector's inner steps re-evaluate, adj-net only).
    def corrector_phase(x_in, adj_in, t, alpha_x, alpha_adj, c_adj, c_x):
        grad_x, grad_adj = scores_both(x_in, adj_in, t)

        aa, adj_mean, g = adj_in, adj_in, grad_adj
        for i in range(corrector_steps):
            if i > 0:
                g = score_adj(x_in, aa, t)
            noise = c_adj[i]
            gn = jnp.sqrt(jnp.sum(g.reshape(b, -1) ** 2, -1) + 1e-24).mean()
            nn_ = jnp.sqrt(jnp.sum(noise.reshape(b, -1) ** 2, -1) + 1e-24).mean()
            step = (snr * nn_ / jnp.maximum(gn, 1e-12)) ** 2 * 2 * alpha_adj
            adj_mean = aa + step * g
            aa = adj_mean + jnp.sqrt(step * 2) * noise * scale_eps

        xx, x_mean = x_in, x_in
        for i in range(corrector_steps):
            noise = c_x[i]
            gn = jnp.sqrt(jnp.sum(grad_x.reshape(b, -1) ** 2, -1) + 1e-24).mean()
            nn_ = jnp.sqrt(jnp.sum(noise.reshape(b, -1) ** 2, -1) + 1e-24).mean()
            step = (snr * nn_ / jnp.maximum(gn, 1e-12)) ** 2 * 2 * alpha_x
            x_mean = xx + step * grad_x
            xx = x_mean + jnp.sqrt(step * 2) * noise * scale_eps
        return xx, aa, x_mean, adj_mean

    def predictor_phase(x_in, adj_in, t, p_adj, p_x):
        grad_x, grad_adj = scores_both(x_in, adj_in, t)
        f_a, G_a = sde_adj.reverse_discretize(adj_in, t, grad_adj,
                                              probability_flow)
        adj_mean = adj_in - f_a
        adj_out = adj_mean + G_a[:, None, None] * p_adj
        f_x, G_x = sde_x.reverse_discretize(x_in, t, grad_x, probability_flow)
        x_mean = x_in - f_x
        x_out = x_mean + G_x[:, None, None] * p_x
        return x_out, adj_out, x_mean, adj_mean

    def scan_step(carry, xs):
        x, adj, _, _ = carry
        if hoist_noise:
            t, a_x, a_adj, slab = xs
        else:
            t, a_x, a_adj, sk = xs
            slab = jax.random.normal(sk, (per_step,))
        c_adj, c_x, p_adj, p_x = slice_noises(slab)
        tv = jnp.full((b,), t)
        x, adj, x_mean, adj_mean = corrector_phase(x, adj, tv, a_x, a_adj,
                                                   c_adj, c_x)
        x, adj, x_mean, adj_mean = predictor_phase(x, adj, tv, p_adj, p_x)
        return (x, adj, x_mean, adj_mean), None

    xs = (timesteps, alphas_x, alphas_adj,
          noise_xs if hoist_noise else step_keys)
    init = (x, adj, x, adj)
    (x, adj, x_mean, adj_mean), _ = jax.lax.scan(scan_step, init, xs)
    return x, adj, x_mean, adj_mean
