"""3D->2D dense node/adjacency score models.

Re-design of the reference's dense diffusion stack for padded TPU batches:
- NodeNetworkDense: normalized dense-GCN layer
  (reference Geom3D/models/MoleculeSDE/layers/node_network_dense.py:25-88)
- EdgeLayer / EdgeNetworkDense: multi-head tanh attention over node features
  co-evolving multi-channel adjacencies
  (reference layers/edge_network_dense.py:33-128)
- Edge/NodeScoreNetworkDense (+ "_03" 3D-injection variants)
  (reference invariant_scorenetwork_dense.py)
- SDEModel3Dto2D: the three conditioned diffusion variants
  (reference SDE_model_3D_to_2D_node_adj_dense.py)

Everything operates on dense ``[B, N, N]`` tensors with a fixed bucket ``N``,
so the reference's per-batch dynamic ``max_num_nodes`` densification
(reference l.123-131) becomes a free reshape of the node-major padded batch.
All matmuls are batched and MXU-shaped.  Loss scale note: the reference's
``reduce_op`` averages over ``batch_max_num_nodes``-padded rows; with a fixed
bucket the denominator is ``n_max`` instead — identical when the bucket is
tight, otherwise a constant factor.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from moleculesde_tpu.core.batch import GraphBatch, NUM_ATOM_CLASSES
from moleculesde_tpu.core.masks import mask_adjs, mask_x, node_flags
from moleculesde_tpu.models.layers import MLP, xavier_uniform, zeros_init
from moleculesde_tpu.ops.attn_maps import attn_map_bank
from moleculesde_tpu.ops.common import EPSILON
from moleculesde_tpu.sde import SDE, make_sde


def pow_tensor(adj: jnp.ndarray, cnum: int) -> jnp.ndarray:
    """Stack adjacency matrix powers [B,N,N] -> [B,cnum,N,N]
    (ref invariant_scorenetwork_dense.py:28-37)."""
    xs = [adj]
    cur = adj
    for _ in range(cnum - 1):
        cur = jnp.einsum("bij,bjk->bik", cur, adj)
        xs.append(cur)
    return jnp.stack(xs, axis=1)


class NodeNetworkDense(nn.Module):
    """Dense normalized-adjacency GCN: D^-1/2 (A + I) D^-1/2 X W + b
    (ref node_network_dense.py:46-85)."""

    out_channels: int
    add_loop: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = adj.shape
        if self.add_loop:
            eye = jnp.eye(n, dtype=adj.dtype)[None]
            adj = adj * (1 - eye) + eye
        out = nn.Dense(self.out_channels, kernel_init=xavier_uniform,
                       bias_init=zeros_init)(x)
        deg_inv_sqrt = jnp.clip(adj.sum(-1), 1.0, None) ** -0.5
        adj = deg_inv_sqrt[..., :, None] * adj * deg_inv_sqrt[..., None, :]
        return jnp.einsum("bij,bjf->bif", adj, out)


class StackedEdgeLayers(nn.Module):
    """All C adjacency channels' attention layers fused into stacked einsums.

    Semantically one EdgeLayer per channel — Q/K two-layer tanh MLPs,
    dense-GCN V, multi-head symmetric tanh attention (ref
    edge_network_dense.py:33-82) — but the per-channel parameters carry a
    leading channel axis so the whole bank runs as a handful of MXU einsums
    instead of C small module calls (TPU op-count optimization; the original
    per-channel formulation cost ~100 tiny ops per network on v5e).
    ``node_3d_dim > 0`` reproduces the "_03" variant that concatenates the 3D
    representation into Q/K/V inputs (ref edge_network_dense.py:131-180).
    """

    channels: int
    attn_dim: int
    out_dim: int
    num_heads: int = 4
    node_3d_dim: int = 0
    # bf16 compute for the q/k MLPs and the [B,C,H,N,N] attention tensors —
    # the bank's dominant HBM traffic (r3 honest trace: ~2 ms per layer in
    # f32 at B=256).  Params and the returned maps stay f32.
    dtype: Optional[jnp.dtype] = None
    # attention-map implementation (ops/attn_maps.py): "auto" = the lane-
    # exact "wide" XLA bank on TPU ("pallas" opt-in loses 3.6 ms/step
    # end-to-end to boundary relayout despite a 1.3x in-kernel win — see
    # ops/rejected/attn_bank.py docstring)
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, adjc, node_3d_repr=None):
        """x [B,N,F]; adjc [B,C,N,N] -> (v [B,C,N,out], a [B,C,N,N])."""
        c_dim = self.channels
        if self.node_3d_dim:
            qk_in = jnp.concatenate([x, node_3d_repr], axis=-1)
        else:
            qk_in = x
        f_in = qk_in.shape[-1]
        a2 = 2 * self.attn_dim

        # xavier per channel slice: fans from the trailing two dims only
        stacked_init = nn.initializers.glorot_uniform(
            in_axis=-2, out_axis=-1, batch_axis=0)

        def stacked(name, shape):
            return self.param(name, stacked_init, shape)

        wq1 = stacked("q_kernel_0", (c_dim, f_in, a2))
        bq1 = self.param("q_bias_0", zeros_init, (c_dim, a2))
        wq2 = stacked("q_kernel_1", (c_dim, a2, a2))
        bq2 = self.param("q_bias_1", zeros_init, (c_dim, a2))
        wk1 = stacked("k_kernel_0", (c_dim, f_in, a2))
        bk1 = self.param("k_bias_0", zeros_init, (c_dim, a2))
        wk2 = stacked("k_kernel_1", (c_dim, a2, a2))
        bk2 = self.param("k_bias_1", zeros_init, (c_dim, a2))

        dt = self.dtype or qk_in.dtype
        # chunked heads exactly as the reference's split/cat
        # (edge_network_dense.py:66-79): chunk width attn_dim // num_heads.
        ds = self.attn_dim // self.num_heads
        if self.attn_impl.startswith("fused"):
            # fully-fused bank (measured-and-rejected, -4.0 ms/step: see
            # ops/rejected/attn_qk_bank.py): q/k nets + head-mean tanh maps
            # in one kernel, only [B, C, N, N] touches HBM
            from moleculesde_tpu.ops.rejected.attn_qk_bank import attn_qk_bank
            a = attn_qk_bank(
                qk_in, wq1, bq1, wq2, bq2, wk1, bk1, wk2, bk2, ds,
                bf16=(dt == jnp.bfloat16),
                impl="pallas_interpret" if self.attn_impl.endswith(
                    "interpret") else "pallas")
        else:
            # q and k consume the SAME input, so their two-layer MLPs run as
            # ONE bank: layer 1 concatenates the kernels along the output
            # axis, layer 2 is a block-diagonal [2a2, 2a2] kernel (q and k
            # halves never mix).  Halves the big-dot count of the bank —
            # the r3 device trace showed the step op-count-bound, and the
            # same one-dot merge already paid off in the 2D->3D _attend_cm.
            # Parameter tree unchanged (merged at apply time).
            qk_c = qk_in.astype(dt)
            w1 = jnp.concatenate([wq1, wk1], axis=-1).astype(dt)
            b1 = jnp.concatenate([bq1, bk1], axis=-1).astype(dt)
            qk1 = jnp.tanh(jnp.einsum("bnf,cfa->bcna", qk_c, w1)
                           + b1[None, :, None])
            z = jnp.zeros_like(wq2)
            w2 = jnp.concatenate([
                jnp.concatenate([wq2, z], axis=-1),
                jnp.concatenate([z, wk2], axis=-1)], axis=-2).astype(dt)
            b2 = jnp.concatenate([bq2, bk2], axis=-1).astype(dt)
            qk2 = jnp.einsum("bcna,cao->bcno", qk1, w2) + b2[None, :, None]
            q, k = qk2[..., :a2], qk2[..., a2:]
            a = attn_map_bank(q, k, ds, bf16=(dt == jnp.bfloat16),
                              impl=self.attn_impl)
        # symmetrize in the compute dtype: the pair-transpose is a physical
        # relayout copy, and the maps' only consumer (EdgeNetworkDense's
        # channel-major pair MLP) casts to ``dt`` anyway — keeping the bank
        # output f32 here doubled the copy + concat bytes (r4 HLO inventory:
        # ~20 MB/chunk at this line)
        a = a.astype(dt)
        a = (a + jnp.swapaxes(a, -1, -2)) / 2.0

        # dense-GCN V per channel: D^-1/2 (A_c + I) D^-1/2 X W_c + b_c.
        # Degree math stays f32 (rsqrt of sums); the value dots and the
        # aggregation run in ``dt`` like the q/k bank.
        n = adjc.shape[-1]
        v_in = qk_in if self.node_3d_dim else x
        wv = stacked("v_kernel", (c_dim, v_in.shape[-1], self.out_dim))
        bv = self.param("v_bias", zeros_init, (c_dim, self.out_dim))
        eye = jnp.eye(n, dtype=adjc.dtype)[None, None]
        adj_loop = adjc * (1 - eye) + eye
        deg_inv_sqrt = jnp.clip(adj_loop.sum(-1), 1.0, None) ** -0.5
        norm_adj = deg_inv_sqrt[..., :, None] * adj_loop * deg_inv_sqrt[..., None, :]
        hv = jnp.einsum("bnf,cfo->bcno", v_in.astype(dt), wv.astype(dt))
        v = (jnp.einsum("bcij,bcjo->bcio", norm_adj.astype(dt), hv)
             + bv.astype(dt)[None, :, None])
        return v, a


class EdgeNetworkDense(nn.Module):
    """Per-channel attention bank + channel-fusion MLPs
    (ref edge_network_dense.py:85-128)."""

    num_linears: int
    attn_dim: int
    conv_output_dim: int
    input_dim: int   # C_in adjacency channels
    output_dim: int  # C_out adjacency channels
    num_heads: int = 4
    node_3d_dim: int = 0
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, adjc, flags, node_3d_repr=None):
        v, attn_maps = StackedEdgeLayers(
            self.input_dim, self.attn_dim, self.conv_output_dim,
            self.num_heads, self.node_3d_dim, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn",
        )(x, adjc, node_3d_repr)
        b, c, n, out = v.shape
        x_cat = jnp.transpose(v, (0, 2, 1, 3)).reshape(b, n, c * out)

        hidden_dim = 2 * max(self.input_dim, self.output_dim)
        x_out = MLP([hidden_dim, self.conv_output_dim], activation="elu",
                    dtype=self.dtype, name="multi_channel")(x_cat)
        x_out = jnp.tanh(mask_x(x_out, flags))

        # channel-major pair MLP: [B, 2C, N*N] keeps the big axis minor
        # (feature-minor [B, N, N, 2C] lane-pads C=4..16 up to 32x; r3 trace).
        # The concat and the output symmetrize (a pair-transpose relayout
        # copy) run in the MLP's compute dtype; the evolving adjacency
        # stream converts back to f32 only at the very end (fused into
        # mask_adjs) — the f32-first order paid 2x bytes on both copies.
        b_, c_in, n_, _ = adjc.shape
        adjc_c = adjc.astype(self.dtype) if self.dtype else adjc
        mlp_in = jnp.concatenate([attn_maps, adjc_c], axis=1
                                 ).reshape(b_, 2 * c_in, n_ * n_)
        dims = [hidden_dim] * (self.num_linears - 1) + [self.output_dim]
        adj_out = MLP(dims, activation="elu", dtype=self.dtype, name="mlp",
                      channel_major=True)(mlp_in)
        adj_out = adj_out.reshape(b_, self.output_dim, n_, n_)
        adj_out = (adj_out + jnp.swapaxes(adj_out, -1, -2)
                   ).astype(jnp.float32)
        adj_out = mask_adjs(adj_out, flags)
        return x_out, adj_out


class EdgeScoreNetworkDense(nn.Module):
    """Adjacency score network over power-channel stacks
    (ref invariant_scorenetwork_dense.py:40-93 and _03 at l.134-187)."""

    nhid: int = 16
    num_layers: int = 4
    num_linears: int = 3
    c_init: int = 2
    c_hid: int = 8
    c_final: int = 4
    adim: int = 16
    num_heads: int = 4
    node_3d_dim: int = 0
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, adj, flags, node_3d_repr=None):
        adjc = pow_tensor(adj, self.c_init)
        adj_list = [adjc]
        for i in range(self.num_layers):
            attn_dim = self.nhid if i == 0 else self.adim
            c_in = self.c_init if i == 0 else self.c_hid
            c_out = self.c_final if i == self.num_layers - 1 else self.c_hid
            x, adjc = EdgeNetworkDense(
                self.num_linears, attn_dim, self.nhid, c_in, c_out,
                self.num_heads, self.node_3d_dim, dtype=self.dtype,
                attn_impl=self.attn_impl, name=f"layer_{i}",
            )(x, adjc, flags, node_3d_repr)
            adj_list.append(adjc)

        adjs = jnp.concatenate(adj_list, axis=1)          # [B, fdim, N, N]
        fdim = self.c_hid * (self.num_layers - 1) + self.c_final + self.c_init
        b_, _, n, _ = adjs.shape
        score = MLP([2 * fdim, 2 * fdim, 1], activation="silu",
                    dtype=self.dtype, name="final",
                    channel_major=True)(adjs.reshape(b_, -1, n * n))
        score = score.astype(jnp.float32).reshape(b_, n, n)
        score = score * (1.0 - jnp.eye(n)[None])          # zero the diagonal
        return mask_adjs(score, flags)


class NodeScoreNetworkDense(nn.Module):
    """Node score network: dense-GCN stack, tanh, JK-concat, MLP head
    (ref invariant_scorenetwork_dense.py:96-131 and _03 at l.190-225)."""

    nhid: int = 16
    depth: int = 4
    nout: int = NUM_ATOM_CLASSES
    node_3d_dim: int = 0

    @nn.compact
    def __call__(self, x, adj, flags, node_3d_repr=None):
        x_list = [x]
        h = x
        for i in range(self.depth):
            if self.node_3d_dim:
                h_in = jnp.concatenate([h, node_3d_repr], axis=-1)
            else:
                h_in = h
            h = NodeNetworkDense(self.nhid, name=f"layer_{i}")(h_in, adj)
            h = jnp.tanh(h)
            x_list.append(h)
        xs = jnp.concatenate(x_list, axis=-1)
        fdim = xs.shape[-1]
        out = MLP([2 * fdim, 2 * fdim, self.nout], activation="silu", name="final")(xs)
        return mask_x(out, flags)


class SDEModel3Dto2D(nn.Module):
    """Conditioned 3D->2D diffusion over (node one-hots, dense adjacency).

    ``variant`` selects the conditioning (ref SDE_model_3D_to_2D_node_adj_dense.py):
      1: perturbed = emb3D(repr) + embX(x)                       (l.13-179)
      2: perturbed = concat(emb3D(repr), embX(x)); 2x-wide nets  (l.182-349)
      3: like 2 with emb3D(repr) injected at every layer (_03)   (l.352-520)
    """

    dim3d: int  # = emb_dim of the 3D encoder latent
    nhid: int = 16
    num_layers: int = 4
    num_linears: int = 3
    c_init: int = 2
    c_hid: int = 8
    c_final: int = 4
    adim: int = 16
    num_heads: int = 4
    variant: int = 1
    noise_mode: str = "discrete"
    # bf16 attention bank (params/losses f32); see StackedEdgeLayers.dtype
    bf16_attn: bool = True
    # attention-map implementation (ops/attn_maps.py); see StackedEdgeLayers
    attn_impl: str = "auto"
    sde_type: str = "VE"
    beta_min: float = 0.1
    beta_max: float = 1.0
    num_diffusion_timesteps: int = 1000
    num_class_x: int = NUM_ATOM_CLASSES
    noise_on_one_hot: bool = True

    @property
    def sde_x(self) -> SDE:
        return make_sde(self.sde_type, self.beta_min, self.beta_max,
                        self.num_diffusion_timesteps)

    @property
    def sde_adj(self) -> SDE:
        return make_sde(self.sde_type, self.beta_min, self.beta_max,
                        self.num_diffusion_timesteps)

    def _x_channels(self) -> int:
        return self.num_class_x if self.noise_on_one_hot else 1

    @nn.compact
    def _apply_networks(self, node_3d_repr_dense, x, adj, flags,
                        which: str = "both"):
        """Condition the node state on the 3D latent (ref l.156 / l.326 /
        l.496-497) and run both score networks; returns raw (net_x, net_adj)
        outputs (before the -/std scaling of get_score_fn).

        ``which`` ∈ {"both", "x", "adj"} skips the unused network when a
        caller needs only one score (the joint PC sampler's inner corrector
        steps update adj alone); the skipped entry is returned as ``None``.
        """
        emb3d = nn.Dense(self.dim3d, kernel_init=xavier_uniform,
                         name="embedding_3D")(node_3d_repr_dense)
        embx = nn.Dense(self.dim3d, kernel_init=xavier_uniform,
                        name="embedding_X")(x)
        if self.variant == 1:
            cond, node_3d = emb3d + embx, None
        else:
            cond = jnp.concatenate([emb3d, embx], axis=-1)
            node_3d = emb3d if self.variant == 3 else None

        inject = self.dim3d if self.variant == 3 else 0
        net_adj = EdgeScoreNetworkDense(
            nhid=self.nhid, num_layers=self.num_layers, num_linears=self.num_linears,
            c_init=self.c_init, c_hid=self.c_hid, c_final=self.c_final,
            adim=self.adim, num_heads=self.num_heads, node_3d_dim=inject,
            dtype=jnp.bfloat16 if self.bf16_attn else None,
            attn_impl=self.attn_impl,
            name="edge_score_network",
        )(cond, adj, flags, node_3d) if which in ("both", "adj") else None
        net_x = NodeScoreNetworkDense(
            nhid=self.nhid, depth=self.num_layers, nout=self._x_channels(),
            node_3d_dim=inject, name="node_score_network",
        )(cond, adj, flags, node_3d) if which in ("both", "x") else None
        return net_x, net_adj

    # ------------------------------------------------------------------ loss
    def __call__(self, node_3d_repr, batch, key, anneal_power=0.0,
                 reduce_mean=True):
        return self.loss(node_3d_repr, batch, key, anneal_power, reduce_mean)

    def loss(
        self,
        node_3d_repr: jnp.ndarray,
        batch: GraphBatch,
        key: jax.Array,
        anneal_power: float = 0.0,
        reduce_mean: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Joint denoising loss on (x, adj); returns (loss_x, loss_adj)
        (ref SDE_model_3D_to_2D_node_adj_dense.py:101-179)."""
        b, n = batch.num_graphs, batch.n_max
        sde_x, sde_adj = self.sde_x, self.sde_adj
        k_t, k_adj, k_x = jax.random.split(key, 3)

        # antithetic discrete timesteps, per graph (ref l.111-114)
        n_steps = self.num_diffusion_timesteps
        if self.noise_mode == "discrete":
            half = jax.random.randint(k_t, (b // 2 + 1,), 0, n_steps)
            t = jnp.concatenate([half, n_steps - half - 1])[:b]
            t = t / n_steps * (1 - EPSILON) + EPSILON
        else:
            t = jax.random.uniform(k_t, (b,)) * (1 - EPSILON) + EPSILON

        # densify: bond-type scalar adjacency + dense 3D latents (ref l.121-131)
        edge_attr = batch.edge_feats[:, 0].astype(jnp.float32) + 1.0
        edge_attr = jnp.where(batch.edge_mask, edge_attr, 0.0)
        adj = batch.dense_adjacency(edge_attr)
        node_3d = batch.dense_nodes(node_3d_repr)
        z_idx = batch.dense_nodes(batch.atomic_numbers)

        flags = node_flags(adj)

        # perturb adjacency with symmetric noise (ref l.134-139)
        z_adj = sde_adj.prior_sampling_sym(k_adj, adj.shape)
        z_adj = mask_adjs(z_adj, flags)
        mean_adj, std_adj = sde_adj.marginal_prob(adj, t)
        perturbed_adj = mean_adj + std_adj[:, None, None] * z_adj
        perturbed_adj = mask_adjs(perturbed_adj, flags)

        # perturb node states (ref l.142-152)
        if self.noise_on_one_hot:
            x0 = jax.nn.one_hot(z_idx, self.num_class_x)
        else:
            x0 = z_idx.astype(jnp.float32)[..., None]
        z_x = mask_x(jax.random.normal(k_x, x0.shape), flags)
        mean_x, std_x = sde_x.marginal_prob(x0, t)
        perturbed_x = mean_x + std_x[:, None, None] * z_x
        perturbed_x = mask_x(perturbed_x, flags)

        net_x, net_adj = self._apply_networks(node_3d, perturbed_x, perturbed_adj, flags)
        # score = -net / std (ref get_score_fn l.68-99)
        score_adj = -net_adj / std_adj[:, None, None]
        score_x = -net_x / std_x[:, None, None]

        if anneal_power == 0.0:
            losses_x = jnp.square(score_x + z_x)
            losses_adj = jnp.square(score_adj + z_adj)
        else:
            losses_x = jnp.square(score_x + z_x) * (std_x ** anneal_power)[:, None, None]
            losses_adj = jnp.square(score_adj + z_adj) * (std_adj ** anneal_power)[:, None, None]

        def reduce_op(v):
            v = v.reshape(v.shape[0], -1)
            return v.mean(-1) if reduce_mean else 0.5 * v.sum(-1)

        return reduce_op(losses_x).mean(), reduce_op(losses_adj).mean()

    # ------------------------------------------------------------- sampling
    def score_x(self, node_3d_repr_dense, x, adj, flags, t):
        """Node score at sampler state (x, adj) (ref inference script
        pretrain_MoleculeSDE_inference_3D_to_2D_VE_VP.py:227-237)."""
        net_x, _ = self._apply_networks(node_3d_repr_dense, x, adj, flags,
                                        which="x")
        std = self.sde_x.marginal_prob(jnp.zeros_like(adj), t)[1]
        return -net_x / std[:, None, None]

    def score_adj(self, node_3d_repr_dense, x, adj, flags, t):
        """Adjacency score at sampler state (x, adj) (ref ibid. l.239-249)."""
        _, net_adj = self._apply_networks(node_3d_repr_dense, x, adj, flags,
                                          which="adj")
        std = self.sde_adj.marginal_prob(jnp.zeros_like(adj), t)[1]
        return -net_adj / std[:, None, None]

    def scores(self, node_3d_repr_dense, x, adj, flags, t):
        """Both scores from ONE dual-network evaluation.

        The joint PC sampler's corrector phase and predictor phase each read
        the SAME (x, adj) state for their x- and adj-updates (ref inference
        3D->2D l.135-143), so a single ``_apply_networks`` pass serves both —
        the per-score methods each ran the full dual network and discarded
        half of it."""
        net_x, net_adj = self._apply_networks(node_3d_repr_dense, x, adj,
                                              flags)
        std_x = self.sde_x.marginal_prob(jnp.zeros_like(adj), t)[1]
        std_adj = self.sde_adj.marginal_prob(jnp.zeros_like(adj), t)[1]
        return (-net_x / std_x[:, None, None],
                -net_adj / std_adj[:, None, None])
