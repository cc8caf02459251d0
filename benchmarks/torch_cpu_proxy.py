"""Torch-CPU baseline proxy for the joint pretrain step.

The reference (chao1224/MoleculeSDE) cannot run in this image (its PyG /
torch_scatter / OGB dependencies are not installed), so the benchmark
baseline is a compact pure-torch implementation of the *same computation* at
the same sizes: GIN-2D encoder, SchNet-3D encoder with radius-graph message
passing, dual contrastive loss, 2D->3D frame score model with transformer
attention over extended edges, 3D->2D dense node/adj score networks, full
backward + Adam step.  Sparse message passing uses index_add (what
torch_scatter lowers to on CPU), matching the reference's execution style.

This is an independent implementation written for this benchmark — it shares
the model architecture, not code, with the reference.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def scatter_add(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add(0, index, src)


def scatter_mean(src, index, dim_size):
    s = scatter_add(src, index, dim_size)
    cnt = scatter_add(torch.ones(len(index)), index, dim_size).clamp(min=1)
    return s / cnt.view(-1, *([1] * (src.dim() - 1)))


def scatter_softmax(logits, index, dim_size):
    m = torch.full((dim_size,) + logits.shape[1:], -1e30)
    m = m.index_reduce(0, index, logits, "amax", include_self=True)
    ex = torch.exp(logits - m[index])
    den = scatter_add(ex, index, dim_size).clamp(min=1e-16)
    return ex / den[index]


class GINLayer(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(d, 2 * d), nn.BatchNorm1d(2 * d),
                                 nn.ReLU(), nn.Linear(2 * d, d))
        self.bond = nn.Embedding(16, d)
        self.eps = nn.Parameter(torch.zeros(1))
        self.bn = nn.BatchNorm1d(d)

    def forward(self, x, src, dst, bond_type):
        msg = F.relu(x[src] + self.bond(bond_type))
        agg = scatter_add(msg, dst, x.shape[0])
        return F.relu(self.bn(self.mlp((1 + self.eps) * x + agg)))


class SchNetLayer(nn.Module):
    def __init__(self, d, g=51):
        super().__init__()
        self.filter = nn.Sequential(nn.Linear(g, d), nn.Softplus(), nn.Linear(d, d))
        self.lin1 = nn.Linear(d, d, bias=False)
        self.lin2 = nn.Linear(d, d)
        self.out = nn.Sequential(nn.Linear(d, d), nn.Softplus(), nn.Linear(d, d))
        self.g = g

    def forward(self, h, src, dst, dist, cutoff=10.0):
        offsets = torch.linspace(0, cutoff, self.g)
        rbf = torch.exp(-0.5 / (cutoff / (self.g - 1)) ** 2 * (dist[:, None] - offsets) ** 2)
        w = self.filter(rbf) * (0.5 * (torch.cos(dist * math.pi / cutoff) + 1))[:, None]
        x = self.lin1(h)
        agg = scatter_add(x[src] * w, dst, h.shape[0])
        return h + self.out(self.lin2(agg))


class Score2Dto3D(nn.Module):
    """Frame score model: edge MLPs + 4x 8-head transformer conv + basis mix."""

    def __init__(self, emb=300, hid=32, heads=8):
        super().__init__()
        self.edge2d = nn.Sequential(nn.Linear(2 * emb, emb), nn.BatchNorm1d(emb),
                                    nn.ReLU(), nn.Linear(emb, hid))
        self.node_emb = nn.Linear(emb, hid)
        self.coff_mlp = nn.Linear(4 * hid, hid)
        self.project = nn.Sequential(nn.Linear(2 * hid + 2, hid), nn.SiLU(),
                                     nn.Linear(hid, hid))
        self.qkv = nn.ModuleList([nn.Linear(hid, 3 * hid) for _ in range(4)])
        self.edge_proj = nn.ModuleList([nn.Linear(hid, hid) for _ in range(4)])
        self.ffn = nn.ModuleList([
            nn.Sequential(nn.Linear(hid, hid), nn.SiLU(), nn.Linear(hid, hid))
            for _ in range(4)])
        self.basis_mlp = nn.ModuleList([
            nn.Sequential(nn.Linear(2 * hid, 128), nn.SiLU(), nn.Linear(128, 3))
            for _ in range(2)])
        self.heads = heads
        self.hid = hid
        self.w_four = nn.Parameter(torch.randn(hid), requires_grad=False)

    def fourier(self, x):
        p = x * self.w_four[None, :] * 2 * math.pi
        return torch.cat([torch.sin(p), torch.cos(p)], dim=-1)

    def forward(self, node2d, pos, src, dst, node2graph, n_graphs):
        n = node2d.shape[0]
        noise = torch.randn_like(pos)
        t = torch.rand(n_graphs)[node2graph]
        std = 0.2 * (1.0 / 0.2) ** t
        posp = pos + std[:, None] * noise

        d = (posp[src] - posp[dst]).norm(dim=-1)
        diff = (posp[src] - posp[dst]) / (d[:, None] + 1e-6)
        cross = torch.cross(posp[src], posp[dst], dim=-1)
        cross = cross / (cross.norm(dim=-1, keepdim=True) + 1e-6)
        vert = torch.cross(diff, cross, dim=-1)
        basis = torch.stack([diff, cross, vert], 1)
        ci = torch.einsum("ebc,ec->eb", basis, posp[src])
        cj = torch.einsum("ebc,ec->eb", basis, posp[dst])
        ci[:, 1] = ci[:, 1].abs()
        cj[:, 1] = cj[:, 1].abs()
        cosv = (ci * cj).sum(-1, keepdim=True) / (
            ci.norm(dim=-1, keepdim=True) + 1e-6) / (cj.norm(dim=-1, keepdim=True) + 1e-6)
        sinv = torch.sqrt((1 - cosv ** 2).clamp(min=1e-12))
        emb_i = self.coff_mlp(torch.cat([self.fourier(ci[:, 0:1]),
                                         self.fourier(ci[:, 2:3])], -1))
        emb_j = self.coff_mlp(torch.cat([self.fourier(cj[:, 0:1]),
                                         self.fourier(cj[:, 2:3])], -1))
        frame_inv = self.project(torch.cat([sinv, cosv, emb_i, emb_j], -1))
        eattr = self.edge2d(torch.cat([node2d[src], node2d[dst]], -1)) + frame_inv

        h = self.node_emb(node2d)
        grad = torch.zeros(n, 3)
        for m in range(2):
            for c in range(2):
                li = m * 2 + c
                qkv = self.qkv[li](h).view(n, 3, self.heads, self.hid // self.heads)
                e = self.edge_proj[li](eattr).view(-1, self.heads, self.hid // self.heads)
                q = qkv[:, 0][dst]
                k = qkv[:, 1][src] + e
                v = qkv[:, 2][src] + e
                a = (q * k).sum(-1) / math.sqrt(self.hid // self.heads)
                a = scatter_softmax(a, dst, n)
                o = scatter_add(v * a[..., None], dst, n).view(n, self.hid)
                h = h + F.layer_norm(o, (self.hid,))
                h = h + F.layer_norm(self.ffn[li](h), (self.hid,))
            coff = self.basis_mlp[m](torch.cat([h[src] + h[dst], eattr], -1))
            mix = (coff[:, :1] * diff + coff[:, 1:2] * cross + coff[:, 2:3] * vert)
            grad = grad + scatter_mean(mix, dst, n)

        loss = scatter_mean(((grad - noise) ** 2).sum(-1), node2graph, n_graphs)
        return loss.mean()


class Score3Dto2D(nn.Module):
    """Dense node/adj score nets at reference sizes (nhid=16, 4 layers)."""

    def __init__(self, emb=300, nhid=16, n_class=119):
        super().__init__()
        self.emb_x = nn.Linear(n_class, emb)
        self.emb_3d = nn.Linear(emb, emb)
        self.q = nn.ModuleList()
        self.k = nn.ModuleList()
        self.v = nn.ModuleList()
        self.fuse = nn.ModuleList()
        self.adj_mlp = nn.ModuleList()
        dims = [emb] + [nhid] * 3
        chans = [2, 8, 8, 8]
        for i in range(4):
            self.q.append(nn.ModuleList(
                [nn.Sequential(nn.Linear(dims[i], 32), nn.Tanh(), nn.Linear(32, 32))
                 for _ in range(chans[i])]))
            self.k.append(nn.ModuleList(
                [nn.Sequential(nn.Linear(dims[i], 32), nn.Tanh(), nn.Linear(32, 32))
                 for _ in range(chans[i])]))
            self.v.append(nn.ModuleList(
                [nn.Linear(dims[i], nhid) for _ in range(chans[i])]))
            self.fuse.append(nn.Linear(chans[i] * nhid, nhid))
            cout = 4 if i == 3 else 8
            self.adj_mlp.append(nn.Sequential(
                nn.Linear(2 * chans[i], 32), nn.ELU(), nn.Linear(32, cout)))
        self.final_adj = nn.Sequential(nn.Linear(30, 60), nn.SiLU(), nn.Linear(60, 1))
        self.node_layers = nn.ModuleList(
            [nn.Linear(emb if i == 0 else nhid, nhid) for i in range(4)])
        fdim = emb + 4 * nhid
        self.final_node = nn.Sequential(nn.Linear(fdim, 2 * fdim), nn.SiLU(),
                                        nn.Linear(2 * fdim, n_class))
        self.n_class = n_class

    def forward(self, node3d_dense, z_idx, adj, n_graphs):
        b, nmax = z_idx.shape
        t = torch.rand(n_graphs)
        std = 0.1 * (1.0 / 0.1) ** t
        x0 = F.one_hot(z_idx, self.n_class).float()
        zx = torch.randn_like(x0)
        xp = x0 + std[:, None, None] * zx
        za = torch.randn_like(adj).triu(1)
        za = za + za.transpose(-1, -2)
        adjp = adj + std[:, None, None] * za

        cond = self.emb_3d(node3d_dense) + self.emb_x(xp)

        # edge score net
        adjc = torch.stack([adjp, torch.bmm(adjp, adjp)], 1)
        h = cond
        adj_list = [adjc]
        for i in range(4):
            maps, vs = [], []
            for c in range(adjc.shape[1]):
                q = self.q[i][c](h).view(b, nmax, 8, 4)
                k = self.k[i][c](h).view(b, nmax, 8, 4)
                a = torch.tanh(torch.einsum("bnhd,bmhd->bhnm", q, k) / 2.0).mean(1)
                maps.append((a + a.transpose(-1, -2)) / 2)
                deg = adjc[:, c].sum(-1).clamp(min=1).pow(-0.5)
                na = deg[:, :, None] * adjc[:, c] * deg[:, None, :]
                vs.append(torch.bmm(na, self.v[i][c](h)))
            h = torch.tanh(self.fuse[i](torch.cat(vs, -1)))
            mi = torch.cat([torch.stack(maps, -1),
                            adjc.permute(0, 2, 3, 1)], -1)
            adjc = self.adj_mlp[i](mi).permute(0, 3, 1, 2)
            adjc = adjc + adjc.transpose(-1, -2)
            adj_list.append(adjc)
        adjs = torch.cat(adj_list, 1).permute(0, 2, 3, 1)
        score_adj = self.final_adj(adjs)[..., 0]

        # node score net
        hx = cond
        xs = [cond]
        for i in range(4):
            deg = adjp.sum(-1).clamp(min=1).pow(-0.5)
            na = deg[:, :, None] * adjp * deg[:, None, :]
            hx = torch.tanh(torch.bmm(na, self.node_layers[i](hx)))
            xs.append(hx)
        score_x = self.final_node(torch.cat(xs, -1))

        lx = ((score_x / std[:, None, None] + zx) ** 2).mean()
        ladj = ((score_adj / std[:, None, None] + za) ** 2).mean()
        return 0.5 * (lx + ladj)


class PretrainProxy(nn.Module):
    def __init__(self, emb=300):
        super().__init__()
        self.atom_emb = nn.Embedding(119, emb)
        self.gin = nn.ModuleList([GINLayer(emb) for _ in range(5)])
        self.sch_emb = nn.Embedding(119, emb)
        self.schnet = nn.ModuleList([SchNetLayer(emb) for _ in range(6)])
        self.s23 = Score2Dto3D(emb)
        self.s32 = Score3Dto2D(emb)

    def forward(self, data):
        (z, src, dst, bond, rsrc, rdst, ext_src, ext_dst, pos, node2graph,
         z_dense, adj, n_graphs) = data
        x = self.atom_emb(z)
        for l in self.gin:
            x = l(x, src, dst, bond)
        h = self.sch_emb(z)
        dist = (pos[rsrc] - pos[rdst]).norm(dim=-1)
        for l in self.schnet:
            h = l(h, rsrc, rdst, dist)

        # EBM_node_dot_prod dual contrastive
        perm = torch.randperm(x.shape[0])
        pp = (x * h).sum(-1) / 0.1
        pn = (x * h[perm]).sum(-1) / 0.1
        cl = (F.binary_cross_entropy_with_logits(pp, torch.ones_like(pp))
              + F.binary_cross_entropy_with_logits(pn, torch.zeros_like(pn)))

        l23 = self.s23(x, pos, ext_src, ext_dst, node2graph, n_graphs)
        nmax = z_dense.shape[1]
        h_dense = h.view(n_graphs, nmax, -1)
        l32 = self.s32(h_dense, z_dense, adj, n_graphs)
        return cl + l23 + l32


def make_proxy_batch(batch_size=256, n_max=32, seed=0):
    """Build the torch analogue of a padded synthetic PCQM4Mv2-ish batch."""
    rng = np.random.default_rng(seed)
    from moleculesde_tpu.data.synthetic import synthetic_batch

    gb = synthetic_batch(num_graphs=batch_size, n_max=n_max, seed=seed)
    z = torch.from_numpy(np.asarray(gb.atomic_numbers)).long()
    src = torch.from_numpy(np.asarray(gb.edge_src)).long()
    dst = torch.from_numpy(np.asarray(gb.edge_dst)).long()
    bond = torch.from_numpy(np.asarray(gb.edge_feats[:, 0])).long().clamp(0, 15)
    ext_src = torch.from_numpy(np.asarray(gb.ext_src)).long()
    ext_dst = torch.from_numpy(np.asarray(gb.ext_dst)).long()
    pos = torch.from_numpy(np.asarray(gb.positions)).float()
    node2graph = torch.from_numpy(np.asarray(gb.node2graph())).long()
    # radius graph at cutoff 10: essentially all intra-molecule pairs
    n_per = np.asarray(gb.nodes_per_graph())
    rs, rd = [], []
    for g in range(batch_size):
        n = n_per[g]
        base = g * n_max
        ii, jj = np.meshgrid(np.arange(n), np.arange(n))
        keep = ii != jj
        rs.append(base + ii[keep])
        rd.append(base + jj[keep])
    rsrc = torch.from_numpy(np.concatenate(rs)).long()
    rdst = torch.from_numpy(np.concatenate(rd)).long()
    z_dense = z.view(batch_size, n_max)
    adj_np = np.zeros((batch_size, n_max, n_max), dtype=np.float32)
    es = np.asarray(gb.edge_src)[np.asarray(gb.edge_mask)]
    ed = np.asarray(gb.edge_dst)[np.asarray(gb.edge_mask)]
    adj_np[es // n_max, es % n_max, ed % n_max] = 1.0
    adj = torch.from_numpy(adj_np)
    return (z, src, dst, bond, rsrc, rdst, ext_src, ext_dst, pos, node2graph,
            z_dense, adj, batch_size)


def measure_torch_cpu(batch_size=256, n_max=32, emb=300, steps=3) -> float:
    """Returns molecules/sec for the torch-CPU proxy pretrain step."""
    import time

    torch.manual_seed(0)
    model = PretrainProxy(emb)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    data = make_proxy_batch(batch_size, n_max)

    # warmup
    loss = model(data)
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.time()
    for _ in range(steps):
        loss = model(data)
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.time() - t0
    return batch_size * steps / dt
