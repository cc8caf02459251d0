"""Device-side ingest (data/compact.py) parity vs the host padded path."""

import jax
import jax.numpy as jnp
import numpy as np

from moleculesde_tpu.core.batch import pad_graphs
from moleculesde_tpu.data.compact import (
    CompactBatch,
    collate_compact,
    collate_compact_packed,
    expand_on_device,
)
from moleculesde_tpu.data.packed import PackedGraphs
from moleculesde_tpu.data.synthetic import random_molecule


def _mols(n=6, seed=0, extend=True):
    rng = np.random.default_rng(seed)
    return [random_molecule(rng, int(rng.integers(3, 12)), extend=extend)
            for _ in range(n)]


def _dense_ext_from_lists(gb):
    """Scatter the host-built ext edge lists to dense (the pre-round-3
    formulation in score_2d3d._pair_mask_attr)."""
    b_idx = np.where(gb.ext_mask, gb.ext_src // gb.n_max, gb.num_graphs)
    s = gb.ext_src % gb.n_max
    d = gb.ext_dst % gb.n_max
    mask = np.zeros((gb.num_graphs, gb.n_max, gb.n_max), bool)
    attr = np.zeros((gb.num_graphs, gb.n_max, gb.n_max), np.int32)
    for k in range(len(s)):
        if b_idx[k] < gb.num_graphs:
            mask[b_idx[k], s[k], d[k]] = True
            attr[b_idx[k], s[k], d[k]] = gb.ext_attr[k]
    return mask, attr


def test_expand_matches_padded_collation():
    mols = _mols()
    n_max, e_max = 16, 64
    gb = pad_graphs(mols, n_max=n_max, e_max=e_max, ext_e_max=n_max * n_max)
    cb = collate_compact(mols, n_max=n_max, e_max=e_max)
    eb = jax.jit(expand_on_device)(cb)

    np.testing.assert_array_equal(np.asarray(eb.atom_feats), gb.atom_feats)
    np.testing.assert_array_equal(np.asarray(eb.node_mask), gb.node_mask)
    np.testing.assert_allclose(np.asarray(eb.positions), gb.positions)
    # edge lists: same (src, dst, feats) multiset per graph
    def edge_set(src, dst, feats, mask):
        return sorted(
            (int(s), int(d), tuple(int(v) for v in f))
            for s, d, f, m in zip(src, dst, feats, mask) if m)
    assert edge_set(np.asarray(eb.edge_src), np.asarray(eb.edge_dst),
                    np.asarray(eb.edge_feats), np.asarray(eb.edge_mask)) == \
        edge_set(gb.edge_src, gb.edge_dst, gb.edge_feats, gb.edge_mask)

    # dense extended graph == scatter of the host extend_graph lists
    ref_mask, ref_attr = _dense_ext_from_lists(gb)
    np.testing.assert_array_equal(np.asarray(eb.ext_dense_mask), ref_mask)
    np.testing.assert_array_equal(np.asarray(eb.ext_dense_attr), ref_attr)


def test_expand_no_extend_aliases_bond_graph():
    mols = _mols(extend=False)
    cb = collate_compact(mols, n_max=16, e_max=64, use_extend=False)
    eb = jax.jit(expand_on_device)(cb)
    gb = pad_graphs(mols, n_max=16, e_max=64, ext_e_max=256)
    ref_mask, ref_attr = _dense_ext_from_lists(gb)
    np.testing.assert_array_equal(np.asarray(eb.ext_dense_mask), ref_mask)
    np.testing.assert_array_equal(np.asarray(eb.ext_dense_attr), ref_attr)


def test_packed_compact_collation_matches_generic():
    mols = _mols(n=10, seed=3, extend=False)
    packed = PackedGraphs.from_graphs(iter(mols))
    idx = np.array([7, 2, 5, 0])
    cb_ref = collate_compact([mols[i] for i in idx], n_max=16, e_max=64)
    cb = collate_compact_packed(packed, idx, n_max=16, e_max=64)
    for name in ("atom_feats", "positions", "n_atoms", "edge_index",
                 "edge_feats", "edge_valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(cb, name)), np.asarray(getattr(cb_ref, name)),
            err_msg=name)


def test_packed_compact_subset_and_padding():
    mols = _mols(n=8, seed=4, extend=False)
    packed = PackedGraphs.from_graphs(iter(mols))
    sub = packed.subset(np.array([1, 3, 5, 7]))
    cb = collate_compact_packed(sub, np.array([2, 0]), n_max=16, e_max=64,
                                num_graphs=4)
    cb_ref = collate_compact([mols[5], mols[1]], n_max=16, e_max=64,
                             num_graphs=4)
    np.testing.assert_array_equal(np.asarray(cb.atom_feats),
                                  np.asarray(cb_ref.atom_feats))
    assert cb.n_atoms[2] == 0 and cb.n_atoms[3] == 0  # padded graphs empty


def test_truncation_drops_bonds_to_clipped_atoms():
    rng = np.random.default_rng(9)
    mol = random_molecule(rng, 14, extend=False)
    n_max = 8
    cb = collate_compact([mol], n_max=n_max, e_max=64)
    assert cb.n_atoms[0] == n_max
    ei = np.asarray(cb.edge_index[0])
    ev = np.asarray(cb.edge_valid[0])
    assert np.all(ei[ev] < n_max)
    packed = PackedGraphs.from_graphs(iter([mol]))
    cb2 = collate_compact_packed(packed, np.array([0]), n_max=n_max, e_max=64)
    # same multiset of surviving bonds
    def bonds(cb):
        ei = np.asarray(cb.edge_index[0])[np.asarray(cb.edge_valid[0])]
        return sorted(map(tuple, ei.tolist()))
    assert bonds(cb) == bonds(cb2)


def test_pretrain_step_compact_matches_padded_loss():
    """One jitted pretrain step fed a CompactBatch must produce the same
    loss as the padded GraphBatch path (same params, same key)."""
    from moleculesde_tpu.data.synthetic import synthetic_batch
    from moleculesde_tpu.pretrain import (
        PretrainConfig, create_pretrain_state, make_pretrain_step)

    mols = _mols(n=4, seed=11, extend=True)
    n_max = 12
    gb = pad_graphs(mols, n_max=n_max, e_max=48, ext_e_max=n_max * n_max)
    cb = collate_compact(mols, n_max=n_max, e_max=48)

    cfg = PretrainConfig(emb_dim=16, num_layer=2, dropout_ratio=0.0,
                         schnet_num_filters=8, schnet_num_interactions=2,
                         schnet_num_gaussians=10, hidden_dim_2dto3d=8)
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, gb, key)
    step = make_pretrain_step(models, cfg)
    _, m_pad = step(state, gb, key, jnp.asarray(1.0))
    models2, state2 = create_pretrain_state(cfg, gb, key)
    step2 = make_pretrain_step(models2, cfg)
    _, m_cb = step2(state2, cb, key, jnp.asarray(1.0))
    np.testing.assert_allclose(float(m_pad["loss"]), float(m_cb["loss"]),
                               rtol=2e-5)


def test_graphloader_compact_mode_and_threads():
    from moleculesde_tpu.data.loader import GraphLoader, ThreadedLoader

    mols = _mols(n=25, seed=7, extend=False)
    packed = PackedGraphs.from_graphs(iter(mols))
    loader = GraphLoader(packed, batch_size=8, n_max=16, e_max=64,
                         shuffle=True, drop_last=True, seed=1,
                         collate="compact")
    seq = [(np.asarray(b.atom_feats).copy(), n) for b, n in loader]
    assert len(seq) == 3 and all(n == 8 for _, n in seq)
    assert all(isinstance(b, CompactBatch) for b, _ in
               GraphLoader(packed, batch_size=8, n_max=16, e_max=64,
                           shuffle=False, collate="compact"))

    # threaded wrapper: same batches in the same order (same seed)
    loader2 = GraphLoader(packed, batch_size=8, n_max=16, e_max=64,
                          shuffle=True, drop_last=True, seed=1,
                          collate="compact")
    threaded = ThreadedLoader(loader2, num_workers=3)
    seq_t = [(np.asarray(b.atom_feats).copy(), n) for b, n in threaded]
    assert len(seq_t) == len(seq)
    for (a, _), (b, _) in zip(seq, seq_t):
        np.testing.assert_array_equal(a, b)


def test_threadedloader_padded_mode():
    from moleculesde_tpu.data.loader import GraphLoader, ThreadedLoader

    mols = _mols(n=10, seed=8)
    loader = GraphLoader(mols, batch_size=4, n_max=16, e_max=64,
                         shuffle=False, drop_last=False, seed=0)
    plain = [np.asarray(b.atom_feats).copy() for b, _ in loader]
    loader2 = GraphLoader(mols, batch_size=4, n_max=16, e_max=64,
                          shuffle=False, drop_last=False, seed=0)
    thr = [np.asarray(b.atom_feats).copy()
           for b, _ in ThreadedLoader(loader2, num_workers=2)]
    assert len(plain) == len(thr) == 3
    for a, b in zip(plain, thr):
        np.testing.assert_array_equal(a, b)
