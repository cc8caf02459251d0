import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.core import (
    GraphBatch,
    masked_segment_mean,
    masked_segment_sum,
    masked_segment_max,
    segment_softmax,
    pad_graphs,
    mask_adjs,
    mask_x,
    node_flags,
)


def _toy_graphs():
    # triangle molecule + 2-chain molecule
    g1 = {
        "atom_feats": np.tile(np.arange(3)[:, None], (1, 9)).astype(np.int32),
        "edge_index": np.array([[0, 1, 1, 2, 2, 0], [1, 0, 2, 1, 0, 2]]),
        "edge_feats": np.ones((6, 3), dtype=np.int32),
        "positions": np.arange(9, dtype=np.float32).reshape(3, 3),
        "y": np.array([1.0]),
    }
    g2 = {
        "atom_feats": np.full((2, 9), 5, dtype=np.int32),
        "edge_index": np.array([[0, 1], [1, 0]]),
        "edge_feats": np.full((2, 3), 2, dtype=np.int32),
        "positions": np.ones((2, 3), dtype=np.float32),
        "y": np.array([-1.0]),
    }
    return [g1, g2]


def test_pad_graphs_shapes_and_masks():
    batch = pad_graphs(_toy_graphs(), n_max=4, e_max=8, num_tasks=1)
    assert batch.atom_feats.shape == (8, 9)
    assert batch.node_mask.sum() == 5
    assert batch.edge_mask.sum() == 8  # 6 + 2 edges
    assert batch.y.shape == (2, 1)
    # node-major layout: second graph starts at flat index 4
    assert bool(batch.node_mask[4]) and not bool(batch.node_mask[3])
    np.testing.assert_array_equal(
        np.asarray(batch.node2graph()), [0, 0, 0, 0, 1, 1, 1, 1]
    )
    np.testing.assert_array_equal(np.asarray(batch.nodes_per_graph()), [3, 2])


def test_dense_adjacency_matches_edge_list():
    batch = pad_graphs(_toy_graphs(), n_max=4, e_max=8, num_tasks=1)
    vals = jnp.where(batch.edge_mask, 1.0, 0.0)
    adj = batch.dense_adjacency(vals)
    assert adj.shape == (2, 4, 4)
    # triangle graph fully connected off-diagonal on first 3 nodes
    expected0 = np.zeros((4, 4))
    expected0[:3, :3] = 1 - np.eye(3)
    np.testing.assert_allclose(np.asarray(adj[0]), expected0)
    assert float(adj[1, 0, 1]) == 1.0 and float(adj[1, 1, 0]) == 1.0
    assert float(adj[1].sum()) == 2.0


def test_masked_segment_ops():
    data = jnp.array([[1.0], [2.0], [3.0], [100.0]])
    seg = jnp.array([0, 0, 1, 1])
    mask = jnp.array([True, True, True, False])
    s = masked_segment_sum(data, seg, 2, mask)
    np.testing.assert_allclose(np.asarray(s), [[3.0], [3.0]])
    m = masked_segment_mean(data, seg, 2, mask)
    np.testing.assert_allclose(np.asarray(m), [[1.5], [3.0]])
    mx = masked_segment_max(data, seg, 2, mask)
    np.testing.assert_allclose(np.asarray(mx), [[2.0], [3.0]])


def test_segment_softmax_masked():
    logits = jnp.array([0.0, 1.0, 5.0, 100.0])
    seg = jnp.array([0, 0, 1, 1])
    mask = jnp.array([True, True, True, False])
    p = segment_softmax(logits, seg, 2, mask)
    np.testing.assert_allclose(float(p[0] + p[1]), 1.0, rtol=1e-6)
    assert float(p[3]) == 0.0
    np.testing.assert_allclose(float(p[2]), 1.0, rtol=1e-6)


def test_segment_softmax_empty_segment_is_zero():
    logits = jnp.array([1.0, 2.0])
    seg = jnp.array([0, 0])
    mask = jnp.array([False, False])
    p = segment_softmax(logits, seg, 1, mask)
    np.testing.assert_allclose(np.asarray(p), [0.0, 0.0])


def test_node_flags_and_masks():
    adj = jnp.zeros((1, 3, 3)).at[0, 0, 1].set(1.0).at[0, 1, 0].set(1.0)
    flags = node_flags(adj)
    np.testing.assert_allclose(np.asarray(flags), [[1.0, 1.0, 0.0]])
    x = jnp.ones((1, 3, 2))
    np.testing.assert_allclose(np.asarray(mask_x(x, flags)[0, 2]), [0.0, 0.0])
    a = jnp.ones((1, 3, 3))
    ma = mask_adjs(a, flags)
    assert float(ma[0, 2].sum()) == 0.0 and float(ma[0, :, 2].sum()) == 0.0
    a4 = jnp.ones((1, 2, 3, 3))
    ma4 = mask_adjs(a4, flags)
    assert ma4.shape == (1, 2, 3, 3)
    assert float(ma4[0, :, 2].sum()) == 0.0


def test_edge_aggregate_matches_segment_sum():
    """One-hot-matmul aggregation (core.segment.edge_aggregate) must equal
    the generic masked segment_sum on slot-structured edges."""
    import numpy as np

    from moleculesde_tpu.core.segment import (
        edge_aggregate, masked_segment_mean, masked_segment_sum, node_degree)

    rng = np.random.default_rng(0)
    b, n, e, f = 3, 5, 8, 4
    msg = jnp.asarray(rng.normal(size=(b * e, f)).astype(np.float32))
    # edges of graph g live in slot g; destinations local to the graph
    dst_local = rng.integers(0, n, size=(b, e))
    mask = rng.random((b, e)) < 0.7
    dst = jnp.asarray((dst_local + np.arange(b)[:, None] * n).reshape(-1))
    emask = jnp.asarray(mask.reshape(-1))

    ref = masked_segment_sum(msg, dst, b * n, emask, indices_are_sorted=False)
    out = edge_aggregate(msg, dst, b, n, emask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    ref_m = masked_segment_mean(msg, dst, b * n, emask,
                                indices_are_sorted=False)
    out_m = edge_aggregate(msg, dst, b, n, emask, reduce="mean")
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m), atol=1e-5)

    deg = node_degree(dst, b, n, emask)
    ref_deg = masked_segment_sum(jnp.ones_like(dst, dtype=jnp.float32), dst,
                                 b * n, emask, indices_are_sorted=False)
    np.testing.assert_allclose(np.asarray(deg), np.asarray(ref_deg))


def test_onehot_embed_sum_matches_gather():
    """Atom/Bond encoders (one-hot matmul formulation) must equal the
    per-table gather sum exactly."""
    import jax
    import numpy as np

    from moleculesde_tpu.core.batch import ATOM_FEATURE_DIMS
    from moleculesde_tpu.models.gnn2d import AtomEncoder

    rng = np.random.default_rng(1)
    feats = jnp.asarray(np.stack(
        [rng.integers(0, d, size=12) for d in ATOM_FEATURE_DIMS], axis=1
    ).astype(np.int32))
    enc = AtomEncoder(emb_dim=8)
    params = enc.init(jax.random.PRNGKey(0), feats)["params"]
    out = enc.apply({"params": params}, feats)
    ref = 0.0
    for i, d in enumerate(ATOM_FEATURE_DIMS):
        table = np.asarray(params[f"atom_embedding_{i}"]["embedding"])
        ref = ref + table[np.asarray(feats[:, i])]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
