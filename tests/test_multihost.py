"""Multi-host data parallelism (parallel/mesh.py): per-process dataset
sharding and a REAL 2-process jax.distributed run on CPU (2 virtual devices
per process = 4-device global mesh), validated against the single-process
4-device result."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from moleculesde_tpu.parallel import shard_for_process

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_shard_for_process_disjoint_covering_equal():
    graphs = list(range(23))
    shards = [shard_for_process(graphs, p, 4) for p in range(4)]
    # equalized: every process gets exactly floor(23/4) = 5 items
    assert all(len(s) == 5 for s in shards)
    flat = [x for s in shards for x in s]
    assert len(set(flat)) == len(flat)  # disjoint
    # strided and deterministic
    assert shards[1] == [1, 5, 9, 13, 17]


def test_shard_for_process_packed_subset():
    from moleculesde_tpu.data.packed import PackedGraphs
    from moleculesde_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(0)
    packed = PackedGraphs.from_graphs(
        random_molecule(rng, 6, extend=False) for _ in range(10))
    s = shard_for_process(packed, 1, 3)
    assert len(s) == 3
    np.testing.assert_array_equal(
        s[0]["atom_feats"], packed[1]["atom_feats"])


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    """Two real jax.distributed processes produce identical, finite losses —
    and they match a single-process 4-device run over the same global batch
    (strided shard order)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = [subprocess.Popen([sys.executable, worker, port, str(p)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=REPO)
             for p in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    losses = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        line = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert line, out + err[-1000:]
        losses.append(float(line[0].split()[1]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-5)
    assert np.isfinite(losses[0])

    # single-process 4-device reference over the identical global batch
    import jax
    import jax.numpy as jnp

    from moleculesde_tpu.core.batch import pad_graphs
    from moleculesde_tpu.data.synthetic import random_molecule
    from moleculesde_tpu.parallel import (
        make_mesh, make_sharded_pretrain_step, replicate, shard_batch)
    from moleculesde_tpu.pretrain import PretrainConfig, create_pretrain_state

    n_max = 8
    rng = np.random.default_rng(0)
    graphs = [random_molecule(rng, int(rng.integers(4, n_max + 1)))
              for _ in range(4)]
    # global order under 2-process strided sharding: proc0 rows then proc1
    ordered = [graphs[0], graphs[2], graphs[1], graphs[3]]
    batch = pad_graphs(ordered, n_max=n_max, e_max=4 * n_max,
                       ext_e_max=n_max * n_max)
    cfg = PretrainConfig(emb_dim=16, num_layer=2, dropout_ratio=0.0,
                         schnet_num_interactions=2, schnet_num_gaussians=8,
                         hidden_dim_2dto3d=8)
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, batch, key)
    mesh = make_mesh(4)
    state = replicate(state, mesh)
    step = make_sharded_pretrain_step(models, cfg, mesh)
    state, metrics = step(state, shard_batch(batch, mesh), key,
                          jnp.asarray(1.0))
    assert float(metrics["loss"]) == pytest.approx(losses[0], abs=1e-4)
