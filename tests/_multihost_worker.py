"""Worker for tests/test_multihost.py: one process of a 2-process CPU
'pod' (2 virtual devices per process, 4 global). Runs ONE sharded pretrain
step through the production multi-host path (shard_for_process ->
global_batch_putter -> make_sharded_pretrain_step) and prints the loss."""

import os
import sys

PORT = sys.argv[1]
PID = int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.distributed.initialize(f"localhost:{PORT}", num_processes=2,
                           process_id=PID)

from moleculesde_tpu.core.batch import pad_graphs  # noqa: E402
from moleculesde_tpu.data.synthetic import random_molecule  # noqa: E402
from moleculesde_tpu.parallel import (  # noqa: E402
    global_batch_putter, make_mesh, make_sharded_pretrain_step, replicate,
    shard_for_process)
from moleculesde_tpu.pretrain import (  # noqa: E402
    PretrainConfig, create_pretrain_state)

N_MAX = 8
rng = np.random.default_rng(0)
graphs = [random_molecule(rng, int(rng.integers(4, N_MAX + 1)))
          for _ in range(4)]

shard = shard_for_process(graphs)
assert len(shard) == 2
local_batch = pad_graphs(shard, n_max=N_MAX, e_max=4 * N_MAX,
                         ext_e_max=N_MAX * N_MAX)

cfg = PretrainConfig(emb_dim=16, num_layer=2, dropout_ratio=0.0,
                     schnet_num_interactions=2, schnet_num_gaussians=8,
                     hidden_dim_2dto3d=8)
key = jax.random.PRNGKey(0)
models, state = create_pretrain_state(cfg, local_batch, key)

mesh = make_mesh()
assert mesh.devices.size == 4, mesh
state = replicate(state, mesh)
gbatch = global_batch_putter(mesh)(local_batch)
assert gbatch.num_graphs == 4
step = make_sharded_pretrain_step(models, cfg, mesh)
state, metrics = step(state, gbatch, key, jnp.asarray(1.0))
print(f"LOSS {float(metrics['loss']):.6f}", flush=True)
