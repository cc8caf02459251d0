from moleculesde_tpu.parallel.mesh import (
    global_batch_putter,
    initialize_distributed,
    make_mesh,
    make_sharded_pretrain_step,
    replicate,
    shard_batch,
    shard_for_process,
    sharded_jit,
)

__all__ = [
    "global_batch_putter",
    "initialize_distributed",
    "make_mesh",
    "make_sharded_pretrain_step",
    "replicate",
    "shard_batch",
    "shard_for_process",
    "sharded_jit",
]
