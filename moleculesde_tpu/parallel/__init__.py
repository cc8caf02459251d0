from moleculesde_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_sharded_pretrain_step,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "make_sharded_pretrain_step"]
