from moleculesde_tpu.pretrain.contrastive import do_cl, dual_cl
from moleculesde_tpu.pretrain.train_state import PretrainConfig, PretrainState, create_pretrain_state
from moleculesde_tpu.pretrain.train_step import make_pretrain_step

__all__ = [
    "do_cl",
    "dual_cl",
    "PretrainConfig",
    "PretrainState",
    "create_pretrain_state",
    "make_pretrain_step",
]
