from moleculesde_tpu.utils.checkpoints import (
    save_pretrain_checkpoint,
    load_pretrain_checkpoint,
    save_train_state,
    load_train_state,
)
from moleculesde_tpu.utils.schedulers import make_lr_schedule
from moleculesde_tpu.utils.metrics import roc_auc_per_task, MetricsLogger

__all__ = [
    "save_pretrain_checkpoint",
    "load_pretrain_checkpoint",
    "save_train_state",
    "load_train_state",
    "make_lr_schedule",
    "roc_auc_per_task",
    "MetricsLogger",
]
