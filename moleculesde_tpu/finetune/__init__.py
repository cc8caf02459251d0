from moleculesde_tpu.finetune.classification import (
    create_classification_state,
    make_classification_steps,
)
from moleculesde_tpu.finetune.regression import (
    create_regression_state,
    make_regression_steps,
)
from moleculesde_tpu.finetune.md17 import create_md17_state, make_md17_steps

__all__ = [
    "create_classification_state",
    "make_classification_steps",
    "create_regression_state",
    "make_regression_steps",
    "create_md17_state",
    "make_md17_steps",
]
