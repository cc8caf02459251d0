from moleculesde_tpu.data.extend import extend_graph
from moleculesde_tpu.data.synthetic import random_molecule, synthetic_batch

__all__ = ["extend_graph", "random_molecule", "synthetic_batch"]
