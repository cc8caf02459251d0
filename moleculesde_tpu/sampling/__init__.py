from moleculesde_tpu.sampling.pc import (
    sample_positions_pc,
    sample_graph_pc,
    repeat_graph_batch,
)

__all__ = ["sample_positions_pc", "sample_graph_pc", "repeat_graph_batch"]
