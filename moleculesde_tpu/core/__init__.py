from moleculesde_tpu.core.batch import GraphBatch, pad_graphs, node2graph_ids
from moleculesde_tpu.core.segment import (
    masked_segment_sum,
    masked_segment_mean,
    masked_segment_max,
    segment_softmax,
)
from moleculesde_tpu.core.masks import mask_x, mask_adjs, node_flags

__all__ = [
    "GraphBatch",
    "pad_graphs",
    "node2graph_ids",
    "masked_segment_sum",
    "masked_segment_mean",
    "masked_segment_max",
    "segment_softmax",
    "mask_x",
    "mask_adjs",
    "node_flags",
]
