from moleculesde_tpu.models.gnn2d import (
    GNN2D,
    GNNGraphPred,
    AtomEncoder,
    BondEncoder,
    graph_pool,
)
from moleculesde_tpu.models.schnet import SchNet
from moleculesde_tpu.models.painn import PaiNN
from moleculesde_tpu.models.score_2d3d import SDEModel2Dto3D, EquivariantScoreNetwork
from moleculesde_tpu.models.score_3d2d import (
    SDEModel3Dto2D,
    EdgeScoreNetworkDense,
    NodeScoreNetworkDense,
    NodeNetworkDense,
    pow_tensor,
)

__all__ = [
    "GNN2D",
    "GNNGraphPred",
    "AtomEncoder",
    "BondEncoder",
    "graph_pool",
    "SchNet",
    "PaiNN",
    "SDEModel2Dto3D",
    "EquivariantScoreNetwork",
    "SDEModel3Dto2D",
    "EdgeScoreNetworkDense",
    "NodeScoreNetworkDense",
    "NodeNetworkDense",
    "pow_tensor",
]
