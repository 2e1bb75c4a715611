from pna_tpu.nn.dense import (GATLayerDense, GCNLayerDense, GINLayerDense,
                              PNALayerDense, PNATowerDense)
from pna_tpu.nn.fused import PNALayerFused
from pna_tpu.nn.gnn import GNN, VARIABLE_LAYERS_FUNCTIONS
from pna_tpu.nn.layers import (FCLayer, GRUUpdate, MLP, MLPReadout, S2SReadout,
                               Set2Set)
from pna_tpu.nn.nets import (AtomEncoder, BondEncoder, PNANetHIV,
                             PNANetMolecules, PNANetSuperpixels)
from pna_tpu.nn.pyg import PNAConvPyG, PNAConvSimplePyG, PNANetPyGExample
from pna_tpu.nn.sparse import (GATLayerSparse, GCNLayerSparse, GINLayerSparse,
                               PNALayerSparse, PNASimpleLayerSparse,
                               PNATowerSparse, aggregate_bank)

__all__ = [
    "GATLayerDense", "GCNLayerDense", "GINLayerDense", "PNALayerDense",
    "PNATowerDense", "PNALayerFused", "GNN", "VARIABLE_LAYERS_FUNCTIONS",
    "FCLayer", "GRUUpdate", "MLP", "MLPReadout", "S2SReadout", "Set2Set",
    "AtomEncoder", "BondEncoder", "PNANetHIV", "PNANetMolecules",
    "PNANetSuperpixels", "GATLayerSparse", "GCNLayerSparse", "GINLayerSparse",
    "PNALayerSparse", "PNASimpleLayerSparse", "PNATowerSparse",
    "aggregate_bank", "PNAConvPyG", "PNAConvSimplePyG", "PNANetPyGExample",
]
