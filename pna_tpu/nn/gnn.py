"""Generic GNN model assembly — equivalent of ``models/pytorch/gnn_framework.py``.

Layer-type-agnostic conv stack with the reference's four structural options
(gnn_framework.py:8-108):
* ``skip``  — concat input + every layer output into the readout (:104-106)
* ``gru``   — shared GRU update after each conv (:94)
* ``fixed`` — weight-share one middle layer across depth (:90-91)
* ``variable`` — depth computed from the adjacency at call time (:90).  XLA
  needs static shapes, so variable depth specializes the compiled graph per
  (N, depth) bucket — each dataset bucket has fixed N, hence fixed depth; the
  Python-level depth computation happens at trace time, mirroring the
  per-bucket loop of the reference training engine.

Dual readout: node MLP + graph Set2Set readout (:79-84, :108).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pna_tpu.nn.layers import GRUUpdate, MLP, S2SReadout

# multitask_benchmark/util/train.py:58-64
VARIABLE_LAYERS_FUNCTIONS = {
    'N': lambda n: n,
    'N/2': lambda n: n // 2,
    '4log2N': lambda n: int(4 * math.log2(n)),
    '2log2N': lambda n: int(2 * math.log2(n)),
    '3sqrtN': lambda n: int(3 * math.sqrt(n)),
}


class GNN(nn.Module):
    """Generic dense-graph GNN (gnn_framework.py:8-108).

    ``first_conv`` / ``middle_conv`` are descriptor dicts
    {"layer_type": flax Module class, "args": dict} mirroring the reference's
    first/middle conv descriptors (gnn_framework.py:62-74).
    ``conv_layers`` is an int, or a name from VARIABLE_LAYERS_FUNCTIONS when
    ``variable`` is set (depth is then a function of N, resolved at trace time).
    """
    nhid: int
    nodes_out: int
    graph_out: int
    first_conv: Dict[str, Any]
    middle_conv: Dict[str, Any]
    conv_layers: Any = 2
    fc_layers: int = 3
    dropout: float = 0.0
    final_activation: Optional[str] = 'leakyrelu'
    skip: bool = False
    gru: bool = False
    fixed: bool = False
    variable: bool = False

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        if self.variable:
            assert self.fixed, "With a variable number of layers they must be fixed"
            assert not self.skip, "cannot have skip and fixed at the same time"
            n_layers = VARIABLE_LAYERS_FUNCTIONS[self.conv_layers](adj.shape[1])
        else:
            n_layers = int(self.conv_layers)

        first = self.first_conv["layer_type"](
            out_features=self.nhid, **self.first_conv.get("args", {}),
            name='conv_0')
        if self.fixed:
            middle = self.middle_conv["layer_type"](
                out_features=self.nhid, **self.middle_conv.get("args", {}),
                name='conv_mid')
            convs = [first] + [middle] * (n_layers - 1)
        else:
            convs = [first] + [
                self.middle_conv["layer_type"](
                    out_features=self.nhid, **self.middle_conv.get("args", {}),
                    name=f'conv_{i}')
                for i in range(1, n_layers)]

        gru = GRUUpdate(hidden_size=self.nhid, name='gru') if self.gru else None

        skip_connections = [x] if self.skip else None
        for layer, conv in enumerate(convs):
            y = conv(x, adj, train)
            x = y if gru is None else gru(x, y)
            if self.skip:
                skip_connections.append(x)
            if layer != n_layers - 1 and self.dropout:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)

        if self.skip:
            x = jnp.concatenate(skip_connections, axis=2)

        n_conv_out = x.shape[-1]
        nodes = MLP(hidden_size=n_conv_out, out_size=self.nodes_out,
                    layers=self.fc_layers, mid_activation='leakyrelu',
                    last_activation=self.final_activation,
                    name='nodes_read_out')(x, train)
        graph = S2SReadout(hidden_size=n_conv_out, out_size=self.graph_out,
                           fc_layers=self.fc_layers,
                           final_activation=self.final_activation,
                           name='graph_read_out')(x, train)
        return nodes, graph
