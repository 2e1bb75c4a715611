"""Graph-level readouts over batched graphs — segment reductions keyed by the
node->graph id vector, replacing ``dgl.{sum,max,mean}_nodes``
(realworld_benchmark/nets/molecules_graph_regression/pna_net.py:83-90)."""

from __future__ import annotations

import jax.numpy as jnp

from pna_tpu.graph import Graph
from pna_tpu.ops import segment as seg


def sum_nodes(graph: Graph, h: jnp.ndarray) -> jnp.ndarray:
    return seg.segment_sum(h, graph.node_graph_ids, graph.n_graph_pad,
                           graph.node_mask)


def mean_nodes(graph: Graph, h: jnp.ndarray) -> jnp.ndarray:
    return seg.segment_mean(h, graph.node_graph_ids, graph.n_graph_pad,
                            graph.node_mask)


def max_nodes(graph: Graph, h: jnp.ndarray) -> jnp.ndarray:
    return seg.segment_max(h, graph.node_graph_ids, graph.n_graph_pad,
                           graph.node_mask)


READOUTS = {'sum': sum_nodes, 'mean': mean_nodes, 'max': max_nodes}


def readout(name: str, graph: Graph, h: jnp.ndarray) -> jnp.ndarray:
    return READOUTS.get(name, mean_nodes)(graph, h)
