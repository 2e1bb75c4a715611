"""Multitask loss functions — equivalents of ``multitask_benchmark/util/util.py``.

``total_loss`` weights the node and graph losses by their task counts
(util.py:62-66); ``specific_loss`` reports per-task losses (util.py:79-96).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


def get_loss(loss: str, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mse or cross_entropy (util.py:37-49); cross_entropy targets are 1-hot."""
    if loss == "mse":
        return jnp.mean((output - target) ** 2)
    elif loss == "cross_entropy":
        if output.ndim > 2:
            output = output.reshape(-1, output.shape[-1])
            target = target.reshape(-1, target.shape[-1])
        labels = jnp.argmax(target, axis=1)
        logp = jax.nn.log_softmax(output, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    raise ValueError(f"loss function not supported: {loss}")


def total_loss(output: Tuple, target: Tuple, loss: str = 'mse',
               only_nodes: bool = False, only_graph: bool = False) -> jnp.ndarray:
    """Average of the average losses of each task (util.py:52-71)."""
    assert not (only_nodes and only_graph)
    if only_nodes:
        return get_loss(loss, output[0], target[0])
    if only_graph:
        return get_loss(loss, output[1], target[1])
    nodes_loss = get_loss(loss, output[0], target[0])
    graph_loss = get_loss(loss, output[1], target[1])
    n_n = output[0].shape[-1]
    n_g = output[1].shape[-1]
    return (nodes_loss * n_n + graph_loss * n_g) / (n_n + n_g)


def specific_loss(output: Tuple, target: Tuple, loss: str = 'mse',
                  only_nodes: bool = False, only_graph: bool = False) -> List[float]:
    """Per-task average losses (util.py:79-96)."""
    assert not (only_nodes and only_graph)
    out = []
    if not only_graph:
        for k in range(output[0].shape[-1]):
            out.append(float(get_loss(loss, output[0][..., k], target[0][..., k])))
    if not only_nodes:
        for k in range(output[1].shape[-1]):
            out.append(float(get_loss(loss, output[1][..., k], target[1][..., k])))
    return out


def total_loss_multiple_batches(outputs, targets, loss='mse', only_nodes=False,
                                only_graph=False) -> float:
    """Batches weighted equally regardless of cardinality (util.py:74-76)."""
    n = len(outputs[0])
    return sum(
        float(total_loss((outputs[0][b], outputs[1][b]),
                         (targets[0][b], targets[1][b]),
                         loss, only_nodes, only_graph))
        for b in range(n)) / n


def specific_loss_multiple_batches(outputs, targets, loss='mse',
                                   only_nodes=False, only_graph=False):
    """Per-task losses averaged over batches (util.py:99-111)."""
    n = len(outputs[0])
    sums = None
    for b in range(n):
        sl = specific_loss((outputs[0][b], outputs[1][b]),
                           (targets[0][b], targets[1][b]),
                           loss, only_nodes, only_graph)
        sums = sl if sums is None else [a + b_ for a, b_ in zip(sums, sl)]
    return [s / n for s in sums]
