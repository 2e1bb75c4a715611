"""Tower tensor-parallelism for the fused PNA layer.

PNA towers are independent channel groups (reference:
models/pytorch/pna/layer.py:90-106 splits channels per tower and only the
mixing FC couples them), which makes the ``towers`` axis of
``PNALayerFused``'s stacked pretrans/posttrans weights a natural TP unit:

* stacked kernels ``[T, fi, fo]`` and biases ``[T, fo]`` shard over a
  ``model`` mesh axis;
* with ``PNALayerFused(tp_axis='model')`` the per-tower contractions run as
  batched einsums constrained to keep the tower axis sharded, so each device
  computes only its own towers end-to-end (pretrans -> aggregation ->
  posttrans);
* GSPMD inserts the all-gather exactly once per layer, at the mixing FC
  (whose input concatenates all towers).

Everything is GSPMD/pjit: no shard_map needed — composes freely with the
``data`` axis of the trainers.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tower_param_specs(params: Any, axis: str = 'model') -> Any:
    """PartitionSpec tree for a model containing PNALayerFused submodules:
    the leading (towers) axis of every stacked pretrans/posttrans kernel and
    bias is sharded over ``axis``; every other parameter is replicated."""

    def spec_for(path, leaf):
        keys = [getattr(k, 'key', getattr(k, 'name', '')) for k in path]
        stacked = any(k in ('pretrans', 'posttrans') for k in keys)
        if stacked and leaf.ndim >= 1:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_tower_params(params: Any, mesh: Mesh, axis: str = 'model') -> Any:
    """Place params on ``mesh`` with the tower axis sharded over ``axis``."""
    specs = tower_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
