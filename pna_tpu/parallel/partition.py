"""Multi-chip graph parallelism: edge partitioning + halo exchange.

This is the framework's scaling component (BASELINE.json north star; the
reference has no distributed support at all — SURVEY §2.5): a large graph is
partitioned by contiguous node ranges across a ``graph`` mesh axis; each device
owns its node range plus all in-edges of those nodes.  Sender features that
live on other devices ("halo" nodes) are exchanged with a single
``all_to_all`` over ICI, then aggregation is a local segment reduction.

All indexing is precomputed host-side into static-shape arrays, so the whole
step is one compiled SPMD program:

  send_buf  = feats[send_idx]              # gather owned features per peer
  recv_buf  = all_to_all(send_buf)         # halo exchange over the mesh axis
  ghost     = concat([feats, recv_buf])    # local + received feature table
  msg       = ghost[senders_local]         # edge gather
  out       = segment_agg(msg, receivers_local)

Overlap: edges are pre-sorted so that edges whose sender is local come first;
XLA's async collectives let the local-edge aggregation overlap with the
all_to_all (the boundary edges are reduced after the wait).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pna_tpu.ops import segment as seg


@dataclass
class EdgePartition:
    """Host-built static-shape partition of one big graph over P devices.

    Arrays are stacked with a leading device axis [P, ...] so they can be
    sharded over the ``graph`` mesh axis and consumed inside shard_map.
    """
    num_parts: int
    nodes_per_part: int          # Nl (padded)
    halo_size: int               # H (max nodes any peer pair exchanges)
    edges_per_part: int          # El (padded)
    num_nodes: int               # true number of nodes (pre-padding)

    senders_local: np.ndarray    # [P, El] int32 — index into ghost table
    receivers_local: np.ndarray  # [P, El] int32 — local node index
    edge_mask: np.ndarray        # [P, El] bool
    send_idx: np.ndarray         # [P, P, H] int32 — local ids to send to peer
    send_mask: np.ndarray        # [P, P, H] bool
    node_mask: np.ndarray        # [P, Nl] bool — real (non-padding) nodes


def partition_edges(senders: np.ndarray, receivers: np.ndarray,
                    num_nodes: int, num_parts: int,
                    edge_pad_multiple: int = 8,
                    halo_pad_multiple: int = 8) -> EdgePartition:
    """Partition by contiguous node ranges; each edge lives on the part that
    owns its receiver."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    nl = -(-num_nodes // num_parts)  # ceil
    owner_r = receivers // nl
    owner_s = senders // nl

    # group edges by owner of receiver, local senders first (overlap-friendly)
    edge_lists = []
    for p in range(num_parts):
        sel = np.nonzero(owner_r == p)[0]
        local_first = np.argsort(owner_s[sel] != p, kind='stable')
        edge_lists.append(sel[local_first])
    el = max((len(e) for e in edge_lists), default=1)
    el = max(-(-el // edge_pad_multiple) * edge_pad_multiple, edge_pad_multiple)

    # halo: for each (src_part q, dst_part p), unique sender nodes q must ship to p
    send_lists: Dict[Tuple[int, int], np.ndarray] = {}
    h = 1
    for p in range(num_parts):
        e = edge_lists[p]
        s = senders[e]
        remote = s[owner_s[e] != p]
        for q in range(num_parts):
            if q == p:
                continue
            nodes_q = np.unique(remote[(remote // nl) == q])
            send_lists[(q, p)] = nodes_q
            h = max(h, len(nodes_q))
    h = max(-(-h // halo_pad_multiple) * halo_pad_multiple, halo_pad_multiple)

    send_idx = np.zeros((num_parts, num_parts, h), dtype=np.int32)
    send_mask = np.zeros((num_parts, num_parts, h), dtype=bool)
    # ghost position lookup: for each p, map global node -> ghost index
    ghost_pos = [dict() for _ in range(num_parts)]
    for p in range(num_parts):
        base = 0  # local nodes occupy [0, nl)
        for q in range(num_parts):
            if q == p:
                continue
            nodes_q = send_lists[(q, p)]
            send_idx[q, p, :len(nodes_q)] = (nodes_q - q * nl).astype(np.int32)
            send_mask[q, p, :len(nodes_q)] = True
            for k, gnode in enumerate(nodes_q):
                # after all_to_all, the block from q sits at [q*h, (q+1)*h)
                ghost_pos[p][int(gnode)] = nl + q * h + k

    senders_local = np.zeros((num_parts, el), dtype=np.int32)
    receivers_local = np.zeros((num_parts, el), dtype=np.int32)
    edge_mask = np.zeros((num_parts, el), dtype=bool)
    for p in range(num_parts):
        e = edge_lists[p]
        for k, ei in enumerate(e):
            s_g = int(senders[ei])
            if s_g // nl == p:
                senders_local[p, k] = s_g - p * nl
            else:
                senders_local[p, k] = ghost_pos[p][s_g]
            receivers_local[p, k] = int(receivers[ei]) - p * nl
        edge_mask[p, :len(e)] = True

    node_mask = np.zeros((num_parts, nl), dtype=bool)
    for p in range(num_parts):
        lo, hi = p * nl, min((p + 1) * nl, num_nodes)
        if hi > lo:
            node_mask[p, :hi - lo] = True

    return EdgePartition(
        num_parts=num_parts, nodes_per_part=nl, halo_size=h,
        edges_per_part=el, num_nodes=num_nodes,
        senders_local=senders_local, receivers_local=receivers_local,
        edge_mask=edge_mask, send_idx=send_idx, send_mask=send_mask,
        node_mask=node_mask)


def halo_exchange(feats_local: jnp.ndarray, send_idx: jnp.ndarray,
                  send_mask: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: ship owned features to every peer, receive the halo.

    feats_local [Nl, F]; send_idx/send_mask [1, P, H] (this device's row).
    Returns the received block [P*H, F] (position q*H+k = k-th node from q).
    """
    send_buf = feats_local[send_idx[0]]                       # [P, H, F]
    send_buf = send_buf * send_mask[0][..., None].astype(send_buf.dtype)
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0, tiled=False)     # [P, H, F]
    return recv.reshape(-1, feats_local.shape[-1])


def make_distributed_aggregate(part: EdgePartition, mesh: Mesh,
                               axis_name: str = 'graph',
                               aggregators: Sequence[str] = ('mean', 'max',
                                                             'min', 'std'),
                               scalers: Sequence[str] = ('identity',
                                                         'amplification',
                                                         'attenuation'),
                               avg_d: Optional[dict] = None):
    """Build a pjit-able function: node feats [P, Nl, F] (sharded over
    ``axis_name``) -> aggregated node feats [P, Nl, A*S*F].

    This is the distributed counterpart of
    ``pna_tpu.nn.sparse.aggregate_bank``; single-device equivalence is tested
    in tests/test_partition.py.
    """
    from pna_tpu.nn.sparse import aggregate_bank
    from pna_tpu.graph import Graph
    avg_d = avg_d or {'lin': 1.0, 'log': 1.0, 'exp': 1.0}

    from jax import shard_map

    def local_fn(feats, senders_l, receivers_l, edge_mask, send_idx, send_mask,
                 node_mask):
        # shard_map gives each device its slice with the leading axis kept: [1, ...]
        feats = feats[0]
        halo = halo_exchange(feats, send_idx, send_mask, axis_name)
        ghost = jnp.concatenate([feats, halo], axis=0)
        msg = ghost[senders_l[0]]
        g = Graph(node_feats=feats, senders=senders_l[0],
                  receivers=receivers_l[0], node_graph_ids=jnp.zeros(
                      (feats.shape[0],), jnp.int32),
                  node_mask=node_mask[0], edge_mask=edge_mask[0],
                  graph_mask=jnp.ones((1,), bool))
        out = aggregate_bank(g, msg, list(aggregators), list(scalers), avg_d)
        return out[None]

    spec = P(axis_name)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(spec,) * 7, out_specs=spec)

    sharded_const = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, spec))
    consts = tuple(sharded_const(x) for x in
                   (part.senders_local, part.receivers_local, part.edge_mask,
                    part.send_idx, part.send_mask, part.node_mask))

    @jax.jit
    def aggregate(feats_sharded):
        return fn(feats_sharded, *consts)

    return aggregate


def powerlaw_graph(num_nodes: int, num_edges: int, seed: int = 0,
                   exponent: float = 1.5) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic power-law (Zipf-ish) directed graph for the scaling benchmark
    (BASELINE.json config 5: 10M nodes / 100M edges)."""
    rng = np.random.RandomState(seed)
    # preferential weights ~ rank^-exponent over a permuted node order
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    w = ranks ** -exponent
    w /= w.sum()
    perm = rng.permutation(num_nodes)
    senders = perm[rng.choice(num_nodes, size=num_edges, p=w)]
    receivers = rng.randint(0, num_nodes, size=num_edges)
    return senders.astype(np.int64), receivers.astype(np.int64)
