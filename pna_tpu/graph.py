"""Static-shape graph data structures for TPU.

The reference keeps three graph representations (dense ``B x N x N`` adjacency in
``models/pytorch/pna/aggregators.py:7-8``, DGL degree-bucketed mailboxes in
``models/dgl/pna_layer.py:45-50``, and PyG edge lists in
``models/pytorch_geometric/pna.py:129-159``).  On TPU we collapse everything into a
single padded edge-list representation: XLA requires static shapes, and segment
operations over an edge list are degree-agnostic (no degree bucketing, no ragged
mailboxes).  A dense-adjacency adapter is kept as a first-class citizen because the
multitask benchmark's graphs are tiny (N <= 100) and dense aggregation maps directly
onto the MXU.

Conventions
-----------
* An edge ``k`` carries a message from ``senders[k]`` to ``receivers[k]``.  The dense
  equivalent is ``adj[i, j] == 1  =>  sender=j, receiver=i`` so that aggregating over
  ``receivers`` reproduces ``sum_j adj[i, j] * X[j]`` (row-normalised aggregation as in
  ``models/pytorch/pna/aggregators.py:19-26``).
* Padding: node/edge/graph arrays are padded to static sizes.  Padded edges have
  ``senders == receivers == n_node_pad - 1`` and ``edge_mask == False``; padded nodes
  live at the tail with ``node_mask == False`` and belong to the last (padded) graph.
* ``node_graph_ids`` maps each node to its graph for batched readouts, replacing
  ``dgl.batch`` (``realworld_benchmark/data/molecules.py:163``).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Graph:
    """A (batch of) graph(s) as one padded edge list.

    All leaves are jnp arrays with static shapes; the whole object is a pytree and
    can flow through jit/pjit/shard_map.
    """

    node_feats: jnp.ndarray            # [N_pad, F] float
    senders: jnp.ndarray               # [E_pad] int32 (message source)
    receivers: jnp.ndarray             # [E_pad] int32 (message destination)
    node_graph_ids: jnp.ndarray        # [N_pad] int32
    node_mask: jnp.ndarray             # [N_pad] bool
    edge_mask: jnp.ndarray             # [E_pad] bool
    graph_mask: jnp.ndarray            # [G_pad] bool
    edge_feats: Optional[jnp.ndarray] = None   # [E_pad, Fe] float
    # graph-norm factors sqrt(1/|V_g|), sqrt(1/|E_g|) per node/edge
    # (reference: realworld_benchmark/data/molecules.py:153-164)
    snorm_n: Optional[jnp.ndarray] = None      # [N_pad, 1] float
    snorm_e: Optional[jnp.ndarray] = None      # [E_pad, 1] float
    # ELL (padded neighbor-list) layout: for each node, the edge ids of its
    # in-edges padded to the max in-degree.  This is the TPU-native
    # aggregation layout — gather + masked reduction over a static axis, no
    # scatter (XLA scatter is the slow path on TPU).  Built host-side by
    # ``batch_graphs``; None when degree exceeds ``ell_max_degree``.
    nbr_edge_ids: Optional[jnp.ndarray] = None  # [N_pad, D_max] int32
    nbr_mask: Optional[jnp.ndarray] = None      # [N_pad, D_max] bool
    # CSR row pointers over the receiver-sorted edge list: node n owns edges
    # [edge_ptr[n], edge_ptr[n+1]).  Present only when the batcher sorted the
    # edges by receiver; enables the sequential-read Pallas sketch kernel
    # (pna_tpu/ops/pallas_kernels.py) instead of any gather.
    edge_ptr: Optional[jnp.ndarray] = None      # [N_pad + 1] int32
    # Degree-bucketed static layout (the TPU replacement for DGL's runtime
    # degree bucketing, models/dgl/pna_layer.py:45-50): nodes are ordered by
    # in-degree bucket, edges by (bucket, receiver), so for each (degree d,
    # capacity c) in ``bucket_spec`` the corresponding edge range reshapes to
    # a dense [c, d, F] tensor — aggregation becomes plain axis reductions,
    # the receiver gather a broadcast, and the backward an expansion: no
    # gather/scatter at all.  ``bucket_spec`` is static metadata (part of the
    # pytree structure), so shapes stay XLA-static.
    bucket_spec: Optional[Tuple[Tuple[int, int], ...]] = struct.field(
        pytree_node=False, default=None)        # ((degree, capacity), ...)
    # true in-degree per node (bucket classes may hold nodes whose real
    # degree is below the class width; dummy slots are 0)
    in_deg: Optional[jnp.ndarray] = None        # [N_pad] float32

    @property
    def n_node_pad(self) -> int:
        return self.node_feats.shape[0]

    @property
    def n_edge_pad(self) -> int:
        return self.senders.shape[0]

    @property
    def n_graph_pad(self) -> int:
        return self.graph_mask.shape[0]

    def in_degrees(self, dtype=jnp.float32) -> jnp.ndarray:
        """Number of in-edges per node ([N_pad]). Padded edges do not count."""
        ones = self.edge_mask.astype(dtype)
        return jax.ops.segment_sum(ones, self.receivers,
                                   num_segments=self.n_node_pad)

    def out_degrees(self, dtype=jnp.float32) -> jnp.ndarray:
        ones = self.edge_mask.astype(dtype)
        return jax.ops.segment_sum(ones, self.senders,
                                   num_segments=self.n_node_pad)

    def nodes_per_graph(self, dtype=jnp.float32) -> jnp.ndarray:
        ones = self.node_mask.astype(dtype)
        return jax.ops.segment_sum(ones, self.node_graph_ids,
                                   num_segments=self.n_graph_pad)


# ---------------------------------------------------------------------------
# Construction helpers (host-side, numpy)
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_classes(counts: dict, max_buckets: int) -> dict:
    """Map each distinct in-degree to a class width >= it, using at most
    ``max_buckets`` classes, minimizing the number of dummy edge slots
    (sum over nodes of class(d) - d).  Small DP over contiguous groups."""
    degs = sorted(d for d in counts if d > 0)
    if not degs or len(degs) <= max_buckets:
        return {d: d for d in degs}
    m = len(degs)
    cnts = [counts[d] for d in degs]
    INF = float('inf')
    # cost of grouping degs[i..j] into one class of width degs[j]
    cost = [[0] * m for _ in range(m)]
    for i in range(m):
        acc = 0
        for j in range(i, m):
            acc = sum(cnts[k] * (degs[j] - degs[k]) for k in range(i, j + 1))
            cost[i][j] = acc
    best = [[INF] * (max_buckets + 1) for _ in range(m + 1)]
    arg = [[-1] * (max_buckets + 1) for _ in range(m + 1)]
    best[0][0] = 0
    for j in range(1, m + 1):
        for k in range(1, max_buckets + 1):
            for i in range(j):
                c = best[i][k - 1] + cost[i][j - 1]
                if c < best[j][k]:
                    best[j][k] = c
                    arg[j][k] = i
    k = min(range(1, max_buckets + 1), key=lambda kk: best[m][kk])
    mapping = {}
    j = m
    while j > 0:
        i = arg[j][k]
        for t in range(i, j):
            mapping[degs[t]] = degs[j - 1]
        j, k = i, k - 1
    return mapping


def _bucketize(node_feats, senders, receivers, node_graph_ids, node_mask,
               edge_mask, edge_feats, snorm_n, snorm_e, n_graph_pad,
               bucket_caps=None, max_buckets=4):
    """Reorder a padded batch into the degree-bucketed static layout.

    Nodes are grouped by in-degree (bucket d holds ``cap_d`` node slots, real
    nodes first, dummy slots after); the edge array is rebuilt so bucket d's
    range is exactly [cap_d * d] edges with node k's d in-edges contiguous at
    ``edge_off_d + (k - node_off_d) * d``.  Dummy slots carry masked
    self-loop edges so every reshape stays dense.  Returns the new arrays
    plus the static ``bucket_spec`` ((degree, capacity), ...).
    """
    N = len(node_mask)
    deg = np.zeros(N, np.int64)
    np.add.at(deg, receivers[edge_mask], 1)
    deg[~node_mask] = 0
    real = np.nonzero(node_mask)[0]

    counts = {}
    for d in deg[real]:
        counts[int(d)] = counts.get(int(d), 0) + 1
    # merge degrees into at most ``max_buckets`` classes (fewer buckets =
    # fewer XLA ops; the dummy-slot waste is DP-minimized).  With explicit
    # ``bucket_caps``, its keys define the classes instead.
    if bucket_caps is None:
        cls_of = _choose_classes(counts, max_buckets)
        cls_of[0] = 0
        ccounts = {}
        for d, c in counts.items():
            D = cls_of[d]
            ccounts[D] = ccounts.get(D, 0) + c
        caps = dict(ccounts)
        caps[0] = caps.get(0, 0) + max(int((~node_mask).sum()), 1)
    else:
        caps = {int(d): int(c) for d, c in dict(bucket_caps).items()}
        cls_of = {}
        for d in list(counts) + [0]:
            D = min((D for D in caps if D >= d), default=None)
            if D is None:
                raise ValueError(f"no bucket class >= degree {d} in caps")
            cls_of[d] = D
        ccounts = {}
        for d, c in counts.items():
            D = cls_of[d]
            ccounts[D] = ccounts.get(D, 0) + c
        for D, c in ccounts.items():
            if caps.get(D, 0) < c:
                raise ValueError(
                    f"bucket_caps[{D}]={caps.get(D, 0)} < {c} nodes in batch")
    # capacities to multiples of 8 so every bucket's node range AND edge
    # range (cap * d) starts on a sublane-tile boundary — unaligned slices
    # force XLA to insert layout copies on every per-bucket view
    caps = {d: _round_up(c, 8) for d, c in caps.items()}
    spec = tuple(sorted((int(d), int(c)) for d, c in caps.items()))
    max_d = max(d for d, _ in spec)
    max_deg_obs = int(deg.max()) if len(deg) else 0
    cls_arr = np.zeros(max(max_d, max_deg_obs) + 1, np.int64)
    for d, D in cls_of.items():
        cls_arr[d] = D
    node_off_arr = np.full(max_d + 1, -1, np.int64)
    edge_off_arr = np.full(max_d + 1, -1, np.int64)
    n_off = e_off = 0
    for d, c in spec:
        node_off_arr[d] = n_off
        edge_off_arr[d] = e_off
        n_off += c
        e_off += c * d
    N_new, E_new = n_off, max(e_off, 1)

    new_of_old = np.full(N, -1, np.int64)
    fill = {d: 0 for d, _ in spec}
    for old in real:      # stable within bucket: original order preserved
        D = int(cls_arr[deg[old]])
        new_of_old[old] = node_off_arr[D] + fill[D]
        fill[D] += 1

    nf = np.zeros((N_new,) + node_feats.shape[1:], node_feats.dtype)
    ngi = np.full(N_new, n_graph_pad - 1, np.int32)
    nm = np.zeros(N_new, bool)
    in_deg = np.zeros(N_new, np.float32)
    sn = np.ones((N_new, 1), np.float32) if snorm_n is not None else None
    dst = new_of_old[real]
    nf[dst] = node_feats[real]
    ngi[dst] = node_graph_ids[real]
    nm[dst] = True
    in_deg[dst] = deg[real]
    if sn is not None:
        sn[dst] = snorm_n[real]

    sends_new = np.zeros(E_new, np.int32)
    recvs_new = np.zeros(E_new, np.int32)
    em = np.zeros(E_new, bool)
    ef = (np.zeros((E_new,) + edge_feats.shape[1:], edge_feats.dtype)
          if edge_feats is not None else None)
    se = np.ones((E_new, 1), np.float32) if snorm_e is not None else None
    # dummy self-loops keep every bucket reshape dense (masked out)
    for d, c in spec:
        if d == 0:
            continue
        ids = (node_off_arr[d] + np.repeat(np.arange(c), d)).astype(np.int32)
        sends_new[edge_off_arr[d]:edge_off_arr[d] + c * d] = ids
        recvs_new[edge_off_arr[d]:edge_off_arr[d] + c * d] = ids

    reals_e = np.nonzero(edge_mask)[0]
    if len(reals_e):
        r_new = new_of_old[receivers[reals_e]]
        order = np.argsort(r_new, kind='stable')
        sorted_e = reals_e[order]
        sorted_r = r_new[order]
        sorted_D = cls_arr[deg[receivers[sorted_e]]]
        slot = (np.arange(len(sorted_e))
                - np.searchsorted(sorted_r, sorted_r, side='left'))
        pos = (edge_off_arr[sorted_D]
               + (sorted_r - node_off_arr[sorted_D]) * sorted_D + slot)
        sends_new[pos] = new_of_old[senders[sorted_e]]
        recvs_new[pos] = sorted_r
        em[pos] = True
        if ef is not None:
            ef[pos] = edge_feats[sorted_e]
        if se is not None:
            se[pos] = snorm_e[sorted_e]

    return (nf, sends_new, recvs_new, ngi, nm, em, ef, sn, se, spec, in_deg)


def build_graph(
    node_feats: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_feats: Optional[np.ndarray] = None,
    n_node_pad: Optional[int] = None,
    n_edge_pad: Optional[int] = None,
) -> Graph:
    """Build a single-graph ``Graph`` with optional padding."""
    return batch_graphs(
        [dict(node_feats=node_feats, senders=senders, receivers=receivers,
              edge_feats=edge_feats)],
        n_node_pad=n_node_pad, n_edge_pad=n_edge_pad, n_graph_pad=1 if n_node_pad is None else None)


def build_ell(receivers: np.ndarray, edge_mask: np.ndarray, n_node_pad: int,
              degree_pad_multiple: int = 4,
              max_degree: Optional[int] = None):
    """Build the padded neighbor-list (ELL) layout: for each node the ids of
    its in-edges, padded to the max in-degree.  Returns (nbr_edge_ids
    [N, D_max] int32, nbr_mask [N, D_max] bool) or (None, None) when the max
    degree exceeds ``max_degree``."""
    from pna_tpu import native

    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask)
    deg = native.degree_count(receivers, edge_mask, n_node_pad)
    dmax = int(deg.max()) if len(receivers) else 1
    if max_degree is not None and dmax > max_degree:
        return None, None
    dmax = max(-(-max(dmax, 1) // degree_pad_multiple) * degree_pad_multiple,
               degree_pad_multiple)
    out = native.build_ell_native(receivers, edge_mask, n_node_pad, dmax)
    if out is not None:
        return out
    # pure-python fallback
    nbr = np.zeros((n_node_pad, dmax), dtype=np.int32)
    mask = np.zeros((n_node_pad, dmax), dtype=bool)
    fill = np.zeros(n_node_pad, dtype=np.int64)
    for e in np.nonzero(edge_mask)[0]:
        r = receivers[e]
        nbr[r, fill[r]] = e
        mask[r, fill[r]] = True
        fill[r] += 1
    return nbr, mask


def batch_graphs(
    graphs: Sequence[dict],
    n_node_pad: Optional[int] = None,
    n_edge_pad: Optional[int] = None,
    n_graph_pad: Optional[int] = None,
    node_pad_multiple: int = 8,
    edge_pad_multiple: int = 128,
    with_snorm: bool = False,
    with_ell: bool = True,
    ell_max_degree: Optional[int] = 256,
    sort_edges: bool = True,
    bucket_by_degree: bool = False,
    bucket_caps: Optional[dict] = None,
    bucket_max_buckets: int = 4,
) -> Graph:
    """Static-shape batcher replacing ``dgl.batch``.

    Each element of ``graphs`` is a dict with keys ``node_feats`` [n, F],
    ``senders`` [e], ``receivers`` [e] and optionally ``edge_feats`` [e, Fe].
    Node indices are offset per graph; everything is padded to static sizes.

    Padding adds one extra "garbage" graph at the end that owns all padded nodes;
    padded edges self-loop on the last padded node so segment ops scatter their
    (masked-out) contributions away from real nodes.
    """
    n_total = sum(int(g["node_feats"].shape[0]) for g in graphs)
    e_total = sum(int(len(g["senders"])) for g in graphs)
    n_graphs = len(graphs)

    if n_node_pad is None:
        n_node_pad = _round_up(n_total + 1, node_pad_multiple)
    if n_edge_pad is None:
        n_edge_pad = max(_round_up(max(e_total, 1), edge_pad_multiple), edge_pad_multiple)
    if n_graph_pad is None:
        n_graph_pad = n_graphs + 1
    if n_node_pad < n_total + (1 if n_node_pad > n_total else 0):
        raise ValueError(f"n_node_pad={n_node_pad} < total nodes {n_total}")
    if n_edge_pad < e_total:
        raise ValueError(f"n_edge_pad={n_edge_pad} < total edges {e_total}")

    g0_feats = np.asarray(graphs[0]["node_feats"])
    feat_dim = g0_feats.shape[1] if g0_feats.ndim > 1 else 1
    feat_dtype = (np.int32 if np.issubdtype(g0_feats.dtype, np.integer)
                  else np.float32)
    has_ef = graphs[0].get("edge_feats") is not None
    if has_ef:
        g0_ef = np.asarray(graphs[0]["edge_feats"])
        ef_dim = g0_ef.shape[1] if g0_ef.ndim > 1 else 1
        ef_dtype = (np.int32 if np.issubdtype(g0_ef.dtype, np.integer)
                    else np.float32)
    else:
        ef_dim = 0

    node_feats = np.zeros((n_node_pad, feat_dim), dtype=feat_dtype)
    senders = np.full((n_edge_pad,), n_node_pad - 1, dtype=np.int32)
    receivers = np.full((n_edge_pad,), n_node_pad - 1, dtype=np.int32)
    node_graph_ids = np.full((n_node_pad,), n_graph_pad - 1, dtype=np.int32)
    node_mask = np.zeros((n_node_pad,), dtype=bool)
    edge_mask = np.zeros((n_edge_pad,), dtype=bool)
    graph_mask = np.zeros((n_graph_pad,), dtype=bool)
    edge_feats = np.zeros((n_edge_pad, ef_dim), dtype=ef_dtype) if has_ef else None
    snorm_n = np.ones((n_node_pad, 1), dtype=np.float32) if with_snorm else None
    snorm_e = np.ones((n_edge_pad, 1), dtype=np.float32) if with_snorm else None

    n_off, e_off = 0, 0
    for gi, g in enumerate(graphs):
        n = int(g["node_feats"].shape[0])
        e = int(len(g["senders"]))
        node_feats[n_off:n_off + n] = np.asarray(g["node_feats"], dtype=feat_dtype).reshape(n, -1)
        senders[e_off:e_off + e] = np.asarray(g["senders"], dtype=np.int32) + n_off
        receivers[e_off:e_off + e] = np.asarray(g["receivers"], dtype=np.int32) + n_off
        node_graph_ids[n_off:n_off + n] = gi
        node_mask[n_off:n_off + n] = True
        edge_mask[e_off:e_off + e] = True
        graph_mask[gi] = True
        if has_ef:
            edge_feats[e_off:e_off + e] = np.asarray(g["edge_feats"], dtype=ef_dtype).reshape(e, -1)
        if with_snorm:
            # sqrt(1/n) per node, sqrt(1/e) per edge (molecules.py:153-164)
            snorm_n[n_off:n_off + n] = np.sqrt(1.0 / max(n, 1))
            snorm_e[e_off:e_off + e] = np.sqrt(1.0 / max(e, 1))
        n_off += n
        e_off += e

    bucket_spec = in_deg = None
    if bucket_by_degree:
        (node_feats, senders, receivers, node_graph_ids, node_mask,
         edge_mask, edge_feats, snorm_n, snorm_e, bucket_spec,
         in_deg) = _bucketize(
            node_feats, senders, receivers, node_graph_ids, node_mask,
            edge_mask, edge_feats, snorm_n, snorm_e, n_graph_pad,
            bucket_caps=bucket_caps, max_buckets=bucket_max_buckets)
        n_node_pad = node_feats.shape[0]
        n_edge_pad = senders.shape[0]
        sort_edges = False   # bucket order, not global receiver order

    # sort edges by receiver (stable): real edges become receiver-contiguous
    # (CSR) and padded edges (receiver == n_node_pad - 1) land at the tail —
    # the layout the fused Pallas kernels stream sequentially.
    edge_ptr = None
    if sort_edges:
        order = np.argsort(receivers, kind='stable')
        senders = senders[order]
        receivers = receivers[order]
        edge_mask = edge_mask[order]
        if has_ef:
            edge_feats = edge_feats[order]
        if with_snorm:
            snorm_e = snorm_e[order]
        edge_ptr = np.zeros(n_node_pad + 1, dtype=np.int32)
        edge_ptr[1:] = np.searchsorted(receivers, np.arange(1, n_node_pad + 1),
                                       side='left')
        edge_ptr[-1] = n_edge_pad

    nbr_edge_ids = nbr_mask = None
    if with_ell:
        nbr_edge_ids, nbr_mask = build_ell(receivers, edge_mask, n_node_pad,
                                           max_degree=ell_max_degree)

    return Graph(
        node_feats=jnp.asarray(node_feats),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        node_graph_ids=jnp.asarray(node_graph_ids),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        edge_feats=jnp.asarray(edge_feats) if has_ef else None,
        snorm_n=jnp.asarray(snorm_n) if with_snorm else None,
        snorm_e=jnp.asarray(snorm_e) if with_snorm else None,
        nbr_edge_ids=None if nbr_edge_ids is None else jnp.asarray(nbr_edge_ids),
        nbr_mask=None if nbr_mask is None else jnp.asarray(nbr_mask),
        edge_ptr=None if edge_ptr is None else jnp.asarray(edge_ptr),
        bucket_spec=bucket_spec,
        in_deg=None if in_deg is None else jnp.asarray(in_deg),
    )


def from_dense(adj: np.ndarray, node_feats: np.ndarray,
               n_node_pad: Optional[int] = None,
               n_edge_pad: Optional[int] = None) -> Graph:
    """Convert a batch of dense graphs (``adj`` [B, N, N], feats [B, N, F]) to an
    edge-list ``Graph``.  ``adj[b, i, j] = 1`` becomes an edge ``j -> i`` so that the
    segment aggregation over receivers matches the dense row-sum semantics of
    ``models/pytorch/pna/aggregators.py:19-26``.
    """
    adj = np.asarray(adj)
    node_feats = np.asarray(node_feats)
    gs = []
    for b in range(adj.shape[0]):
        recv, send = np.nonzero(adj[b])  # adj[i, j] -> edge j -> i
        gs.append(dict(node_feats=node_feats[b], senders=send, receivers=recv))
    return batch_graphs(gs, n_node_pad=n_node_pad, n_edge_pad=n_edge_pad)


def sort_by_receiver(graph: Graph) -> Graph:
    """Sort edges by receiver id (stable).  Required by the fused Pallas kernel so
    each edge tile touches a contiguous node range; a no-op for XLA segment ops."""
    order = jnp.argsort(graph.receivers, stable=True)
    return graph.replace(
        senders=graph.senders[order],
        receivers=graph.receivers[order],
        edge_mask=graph.edge_mask[order],
        edge_feats=None if graph.edge_feats is None else graph.edge_feats[order],
        snorm_e=None if graph.snorm_e is None else graph.snorm_e[order],
    )
