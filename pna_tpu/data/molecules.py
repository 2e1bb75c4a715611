"""ZINC molecular dataset pipeline — equivalent of
``realworld_benchmark/data/molecules.py``.

Molecules are dicts with ``num_atom`` (int), ``atom_type`` [N] int,
``bond_type`` [N, N] int, ``logP_SA_cycle_normalized`` float (molecules.py:43-50).
Each molecule becomes an edge-list record (edge u->v for every nonzero bond,
both directions present in the data); batches are padded ``Graph`` pytrees with
graph-norm factors sqrt(1/n), sqrt(1/e) (molecules.py:153-164 collate).

ZINC constants: num_atom_type=28, num_bond_type=4 (molecules.py:94-95).

When the real pickles are absent (no network egress), ``synthetic_zinc``
generates chemically-shaped random molecules with a *computable* target so
integration tests can verify learning end to end.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pna_tpu.graph import Graph, batch_graphs

NUM_ATOM_TYPE = 28
NUM_BOND_TYPE = 4


def molecule_to_record(mol: dict) -> dict:
    """Convert a ZINC molecule dict into an edge-list record."""
    atom_type = np.asarray(mol['atom_type']).astype(np.int32).reshape(-1)
    bond = np.asarray(mol['bond_type'])
    send, recv = np.nonzero(bond)  # row=src, col=dst; both directions present
    edge_type = bond[send, recv].astype(np.int32)
    return dict(node_feats=atom_type[:, None],
                senders=send.astype(np.int32),
                receivers=recv.astype(np.int32),
                edge_feats=edge_type[:, None],
                label=float(mol['logP_SA_cycle_normalized']))


def load_zinc_split(data_dir: str, split: str,
                    num_graphs: Optional[int] = None) -> List[dict]:
    """Load the raw ZINC split pickles + index files
    (molecules.py:19-27); requires torch for the original tensor pickles."""
    import csv
    with open(os.path.join(data_dir, f"{split}.pickle"), 'rb') as f:
        data = pickle.load(f)
    idx_path = os.path.join(data_dir, f"{split}.index")
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            data_idx = [list(map(int, idx)) for idx in csv.reader(f)]
        data = [data[i] for i in data_idx[0]]
    if num_graphs is not None:
        assert len(data) == num_graphs
    return [molecule_to_record(m) for m in data]


def synthetic_zinc(n_graphs: int, seed: int = 0,
                   n_min: int = 9, n_max: int = 30) -> List[dict]:
    """Random molecule-shaped graphs with a learnable synthetic target:
    label = mean(atom_type)/NUM_ATOM_TYPE + 0.1 * edges/atoms."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_graphs):
        n = rng.randint(n_min, n_max + 1)
        atom_type = rng.randint(0, NUM_ATOM_TYPE, size=n).astype(np.int32)
        # random tree + extra edges (molecule-like sparsity)
        bond = np.zeros((n, n), dtype=np.int32)
        for v in range(1, n):
            u = rng.randint(0, v)
            t = rng.randint(1, NUM_BOND_TYPE)
            bond[u, v] = bond[v, u] = t
        for _ in range(max(n // 6, 1)):
            u, v = rng.randint(0, n, 2)
            if u != v and bond[u, v] == 0:
                t = rng.randint(1, NUM_BOND_TYPE)
                bond[u, v] = bond[v, u] = t
        label = (atom_type.mean() / NUM_ATOM_TYPE
                 + 0.1 * (bond > 0).sum() / (2.0 * n))
        out.append(molecule_to_record(dict(
            num_atom=n, atom_type=atom_type, bond_type=bond,
            logP_SA_cycle_normalized=label)))
    return out


class ZincDataset:
    """ZINC train/val/test splits as edge-list records.

    Use ``ZincDataset.from_dir(d)`` for the real data (train/val/test pickles),
    ``ZincDataset.synthetic()`` for tests.
    """

    def __init__(self, train, val, test,
                 num_atom_type=NUM_ATOM_TYPE, num_bond_type=NUM_BOND_TYPE):
        self.train, self.val, self.test = train, val, test
        self.num_atom_type = num_atom_type
        self.num_bond_type = num_bond_type

    @classmethod
    def from_dir(cls, data_dir: str):
        return cls(load_zinc_split(data_dir, 'train'),
                   load_zinc_split(data_dir, 'val'),
                   load_zinc_split(data_dir, 'test'))

    @classmethod
    def synthetic(cls, n_train=200, n_val=40, n_test=40, seed=0):
        return cls(synthetic_zinc(n_train, seed),
                   synthetic_zinc(n_val, seed + 10_000),
                   synthetic_zinc(n_test, seed + 20_000))

    def avg_d(self) -> Dict[str, float]:
        """mean over train graphs of mean(log(in_degree + 1))
        (realworld_benchmark/main_molecules.py:368-372)."""
        from pna_tpu.ops.scalers import avg_d_from_degrees
        degs = []
        for rec in self.train:
            n = rec['node_feats'].shape[0]
            d = np.bincount(rec['receivers'], minlength=n)
            degs.append(d)
        return avg_d_from_degrees(degs)


def collate_records(records: Sequence[dict],
                    n_node_pad: Optional[int] = None,
                    n_edge_pad: Optional[int] = None,
                    with_snorm: bool = True,
                    bucket_by_degree: bool = False,
                    bucket_caps: Optional[dict] = None,
                    bucket_max_buckets: int = 4
                    ) -> Tuple[Graph, np.ndarray]:
    """Batch + pad records into a Graph; returns (graph, labels [G_pad])."""
    g = batch_graphs(list(records), n_node_pad=n_node_pad,
                     n_edge_pad=n_edge_pad, with_snorm=with_snorm,
                     bucket_by_degree=bucket_by_degree,
                     bucket_caps=bucket_caps,
                     bucket_max_buckets=bucket_max_buckets)
    is_int = isinstance(records[0].get('label', 0.0), (int, np.integer))
    labels = np.zeros((g.n_graph_pad,), dtype=np.int32 if is_int
                      else np.float32)
    for i, rec in enumerate(records):
        labels[i] = rec.get('label', 0)
    return g, labels


def derive_bucket_caps(records: Sequence[dict], batch_size: int,
                       max_buckets: int = 4) -> Dict[int, int]:
    """Dataset-stable degree-bucket capacities for ``batch_iterator``.

    With per-batch bucketing every batch gets its own ``bucket_spec`` —
    a recompile per batch.  Stable caps make EVERY batch one single static
    shape (one compiled train step for the whole run).  The bound is
    airtight for any batch the iterator can produce: degree classes come
    from the global degree histogram (so every degree is covered) and each
    class capacity is the sum of the ``batch_size`` largest per-graph class
    counts over the multiset ``records + cycle(records)[:batch_size]``
    (short final batches are filled from the cycled record list in
    ``batch_iterator`` — when the dataset is smaller than the batch size the
    filler wraps, so the pool must repeat records accordingly, not stop at
    ``records[:batch_size]``).
    """
    from pna_tpu.graph import _choose_classes, _round_up
    per_graph = []   # degree histogram per record
    counts: Dict[int, int] = {}
    for r in records:
        n = r['node_feats'].shape[0]
        deg = np.bincount(np.asarray(r['receivers']), minlength=n)
        u, c = np.unique(deg, return_counts=True)
        per_graph.append(dict(zip(u.tolist(), c.tolist())))
        for d, k in zip(u.tolist(), c.tolist()):
            counts[int(d)] = counts.get(int(d), 0) + int(k)
    cls_of = _choose_classes(counts, max_buckets)
    caps: Dict[int, List[int]] = {}
    # exact multiset of the worst-case filler batch_iterator can append
    filler_pool = [per_graph[k % len(per_graph)] for k in range(batch_size)]
    pool = per_graph + filler_pool
    for h in pool:
        cls_counts: Dict[int, int] = {}
        for d, k in h.items():
            D = cls_of.get(int(d), int(d))
            cls_counts[D] = cls_counts.get(D, 0) + k
        for D, k in cls_counts.items():
            caps.setdefault(D, []).append(k)
    out = {int(D): int(sum(sorted(ks)[-batch_size:]))
           for D, ks in caps.items()}
    # degree-0 class absorbs the batcher's padding nodes (+1 garbage node,
    # rounded to the node_pad_multiple of 8)
    out[0] = max(out.get(0, 0), 0) + 8
    return {d: _round_up(c, 8) for d, c in out.items()}


def batch_iterator(records: List[dict], batch_size: int, seed: int,
                   shuffle: bool = True,
                   node_pad_multiple: int = 64,
                   edge_pad_multiple: int = 256,
                   bucket_caps: Optional[Dict[int, int]] = None):
    """Yield (Graph, labels) minibatches with bucketed padding.

    Padding to multiples keeps the number of distinct compiled shapes small
    (SURVEY §7.3: avoid recompilation storms while keeping padding waste
    low).  With ``bucket_caps`` (from :func:`derive_bucket_caps`) batches
    use the degree-bucketed static layout instead — a SINGLE compiled shape
    for the whole run, and the gather/scatter-free bucketed aggregation
    path in ``PNALayerFused`` (the measured-fastest backend on v5e).
    """
    order = np.arange(len(records))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    for i in range(0, len(order), batch_size):
        chunk = [records[j] for j in order[i:i + batch_size]]
        n_valid = len(chunk)
        if n_valid < batch_size:  # keep batch shape static; mask the fillers
            # fill from the head of the record list (covered by the
            # derive_bucket_caps bound; also fixes batches shorter than
            # batch_size/2, which chunk-repetition could not fill)
            need = batch_size - n_valid
            filler = [records[k % len(records)] for k in range(need)]
            chunk = chunk + filler
        if bucket_caps is not None:
            g, labels = collate_records(chunk, bucket_by_degree=True,
                                        bucket_caps=bucket_caps)
        else:
            n_nodes = sum(r['node_feats'].shape[0] for r in chunk) + 1
            n_edges = sum(len(r['senders']) for r in chunk)
            npad = -(-n_nodes // node_pad_multiple) * node_pad_multiple
            epad = max(-(-n_edges // edge_pad_multiple) * edge_pad_multiple,
                       edge_pad_multiple)
            g, labels = collate_records(chunk, n_node_pad=npad,
                                        n_edge_pad=epad)
        if n_valid < batch_size:
            import jax.numpy as jnp
            gm = np.asarray(g.graph_mask).copy()
            gm[n_valid:] = False
            g = g.replace(graph_mask=jnp.asarray(gm))
        yield g, labels
