"""OGB MolHIV dataset pipeline — equivalent of
``realworld_benchmark/data/HIV.py`` (which wraps
``DglGraphPropPredDataset('ogbg-molhiv')``).

The ``ogb`` package is not available in this environment; this module reads the
OGB on-disk format directly when present (``mapping/``-style CSVs or the
processed ``raw/`` npz arrays), and otherwise provides a synthetic molecular
fallback for tests.  Graphs with <= 5 nodes are filtered out (HIV.py:17-19).
"""

from __future__ import annotations

import csv
import gzip
import os
from typing import Dict, List, Optional

import numpy as np

from pna_tpu.data.molecules import NUM_ATOM_TYPE
from pna_tpu.nn.nets import OGB_ATOM_FEATURE_DIMS
from pna_tpu.ops.scalers import avg_d_from_degrees


def _read_csv_gz(path):
    with gzip.open(path, 'rt') as f:
        return [row for row in csv.reader(f)]


def load_ogb_molhiv(root: str) -> Dict[str, List[dict]]:
    """Load the ogbg-molhiv raw directory (edge.csv.gz, node-feat.csv.gz,
    num-node-list.csv.gz, num-edge-list.csv.gz, graph-label.csv.gz + split
    scaffold indices)."""
    raw = os.path.join(root, 'raw')
    edges = np.asarray(_read_csv_gz(os.path.join(raw, 'edge.csv.gz')),
                       dtype=np.int64)
    node_feat = np.asarray(_read_csv_gz(os.path.join(raw, 'node-feat.csv.gz')),
                           dtype=np.int64)
    nn_list = np.asarray(_read_csv_gz(os.path.join(raw, 'num-node-list.csv.gz')),
                         dtype=np.int64).reshape(-1)
    ne_list = np.asarray(_read_csv_gz(os.path.join(raw, 'num-edge-list.csv.gz')),
                         dtype=np.int64).reshape(-1)
    labels = np.asarray(_read_csv_gz(os.path.join(raw, 'graph-label.csv.gz')),
                        dtype=np.int64).reshape(-1)

    records = []
    n_off = e_off = 0
    for n, e, y in zip(nn_list, ne_list, labels):
        ed = edges[e_off:e_off + e]
        records.append(dict(
            node_feats=node_feat[n_off:n_off + n].astype(np.int32),
            senders=ed[:, 0].astype(np.int32),
            receivers=ed[:, 1].astype(np.int32),
            label=int(y)))
        n_off += n
        e_off += e

    split_dir = os.path.join(root, 'split', 'scaffold')
    out = {}
    for split in ('train', 'valid', 'test'):
        idx = np.asarray(_read_csv_gz(os.path.join(split_dir, f'{split}.csv.gz')),
                         dtype=np.int64).reshape(-1)
        out[split] = [records[i] for i in idx]
    return out


def synthetic_molhiv(n_graphs: int, seed: int = 0, n_min: int = 8,
                     n_max: int = 30) -> List[dict]:
    """Random OGB-featured molecules; the binary label depends on mean atomic
    number so a model can learn it."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_graphs):
        n = rng.randint(n_min, n_max + 1)
        feats = np.stack(
            [rng.randint(0, d, size=n) for d in OGB_ATOM_FEATURE_DIMS],
            axis=1).astype(np.int32)
        senders, receivers = [], []
        for v in range(1, n):
            u = rng.randint(0, v)
            senders += [u, v]
            receivers += [v, u]
        label = int(feats[:, 0].mean() > OGB_ATOM_FEATURE_DIMS[0] / 2.2)
        out.append(dict(node_feats=feats,
                        senders=np.asarray(senders, dtype=np.int32),
                        receivers=np.asarray(receivers, dtype=np.int32),
                        label=label))
    return out


class HIVDataset:
    """MolHIV train/val/test; graphs with <= 5 nodes filtered (HIV.py:17-19)."""

    def __init__(self, train, val, test):
        flt = lambda rs: [r for r in rs if r['node_feats'].shape[0] > 5]
        self.train, self.val, self.test = flt(train), flt(val), flt(test)

    @classmethod
    def from_ogb_dir(cls, root: str):
        splits = load_ogb_molhiv(root)
        return cls(splits['train'], splits['valid'], splits['test'])

    @classmethod
    def synthetic(cls, n_train=200, n_val=40, n_test=40, seed=0):
        return cls(synthetic_molhiv(n_train, seed),
                   synthetic_molhiv(n_val, seed + 1),
                   synthetic_molhiv(n_test, seed + 2))

    def avg_d(self) -> Dict[str, float]:
        """avg over train graphs of mean(log(in_degree + 1))
        (main_HIV.py:240-244)."""
        degs = []
        for rec in self.train:
            n = rec['node_feats'].shape[0]
            degs.append(np.bincount(rec['receivers'], minlength=n))
        return avg_d_from_degrees(degs)
