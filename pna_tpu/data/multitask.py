"""Multitask synthetic dataset builder + loader.

Equivalent of ``multitask_benchmark/datasets_generation/multitask_dataset.py``
and the loader half of ``multitask_benchmark/util/util.py``:

* builds per-size-bucket dense tensors (adj [B,N,N], features [B,N,F],
  node_labels [B,N,Ln], graph_labels [B,Lg]) for train/val/test(+extrapolation)
  splits;
* default node labels [sssp_distance, eccentricity, graph_laplacian_features]
  with a 1-hot SSSP source appended to features (multitask_dataset.py:57-68);
* default graph labels [is_connected, diameter, spectral_radius];
* saved as a plain pickle of numpy arrays (the loader also accepts the
  reference's torch.save pickles when torch is available);
* label normalization by train max + mean-predictor baseline printing
  (util/util.py:13-32).
"""

from __future__ import annotations

import os
import pickle
from inspect import signature
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from pna_tpu.data import graph_algorithms
from pna_tpu.data.graph_generation import (GraphType,
                                           generate_graph_no_singletons)

DEFAULT_NODE_LABELS = ["eccentricity", "graph_laplacian_features", "sssp"]
DEFAULT_GRAPH_LABELS = ["is_connected", "diameter", "spectral_radius"]

# split spec (multitask_dataset.py:132-139)
DEFAULT_N_GRAPHS = {'train': [512] * 10, 'val': [128] * 5, 'default': [256] * 5}


def default_sizes(extrapolation: bool = False) -> Dict[str, Sequence[int]]:
    base = {'train': range(15, 25), 'val': range(15, 25)}
    if extrapolation:
        extra = {f'test-({a},{b})': range(a, b) for a, b in
                 [(20, 25), (25, 30), (30, 35), (35, 40), (40, 45), (45, 50),
                  (60, 65), (75, 80), (95, 100)]}
    else:
        extra = {'test': range(15, 25)}
    return {**base, **extra}


def _to_categorical(x: int, n: int) -> np.ndarray:
    v = np.zeros(n)
    v[x] = 1
    return v


def make_label_getters(node_label_names: Sequence[str],
                       graph_label_names: Sequence[str]):
    """Resolve label-algorithm names (multitask_dataset.py:112-113) against
    pna_tpu.data.graph_algorithms; 'sssp' is handled by the builder."""
    node_fns = [getattr(graph_algorithms, s) for s in node_label_names
                if s != 'sssp']
    graph_fns = [getattr(graph_algorithms, s) for s in graph_label_names]

    def get_nodes_labels(A, F, initial=None):
        labels = [] if initial is None else [initial]
        for f in node_fns:
            params = signature(f).parameters
            labels.append(f(A, F) if 'F' in params else f(A))
        return np.swapaxes(np.stack(labels), 0, 1)

    def get_graph_labels(A, F):
        labels = []
        for f in graph_fns:
            params = signature(f).parameters
            labels.append(f(A, F) if 'F' in params else f(A))
        return np.asarray(labels, dtype=np.float64).flatten()

    return get_nodes_labels, get_graph_labels


def build_multitask_dataset(
    out_path: Optional[str] = None,
    seed: int = 1234,
    graph_type: GraphType = GraphType.RANDOM,
    node_label_names: Sequence[str] = DEFAULT_NODE_LABELS,
    graph_label_names: Sequence[str] = DEFAULT_GRAPH_LABELS,
    extrapolation: bool = False,
    n_graphs: Optional[Dict[str, List[int]]] = None,
    sizes: Optional[Dict[str, Sequence[int]]] = None,
    verbose: bool = True,
) -> Dict[str, dict]:
    """Generate the dataset; returns {adj, features, node_labels, graph_labels},
    each a dict split -> list of per-bucket arrays."""
    sssp = 'sssp' in node_label_names
    get_nodes_labels, get_graph_labels = make_label_getters(
        node_label_names, graph_label_names)

    n_graphs = dict(DEFAULT_N_GRAPHS if n_graphs is None else n_graphs)
    sizes = default_sizes(extrapolation) if sizes is None else sizes

    adj_out, feat_out, nl_out, gl_out = {}, {}, {}, {}
    for dset, size_list in sizes.items():
        counts = n_graphs.get(dset, n_graphs['default'])
        size_list = list(size_list)
        buckets_adj, buckets_f, buckets_nl, buckets_gl = [], [], [], []
        for batch, batch_size in enumerate(counts):
            N = size_list[batch]
            As, Fs, NLs, GLs = [], [], [], []
            for _ in range(batch_size):
                adj, features, seed = generate_graph_no_singletons(
                    N, graph_type, seed)
                assert np.all(adj * np.eye(N) == 0), "self connections"
                if sssp:
                    source = np.random.randint(0, N)
                    initial = graph_algorithms.all_pairs_shortest_paths(
                        adj, 0)[source]
                else:
                    initial = None
                node_labels = get_nodes_labels(adj, features, initial)
                graph_labels = get_graph_labels(adj, features)
                if sssp:
                    features = np.stack(
                        [_to_categorical(source, N), features], axis=1)
                As.append(adj)
                Fs.append(features)
                NLs.append(node_labels)
                GLs.append(graph_labels)
            buckets_adj.append(np.asarray(As, dtype=np.float32))
            buckets_f.append(np.asarray(Fs, dtype=np.float32))
            buckets_nl.append(np.asarray(NLs, dtype=np.float32))
            buckets_gl.append(np.asarray(GLs, dtype=np.float32))
            if verbose:
                print(f"{dset}[{batch}] N={N}: {batch_size} graphs")
        adj_out[dset] = buckets_adj
        feat_out[dset] = buckets_f
        nl_out[dset] = buckets_nl
        gl_out[dset] = buckets_gl

    data = dict(adj=adj_out, features=feat_out, node_labels=nl_out,
                graph_labels=gl_out)
    if out_path:
        d = os.path.dirname(out_path)
        if d and not os.path.exists(d):
            os.makedirs(d)
        with open(out_path, 'wb') as f:
            pickle.dump(data, f)
    return data


def load_multitask_dataset(path: str, print_baseline: bool = True,
                           loss: str = 'mse'):
    """Load a dataset pickle (ours, or the reference's torch.save format),
    normalize labels by train max (util/util.py:13-17) and optionally print the
    mean-predictor baseline (util/util.py:19-32).

    ``path='synthetic'`` builds a tiny in-memory dataset (smoke tests / the
    verify recipe) instead of reading a file."""
    if path == 'synthetic':
        data = build_multitask_dataset(
            out_path=None, seed=7,
            n_graphs={'train': [32] * 2, 'val': [16] * 2, 'default': [16] * 2},
            sizes={'train': [15, 18], 'val': [16, 19], 'test': [15, 18]},
            verbose=False)
        return _normalize_and_baseline(data, print_baseline)
    with open(path, 'rb') as f:
        head = f.read(2)
    if head == b'\x80\x02' or head[:1] == b'\x80':
        # could be either plain pickle or a torch zipfile; try plain first
        try:
            with open(path, 'rb') as f:
                data = pickle.load(f)
        except Exception:
            data = _load_torch(path)
    else:
        data = _load_torch(path)

    if isinstance(data, tuple):  # reference format: (adj, features, nl, gl)
        adj, features, node_labels, graph_labels = data
        data = dict(adj=_np(adj), features=_np(features),
                    node_labels=_np(node_labels), graph_labels=_np(graph_labels))
    return _normalize_and_baseline(data, print_baseline)


def _normalize_and_baseline(data, print_baseline: bool):
    adj, features = data['adj'], data['features']
    node_labels, graph_labels = data['node_labels'], data['graph_labels']

    # normalize labels by train max per task
    max_node = np.max(np.stack(
        [nls.max(axis=(0, 1)) for nls in node_labels['train']]), axis=0)
    max_graph = np.max(np.stack(
        [gls.max(axis=0) for gls in graph_labels['train']]), axis=0)
    for dset in node_labels:
        node_labels[dset] = [nls / max_node for nls in node_labels[dset]]
        graph_labels[dset] = [gls / max_graph for gls in graph_labels[dset]]

    baselines = {}
    if print_baseline:
        mean_node = np.mean(np.stack(
            [nls.mean(axis=(0, 1)) for nls in node_labels['train']]), axis=0)
        mean_graph = np.mean(np.stack(
            [gls.mean(axis=0) for gls in graph_labels['train']]), axis=0)
        for dset in node_labels:
            if dset in ('train', 'val'):
                continue
            node_mses = []
            graph_mses = []
            for nls, gls in zip(node_labels[dset], graph_labels[dset]):
                node_mses.append(((nls - mean_node) ** 2).mean(axis=(0, 1)))
                graph_mses.append(((gls - mean_graph) ** 2).mean(axis=0))
            per_task = (list(np.mean(node_mses, axis=0)) +
                        list(np.mean(graph_mses, axis=0)))
            baselines[dset] = per_task
            print(f"Baseline loss {dset}: {per_task}")

    return dict(adj=adj, features=features, node_labels=node_labels,
                graph_labels=graph_labels, baselines=baselines)


def _np(d):
    """Convert a dict of lists of torch tensors to numpy."""
    return {k: [np.asarray(getattr(v, "numpy", lambda: v)()) for v in vs]
            for k, vs in d.items()}


def _load_torch(path):
    import torch
    with open(path, 'rb') as f:
        return torch.load(f)
