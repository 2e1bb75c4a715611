"""Random graph generation for the multitask benchmark — same graph family and
distributions as ``multitask_benchmark/datasets_generation/graph_generation.py``
(11 types + RANDOM mixture, edge-toggling randomization preserving the expected
edge count, U[0,1] node values)."""

from __future__ import annotations

import math
import random
from enum import Enum
from typing import Optional, Tuple

import networkx as nx
import numpy as np


class GraphType(Enum):
    RANDOM = 0
    ERDOS_RENYI = 1
    BARABASI_ALBERT = 2
    GRID = 3
    CAVEMAN = 5
    TREE = 6
    LADDER = 7
    LINE = 8
    STAR = 9
    CATERPILLAR = 10
    LOBSTER = 11


# mixture probabilities for RANDOM (graph_generation.py:30-32)
MIXTURE = [(GraphType.ERDOS_RENYI, 0.2), (GraphType.BARABASI_ALBERT, 0.2),
           (GraphType.GRID, 0.05), (GraphType.CAVEMAN, 0.05),
           (GraphType.TREE, 0.15), (GraphType.LADDER, 0.05),
           (GraphType.LINE, 0.05), (GraphType.STAR, 0.05),
           (GraphType.CATERPILLAR, 0.1), (GraphType.LOBSTER, 0.1)]


def _largest_divisor_leq_sqrt(N: int) -> int:
    m = 1
    for i in range(1, int(math.sqrt(N)) + 1):
        if N % i == 0:
            m = i
    return m


def _build_structure(type_: GraphType, N: int, seed, degree) -> nx.Graph:
    if type_ == GraphType.ERDOS_RENYI:
        if degree is None:
            degree = random.random() * N
        return nx.fast_gnp_random_graph(N, degree / N, seed, directed=False)
    if type_ == GraphType.BARABASI_ALBERT:
        if degree is None:
            degree = int(random.random() * (N - 1)) + 1
        return nx.barabasi_albert_graph(N, degree, seed)
    if type_ == GraphType.GRID:
        m = _largest_divisor_leq_sqrt(N)
        return nx.grid_2d_graph(m, N // m)
    if type_ == GraphType.CAVEMAN:
        m = _largest_divisor_leq_sqrt(N)
        return nx.caveman_graph(m, N // m)
    if type_ == GraphType.TREE:
        return nx.random_powerlaw_tree(N, seed=seed, tries=10000)
    if type_ == GraphType.LADDER:
        G = nx.ladder_graph(N // 2)
        if N % 2 != 0:
            G.add_node(N - 1)
            G.add_edge(0, N - 1)
        return G
    if type_ == GraphType.LINE:
        return nx.path_graph(N)
    if type_ == GraphType.STAR:
        return nx.star_graph(N - 1)
    if type_ == GraphType.CATERPILLAR:
        # backbone of size b ~ U[1, N); pendent vertices attached uniformly
        B = np.random.randint(low=1, high=N)
        G = nx.empty_graph(N)
        for i in range(1, B):
            G.add_edge(i - 1, i)
        for i in range(B, N):
            G.add_edge(i, np.random.randint(B))
        return G
    if type_ == GraphType.LOBSTER:
        # backbone b ~ U[1, N); first ring pendents up to f ~ U[b+1, N];
        # second ring attached to the first
        B = np.random.randint(low=1, high=N)
        F = np.random.randint(low=B + 1, high=N + 1)
        G = nx.empty_graph(N)
        for i in range(1, B):
            G.add_edge(i - 1, i)
        for i in range(B, F):
            G.add_edge(i, np.random.randint(B))
        for i in range(F, N):
            G.add_edge(i, np.random.randint(low=B, high=F))
        return G
    raise ValueError(f"Unsupported graph type {type_}")


def randomize(A: np.ndarray, base_p: float = 0.9) -> np.ndarray:
    """Toggle edges, preserving the expected edge count
    (graph_generation.py:119-146): existing edges survive w.p. ep, missing edges
    appear w.p. rp, with ep/rp chosen so E[#edges] is unchanged."""
    N = A.shape[0]
    e = np.sum(A) / 2
    r = N * (N - 1) / 2 - e
    if e <= r:
        ep = base_p
        rp = (1 - base_p) * e / r
    else:
        ep = base_p + (1 - base_p) * (e - r) / e
        rp = 1 - base_p

    u = np.random.uniform(size=(N, N), low=0.0, high=0.5)
    u = u + u.T  # symmetric draw
    remaining = np.where(u < ep, 1, 0) * A
    appearing = np.where(u < rp, 1, 0) * (1 - A) * (1 - np.eye(N))
    return remaining + appearing


def generate_graph(N: int, type: GraphType = GraphType.RANDOM,
                   seed: Optional[int] = None, degree=None
                   ) -> Tuple[np.ndarray, np.ndarray, GraphType]:
    """Generate one undirected, unweighted graph with node values ~ U[0,1].

    Returns (adj [N, N] float, node_values [N], actual_type)."""
    random.seed(seed)
    np.random.seed(seed)

    if type == GraphType.RANDOM:
        types = [t for (t, _) in MIXTURE]
        probs = [p for (_, p) in MIXTURE]
        type = types[np.random.choice(len(types), p=probs)]

    G = _build_structure(type, N, seed, degree)

    nodes = list(G)
    random.shuffle(nodes)
    adj = nx.to_numpy_array(G, nodes)
    node_values = np.random.uniform(low=0, high=1, size=N)
    adj = randomize(adj)
    return adj, node_values, type


def generate_graph_no_singletons(N: int, type: GraphType, seed: int
                                 ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Regenerate until no singleton nodes (multitask_dataset.py:46-49).
    Returns (adj, values, next_seed)."""
    seed += 1
    adj, values, actual = generate_graph(N, type, seed=seed)
    while np.min(np.max(adj, 0)) == 0.0:
        seed += 1
        adj, values, _ = generate_graph(N, actual, seed=seed)
    return adj, values, seed
