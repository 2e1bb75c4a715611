"""Label-oracle parity: pna_tpu.data.graph_algorithms vs the reference
implementations (importable torch-free from /root/reference)."""

import numpy as np
import pytest

from pna_tpu.data import graph_algorithms as ours
from pna_tpu.data.graph_generation import GraphType, generate_graph
from tests._reference import REFERENCE_PATH, add_reference_to_path
import os

ref_available = os.path.isdir(REFERENCE_PATH)
pytestmark = pytest.mark.skipif(not ref_available, reason="reference unavailable")


def get_ref():
    add_reference_to_path()
    from multitask_benchmark.datasets_generation import graph_algorithms as ref
    return ref


def graphs(n=8, count=4):
    out = []
    for s in range(count):
        adj, feats, _ = generate_graph(n, GraphType.RANDOM, seed=s + 1)
        # avoid singletons for distance-based labels
        for i in range(n):
            if adj[i].sum() == 0:
                j = (i + 1) % n
                adj[i, j] = adj[j, i] = 1
        out.append((adj, feats))
    return out


@pytest.mark.parametrize("fn", [
    "first_neighbours", "second_neighbours", "eccentricity", "diameter",
    "spectral_radius", "max_eigenvalue", "is_connected",
    "is_eulerian_cyclable", "is_eulerian_percorrible", "count_edges",
])
def test_adj_only_algorithms(fn):
    ref = get_ref()
    for adj, _ in graphs():
        a = getattr(ours, fn)(adj.copy())
        b = getattr(ref, fn)(adj.copy())
        np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                   np.asarray(b, dtype=np.float64),
                                   rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("fn", [
    "graph_laplacian_features", "mean_neighbourhood", "max_neighbourhood",
    "min_neighbourhood", "std_neighbourhood", "local_maxima",
    "mean_graph", "max_graph", "min_graph", "std_graph",
])
def test_feature_algorithms(fn):
    ref = get_ref()
    for adj, feats in graphs():
        a = getattr(ours, fn)(adj.copy(), feats.copy())
        b = getattr(ref, fn)(adj.copy(), feats.copy())
        np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                   np.asarray(b, dtype=np.float64),
                                   rtol=1e-8, atol=1e-8)


def test_apsp_and_kth():
    ref = get_ref()
    for adj, _ in graphs():
        np.testing.assert_allclose(ours.all_pairs_shortest_paths(adj, 0),
                                   ref.all_pairs_shortest_paths(adj.copy(), 0))
        for k in (1, 2, 3):
            np.testing.assert_allclose(ours.kth_neighbours(adj, k),
                                       ref.kth_neighbours(adj.copy(), k))


def test_pagerank_and_eig():
    ref = get_ref()
    for adj, feats in graphs():
        np.testing.assert_allclose(ours.page_rank(adj),
                                   ref.page_rank(adj.copy()), rtol=1e-6,
                                   atol=1e-9)
        np.testing.assert_allclose(
            ours.max_absolute_eigenvalues(adj, 3),
            ref.max_absolute_eigenvalues(adj.copy(), 3), rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            ours.max_absolute_eigenvalues_laplacian(adj, 3),
            ref.max_absolute_eigenvalues_laplacian(adj.copy(), 3),
            rtol=1e-6, atol=1e-8)


def test_sssp_predecessor_and_tsp():
    ref = get_ref()
    for adj, _ in graphs(7, 3):
        n = adj.shape[0]
        src = np.zeros(n)
        src[2] = 1
        np.testing.assert_allclose(ours.sssp_predecessor(adj, src),
                                   ref.sssp_predecessor(adj.copy(), src))
        np.testing.assert_allclose(ours.tsp_length(adj),
                                   ref.tsp_length(adj.copy()), rtol=1e-8)


def test_hamiltonian():
    ref = get_ref()
    # line graph: no hamiltonian cycle; cycle graph: yes
    n = 6
    line = np.zeros((n, n))
    for i in range(n - 1):
        line[i, i + 1] = line[i + 1, i] = 1
    cycle = line.copy()
    cycle[0, n - 1] = cycle[n - 1, 0] = 1
    assert ours.has_hamiltonian_cycle(line.copy()) == \
        ref.has_hamiltonian_cycle(line.copy())
    assert ours.has_hamiltonian_cycle(cycle.copy()) == \
        ref.has_hamiltonian_cycle(cycle.copy())
    assert ours.has_hamiltonian_cycle(cycle.copy())


def test_isomorphism():
    ref = get_ref()
    adj, _ = graphs(7, 1)[0]
    perm = np.random.RandomState(0).permutation(7)
    adj2 = adj[np.ix_(perm, perm)]
    assert ours.isomorphism(adj, adj2) == ref.isomorphism(adj.copy(), adj2.copy())
    assert ours.isomorphism(adj, adj2)
    line = np.zeros((7, 7))
    for i in range(6):
        line[i, i + 1] = line[i + 1, i] = 1
    assert ours.isomorphism(adj, line) == ref.isomorphism(adj.copy(), line.copy())


def test_generation_properties():
    """Generator invariants: symmetric, no self loops, values in [0,1]."""
    for t in (GraphType.ERDOS_RENYI, GraphType.GRID, GraphType.TREE,
              GraphType.STAR, GraphType.CATERPILLAR, GraphType.LOBSTER,
              GraphType.LADDER, GraphType.LINE, GraphType.CAVEMAN,
              GraphType.BARABASI_ALBERT, GraphType.RANDOM):
        adj, vals, actual = generate_graph(12, t, seed=3)
        assert adj.shape == (12, 12)
        np.testing.assert_allclose(adj, adj.T)
        assert np.all(np.diag(adj) == 0)
        assert np.all((vals >= 0) & (vals <= 1))
