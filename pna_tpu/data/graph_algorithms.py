"""Classical graph algorithms used as supervised label oracles for the
multitask benchmark — numpy re-implementations of the algorithm suite in
``multitask_benchmark/datasets_generation/graph_algorithms.py`` (same function
names and semantics; implementations vectorized — e.g. Floyd–Warshall is a
broadcasted min-plus instead of the reference's O(N^3) Python triple loop at
``graph_algorithms.py:305-308``)."""

from __future__ import annotations

import math
from collections import deque

import numpy as np


# ---------------------------------------------------------------------------
# connectivity / neighbourhood counts
# ---------------------------------------------------------------------------

def is_connected(A) -> bool:
    """Repeated squaring of A, then min > 0 (graph_algorithms.py:7-15).

    QUIRK (faithfully reproduced because this is a default graph *label*): the
    reference squares A without adding the identity, so it tests for walks of
    length exactly 2^k — connected *bipartite* graphs (e.g. lines, grids)
    report False.  Use ``is_connected_exact`` for the true predicate."""
    A = np.asarray(A, dtype=np.float64)
    for _ in range(int(1 + math.ceil(math.log2(A.shape[0])))):
        A = A @ A
        A = np.minimum(A, 1.0)  # keep counts bounded; min>0 test is unchanged
    return bool(np.min(A) > 0)


def is_connected_exact(A) -> bool:
    """True graph connectivity (reachability with self-loops)."""
    A = np.asarray(A, dtype=np.float64)
    M = A + np.eye(A.shape[0])
    for _ in range(int(1 + math.ceil(math.log2(max(A.shape[0], 2))))):
        M = np.minimum(M @ M, 1.0)
    return bool(np.min(M) > 0)


def identity(A, F):
    return F


def first_neighbours(A):
    """Number of nodes reachable in 1 hop, per node."""
    return np.sum(np.asarray(A) > 0, axis=0)


def second_neighbours(A):
    """Number of nodes reachable in <= 2 hops (excluding itself), per node."""
    A = np.asarray(A) > 0
    R = A + (A @ A)
    R = R.astype(bool).copy()
    np.fill_diagonal(R, False)
    return np.sum(R, axis=0)


def kth_neighbours(A, k):
    """Number of nodes reachable in <= k hops (excluding itself), per node."""
    A = np.asarray(A) > 0
    R = np.zeros(A.shape, dtype=bool)
    for _ in range(k):
        R = (R @ A) + A
    R = R.astype(bool).copy()
    np.fill_diagonal(R, False)
    return np.sum(R, axis=0)


def _khop_reach(A, hops=1, consider_itself=False):
    A = np.asarray(A) > 0
    R = np.zeros(A.shape, dtype=bool)
    for _ in range(hops):
        R = (R @ A) + A
    R = R.astype(bool).copy()
    np.fill_diagonal(R, consider_itself)
    return R


def map_reduce_neighbourhood(A, F, f_reduce, f_map=None, hops=1,
                             consider_itself=False):
    """Map each node's k-hop neighbourhood features with f_map, reduce with
    f_reduce."""
    F = np.asarray(F)
    if f_map is not None:
        F = f_map(F)
    R = _khop_reach(A, hops, consider_itself)
    return np.array([f_reduce(F[R[i]]) for i in range(R.shape[0])])


def max_neighbourhood(A, F):
    return map_reduce_neighbourhood(A, F, np.max, consider_itself=True)


def min_neighbourhood(A, F):
    return map_reduce_neighbourhood(A, F, np.min, consider_itself=True)


def std_neighbourhood(A, F):
    return map_reduce_neighbourhood(A, F, np.std, consider_itself=True)


def mean_neighbourhood(A, F):
    return map_reduce_neighbourhood(A, F, np.mean, consider_itself=True)


def local_maxima(A, F):
    return np.asarray(F) == max_neighbourhood(A, F)


# ---------------------------------------------------------------------------
# Laplacian / spectra
# ---------------------------------------------------------------------------

def graph_laplacian(A):
    A = np.asarray(A)
    L = (A > 0) * -1
    L = L.astype(np.int64)
    np.fill_diagonal(L, np.sum(A > 0, axis=0))
    return L


def graph_laplacian_features(A, F):
    return graph_laplacian(A) @ np.asarray(F)


def max_eigenvalue(A):
    W = np.linalg.eigvals(np.asarray(A, dtype=np.float64))
    return W[np.argmax(np.absolute(W))].real


def max_eigenvalues(A, k):
    W = np.linalg.eigvals(np.asarray(A, dtype=np.float64))
    order = np.argsort(-np.absolute(W))
    return W[order[:k]].real


def max_absolute_eigenvalues(A, k):
    return np.absolute(max_eigenvalues(A, k))


def max_absolute_eigenvalues_laplacian(A, n):
    return np.absolute(max_eigenvalues(graph_laplacian(A), n))


def max_eigenvector(A):
    W, V = np.linalg.eig(np.asarray(A, dtype=np.float64))
    return V[:, np.argmax(np.absolute(W))].real


def spectral_radius(A):
    return np.abs(max_eigenvalue(A))


def page_rank(A, F=None, iter=64):
    """Limit distribution of the row-normalised random walk (power iteration by
    repeated squaring, `iter` = number of squarings)."""
    A = np.asarray(A, dtype=np.float64).copy()
    A /= A.sum(axis=1)[:, None]
    for _ in range(iter):
        A = A @ A
    if F is None:
        F = np.ones(A.shape[-1])
    else:
        F = np.asarray(F, dtype=np.float64)
    F = F / np.sum(F)
    return F @ A


# ---------------------------------------------------------------------------
# shortest paths / distances
# ---------------------------------------------------------------------------

def all_pairs_shortest_paths(A, inf_sub=math.inf):
    """Floyd–Warshall as vectorized min-plus over rows (same results as the
    reference's scalar triple loop, O(N^3) flops but numpy-speed)."""
    A = np.asarray(A, dtype=np.float64)
    N = A.shape[0]
    D = np.where(A == 0, np.inf, A)
    np.fill_diagonal(D, 0.0)
    for k in range(N):
        D = np.minimum(D, D[:, k:k + 1] + D[k:k + 1, :])
    return np.where(np.isinf(D), inf_sub, D)


def diameter(A):
    s = np.sum(A)
    apsp = all_pairs_shortest_paths(A)
    apsp = np.where(apsp < s + 1, apsp, -1)
    return np.max(apsp)


def eccentricity(A):
    s = np.sum(A)
    apsp = all_pairs_shortest_paths(A)
    apsp = np.where(apsp < s + 1, apsp, -1)
    return np.max(apsp, axis=0)


def sssp_predecessor(A, F):
    """BFS predecessor matrix towards the source marked by the 1-hot F."""
    A = np.asarray(A)
    F = np.asarray(F)
    assert np.sum(F) == 1 and np.max(F) == 1
    s = int(np.argmax(F))
    N = A.shape[0]
    P = np.zeros(A.shape)
    visited = np.zeros(N, dtype=bool)
    visited[s] = True
    q = deque([s])
    while q:
        u = q.popleft()
        for v in range(N):
            if A[u][v] > 0 and not visited[v]:
                visited[v] = True
                P[v][u] = 1
                q.append(v)
    return P


# ---------------------------------------------------------------------------
# Eulerian / Hamiltonian / TSP
# ---------------------------------------------------------------------------

def count_edges(A):
    return np.sum(A) / 2


def is_eulerian_cyclable(A):
    return is_connected(A) and np.count_nonzero(first_neighbours(A) % 2 == 1) == 0


def is_eulerian_percorrible(A):
    return is_connected(A) and np.count_nonzero(first_neighbours(A) % 2 == 1) in (0, 2)


def map_reduce_graph(A, F, f_reduce):
    return f_reduce(np.asarray(F))


def mean_graph(A, F):
    return map_reduce_graph(A, F, np.mean)


def max_graph(A, F):
    return map_reduce_graph(A, F, np.max)


def min_graph(A, F):
    return map_reduce_graph(A, F, np.min)


def std_graph(A, F):
    return map_reduce_graph(A, F, np.std)


def has_hamiltonian_cycle(A) -> bool:
    """Backtracking search for a Hamiltonian cycle."""
    A = np.asarray(A)
    A = (A + A.T) > 0
    V = A.shape[0]
    used = [False] * V
    path = [-1] * V
    path[0] = 0
    used[0] = True

    def rec(pos):
        if pos == V:
            return bool(A[path[pos - 1]][path[0]])
        for v in range(1, V):
            if A[path[pos - 1]][v] and not used[v]:
                path[pos] = v
                used[v] = True
                if rec(pos + 1):
                    return True
                path[pos] = -1
                used[v] = False
        return False

    return rec(1)


def tsp_length(A, F=None):
    """Held–Karp DP over subsets of target nodes (shortest closed... the
    reference computes the shortest path visiting all targets, open-ended:
    min over end nodes of dp[full_mask][end])."""
    D = all_pairs_shortest_paths(A)
    N = D.shape[0]
    if F is None:
        F = np.ones(N)
    targets = np.nonzero(np.asarray(F))[0]
    T = targets.shape[0]
    S = 1 << T
    dp = np.full((S, T), math.inf)
    for j in range(T):
        dp[1 << j][j] = 0.0
    for msk in range(1, S):
        if msk & (msk - 1) == 0:
            continue  # single-bit masks initialised above
        for u in range(T):
            if not (msk >> u) & 1:
                continue
            prev = msk ^ (1 << u)
            best = math.inf
            for v in range(T):
                if (prev >> v) & 1:
                    c = dp[prev][v] + D[targets[v]][targets[u]]
                    if c < best:
                        best = c
            dp[msk][u] = best
    return np.min(dp[S - 1])


# ---------------------------------------------------------------------------
# isomorphism (Weisfeiler-Lehman hashing)
# ---------------------------------------------------------------------------

def isomorphism(A1, A2, F1=None, F2=None) -> bool:
    """1-WL test; false positives possible (same contract as the reference)."""
    N = A1.shape[0]
    if (F1 is None) ^ (F2 is None):
        raise ValueError("either both or none of F1, F2 must be given")
    if F1 is None:
        F1 = np.ones(N, dtype=np.int64)
        F2 = np.ones(N, dtype=np.int64)
    else:
        F1 = np.asarray(F1)
        F2 = np.asarray(F2)
        if not np.array_equal(np.sort(F1), np.sort(F2)):
            return False

    P = 1000000007

    def mapping(F):
        return (F * 234 + 133) % P

    def nbhd_hash(vals):
        h = 0
        for f in np.sort(vals):
            h = (257 * h + int(f)) % P
        return h

    for _ in range(N):
        F1 = map_reduce_neighbourhood(A1, F1, nbhd_hash, f_map=mapping,
                                      consider_itself=True)
        F2 = map_reduce_neighbourhood(A2, F2, nbhd_hash, f_map=mapping,
                                      consider_itself=True)
        if not np.array_equal(np.sort(F1), np.sort(F2)):
            return False
    return True
