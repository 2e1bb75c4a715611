// Native graph-structure kernels for the host-side data path.
//
// The reference delegates its graph bookkeeping to DGL's C++ core
// (dgl.batch, degree bucketing — SURVEY §2.4); here the TPU feeds on
// static-shape layouts built host-side, and these loops are the only O(E)
// host work: ELL (padded neighbor-list) construction, degree counting and
// edge-partition index building.  Python fallbacks exist for all entry
// points; this library keeps the 100M-edge benchmark's preprocessing off the
// Python interpreter.
//
// Build: pna_tpu/native/__init__.py compiles this with g++ -O3 -shared.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// In-degree count over masked edges.  receivers[e] in [0, n_nodes).
void degree_count(const int32_t* receivers, const uint8_t* edge_mask,
                  int64_t n_edges, int64_t n_nodes, int32_t* out_deg) {
    std::memset(out_deg, 0, sizeof(int32_t) * n_nodes);
    for (int64_t e = 0; e < n_edges; ++e) {
        if (edge_mask[e]) out_deg[receivers[e]]++;
    }
}

// ELL construction: nbr[n * dmax + k] = edge id of node n's k-th in-edge.
// Returns the max in-degree (caller must have dmax >= it, checked first via
// degree_count).  mask uses uint8 0/1.
void build_ell(const int32_t* receivers, const uint8_t* edge_mask,
               int64_t n_edges, int64_t n_nodes, int64_t dmax,
               int32_t* out_nbr, uint8_t* out_mask) {
    std::memset(out_nbr, 0, sizeof(int32_t) * n_nodes * dmax);
    std::memset(out_mask, 0, sizeof(uint8_t) * n_nodes * dmax);
    std::vector<int64_t> fill(n_nodes, 0);
    for (int64_t e = 0; e < n_edges; ++e) {
        if (!edge_mask[e]) continue;
        int64_t r = receivers[e];
        int64_t k = fill[r]++;
        out_nbr[r * dmax + k] = (int32_t)e;
        out_mask[r * dmax + k] = 1;
    }
}

// Stable counting-sort of edge ids by receiver; out_order is a permutation of
// [0, n_edges) such that receivers[out_order] is ascending.
void sort_edges_by_receiver(const int32_t* receivers, int64_t n_edges,
                            int64_t n_nodes, int32_t* out_order) {
    std::vector<int64_t> count(n_nodes + 1, 0);
    for (int64_t e = 0; e < n_edges; ++e) count[receivers[e] + 1]++;
    for (int64_t n = 0; n < n_nodes; ++n) count[n + 1] += count[n];
    for (int64_t e = 0; e < n_edges; ++e) {
        out_order[count[receivers[e]]++] = (int32_t)e;
    }
}

// Partition bookkeeping for contiguous node-range partitions (nl nodes per
// part): counts edges per part and, per (src_part, dst_part) pair, the number
// of distinct remote sender nodes (halo size).  Outputs:
//   edge_count[p], halo_count[q * P + p]
// Uses a stamp array to count distinct senders without sorting.
void partition_stats(const int64_t* senders, const int64_t* receivers,
                     int64_t n_edges, int64_t nl, int64_t num_parts,
                     int64_t n_nodes,
                     int64_t* edge_count, int64_t* halo_count) {
    std::memset(edge_count, 0, sizeof(int64_t) * num_parts);
    std::memset(halo_count, 0, sizeof(int64_t) * num_parts * num_parts);
    std::vector<int32_t> stamp(n_nodes, -1);
    for (int64_t e = 0; e < n_edges; ++e) {
        int64_t p = receivers[e] / nl;
        edge_count[p]++;
        int64_t q = senders[e] / nl;
        if (q != p) {
            // distinct (sender, p) pairs: stamp by destination part
            if (stamp[senders[e]] != (int32_t)p) {
                stamp[senders[e]] = (int32_t)p;
                halo_count[q * num_parts + p]++;
            }
        }
    }
}

}  // extern "C"
