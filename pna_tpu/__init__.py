"""pna_tpu — a TPU-native graph neural network framework for the PNA family.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PNA codebase (lukecavabarrett/pna): Principal Neighbourhood Aggregation layers
(Corso, Cavalleri, Beaini, Lio, Velickovic — NeurIPS 2020, arXiv:2004.05718),
the GCN/GAT/GIN/MPNN comparison layers, the multitask synthetic benchmark and the
real-world benchmarks (ZINC, MolHIV, MNIST/CIFAR10 superpixels), plus TPU-first
additions: fused Pallas segment kernels, mesh-sharded data parallelism and
edge-partitioned multi-host scaling.
"""

__version__ = "0.1.0"

from pna_tpu.graph import Graph, batch_graphs, build_graph, from_dense

__all__ = ["Graph", "batch_graphs", "build_graph", "from_dense", "__version__"]
