"""Multi-host (multi-process) runtime — the distributed communication
backend of the framework.

The reference is single-process/single-GPU (SURVEY §2.5: no NCCL/MPI/
torch.distributed anywhere); this module is the TPU-native counterpart built
on ``jax.distributed`` + GSPMD collectives.  Design follows the standard TPU
scaling recipe: the slower **DCN** (host-to-host) network carries only the
data-parallel axis, while graph partitioning / tower TP collectives
(all_to_all halo exchange, BN psums, readout psums) ride **ICI** inside a
slice — ``hybrid_mesh`` encodes exactly that by building the mesh with the
process dimension mapped to the leading (DCN) axes.

Typical use on an N-host TPU pod slice::

    from pna_tpu.parallel import multihost
    multihost.initialize()                      # env-driven on Cloud TPU
    mesh = multihost.hybrid_mesh(dcn_axes={'data': multihost.process_count()},
                                 ici_axes={'graph': 4})
    consts = [multihost.put_global(x, mesh, P('graph')) for x in tables]

Verified by tests/test_multihost.py: two OS processes x 4 virtual CPU
devices run the full edge-partitioned ``DistributedPNANet`` train step on a
2('data', DCN) x 4('graph', ICI) global mesh and reproduce the single-process
loss exactly.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Initialize the cross-process runtime (idempotent, single-process no-op).

    On Cloud TPU all arguments are discovered from the metadata server and may
    be omitted.  Elsewhere (CPU simulation, manual clusters) pass them or set
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes in (None, 1) and coordinator_address is None:
        return  # single process — nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on the process that should own writes (checkpoints, logs)."""
    return jax.process_index() == 0


def hybrid_mesh(dcn_axes: Dict[str, int], ici_axes: Dict[str, int],
                devices=None) -> Mesh:
    """Build a mesh whose leading axes span hosts (DCN) and trailing axes stay
    inside a host/slice (ICI).

    ``dcn_axes`` and ``ici_axes`` are ordered {name: size} dicts.  The product
    of dcn sizes must equal the process count (1 for single-process, where a
    plain device mesh is returned and "DCN" axes are just the slowest-varying
    dims).  Collectives over ici axis names then never cross hosts.
    """
    from jax.experimental import mesh_utils

    names = tuple(dcn_axes) + tuple(ici_axes)
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())
    n_proc = jax.process_count()
    if devices is None and n_proc > 1:
        assert int(np.prod(dcn_shape)) == n_proc, (
            f"dcn axes {dcn_axes} must multiply to process_count={n_proc}")
        # TPU pods expose slice boundaries via device.slice_index; elsewhere
        # (CPU simulation, single-slice) fall back to one granule per process.
        has_slices = len({getattr(d, "slice_index", 0)
                          for d in jax.devices()}) > 1
        # create_hybrid_device_mesh multiplies the two shapes elementwise, so
        # pad each with 1s: dcn axes lead, ici axes trail.
        ici_full = (1,) * len(dcn_shape) + ici_shape
        dcn_full = dcn_shape + (1,) * len(ici_shape)
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=ici_full, dcn_mesh_shape=dcn_full,
            process_is_granule=not has_slices)
        return Mesh(dev, names)
    devices = devices if devices is not None else jax.devices()
    dev = np.asarray(devices).reshape(dcn_shape + ici_shape)
    return Mesh(dev, names)


def put_global(x, mesh: Mesh, spec: PartitionSpec):
    """Place a host array onto a (possibly multi-process) mesh.

    Every process passes the full logical array (cheap for the replicated
    index tables this is used for); only addressable shards are transferred.
    """
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def barrier(name: str = "pna_tpu_barrier") -> None:
    """Block until every process reaches this point."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
