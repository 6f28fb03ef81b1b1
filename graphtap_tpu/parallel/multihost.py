"""Multi-host hooks: process initialization and per-host ingest.

The reference scales across nodes with `mpirun` + MPI_COMM_WORLD
(reference: src/mpi/env.hpp:77-93). The TPU equivalent is
``jax.distributed.initialize()`` + a global device mesh: every host runs
the same program, `jax.devices()` spans all hosts, and the
('rows','cols') mesh built from it carries the engine's collectives over
ICI within a slice and DCN across hosts — no per-host code paths.

Ingest parallelism mirrors the reference's byte-range splitting
(graph.hpp:234-240): each host reads its 1/nprocs share via
``read_edge_list(process_index=, process_count=)`` and contributes its
edges' device shards through
``jax.make_array_from_process_local_data``. The tile builder is
deterministic given the global edge list, so hosts only need the edges
destined for their *addressable* devices; `host_edge_share` computes that
subset.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax

from graphtap_tpu.parallel.layout import Partition, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize the multi-host runtime (no-op on a single host).

    Returns (process_index, process_count). The analog of Env::init
    (env.hpp:77-93); barriers come from collective ops rather than
    MPI_Barrier.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_edge_share(r: np.ndarray, c: np.ndarray, part: Partition,
                    mesh) -> np.ndarray:
    """Boolean mask of edges whose tile lives on this process's
    addressable devices (the analog of Matrix::distribute's all-to-all
    routing, matrix.hpp:692-810, done by selection instead of exchange)."""
    dev = part.edge_device(r, c)
    flat = mesh.devices.reshape(-1)
    local = np.array([d.process_index == jax.process_index()
                      for d in flat])
    return local[dev]
