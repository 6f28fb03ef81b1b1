"""Benchmark driver: PageRank GTEPS on RMAT-20, one real chip.

Prints ONE JSON line:
  {"metric": "pagerank_gteps_rmat20", "value": N, "unit": "GTEPS",
   "vs_baseline": N}

The baseline is the reference's own TCSC SpMSpV kernel
(src/singlenode/tcsc_spmspv2.hpp) compiled with g++ -O2 and run on this
machine's CPU over the identical RMAT-20 graph (generated with
graphtap_tpu.ingest.rmat, seed 1): 318,767,104 edge-ops in 1.059 s for the
20-iteration PageRank loop = 0.3009 GTEPS (see BASELINE.md). GTEPS here is
counted the same way: (deduped) stored edges × iterations / loop seconds,
excluding ingest and compile.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REF_CPU_GTEPS = 0.3009  # reference TCSC on this host's CPU (see docstring)

SCALE = 20
EDGE_FACTOR = 16
ITERS = 20
SEED = 1


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from graphtap_tpu import Graph, GraphConfig, Compression, make_mesh
    from graphtap_tpu.apps.pagerank import PageRankProgram
    from graphtap_tpu.apps.degree import DegreeProgram
    from graphtap_tpu.config import EngineConfig, Ordering
    from graphtap_tpu.engine.executor import Executor
    from graphtap_tpu.ingest.rmat import rmat_edges

    src, dst, _ = rmat_edges(scale=SCALE, edge_factor=EDGE_FACTOR, seed=SEED)
    n = 1 << SCALE

    mesh = make_mesh()
    cfg = GraphConfig(num_vertices=n, directed=True, transpose=True,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)

    deg_ex = Executor(g, DegreeProgram(value_dtype=jnp.float32),
                      EngineConfig(stationary=True, ordering=Ordering.COL))
    deg_ex.initialize()
    deg_ex.execute(1)

    pr_ex = Executor(g, PageRankProgram(value_dtype=jnp.float32),
                     EngineConfig(stationary=True, ordering=Ordering.ROW))
    pr_ex.initialize(other=deg_ex)

    nnz = pr_ex.tiles.nnz_total

    # warmup (compile) — run the full fixed-iteration loop once
    pr_ex.execute(ITERS)

    # timed: re-init and run again
    pr_ex.initialize(other=deg_ex)
    t0 = time.perf_counter()
    pr_ex.execute(ITERS)
    dt = time.perf_counter() - t0

    gteps = nnz * ITERS / dt / 1e9
    checksum, _ = pr_ex.checksum()

    print(json.dumps({
        "metric": "pagerank_gteps_rmat20",
        "value": round(gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / REF_CPU_GTEPS, 3),
        "detail": {
            "edges": int(nnz), "iters": ITERS, "seconds": round(dt, 4),
            "checksum": round(checksum, 2), "devices": len(jax.devices()),
        },
    }))


if __name__ == "__main__":
    main()
