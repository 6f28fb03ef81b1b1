"""Single-chip kernel lab: compare SpMV implementations on one graph.

The analog of the reference's ``src/singlenode/`` harness
(main.cpp: 6 format/kernel variants running the same PageRank and printing
memory / time / op count / checksum for cross-checking). Here the variants
are the TPU kernel implementations behind one API:

  0  scan      — XLA segmented-scan TCSC (portable)
  1  segment   — jax.ops.segment_sum TCSC (XLA scatter lowering)
  2  scan-csc  — segmented scan over plain CSC (no renumbering)
  3  shuffle   — Pallas static-shuffle pipeline (v1)
  4  shuffle2  — Pallas windowed-gather pipeline (v2)
  5  panel     — Pallas panel-route pipeline (v3, the fast path)
  6  onehot    — XLA gather + Pallas blocked one-hot reduce
  7  scan-cf   — TCSC_CF phase execution (the reference ODCSC/LA3
                 regular/source-split idea, odcsc_spmspv.hpp:479-566 —
                 design-collapsed into the CF first/middle/last subsets)
  8  scan-dcsc — DCSC: compact nnz-col ids + x gathered through the JC
                 table (reference: dcsc_spmv.hpp:216-230)

Cross-checks (reference: csc_spmv.hpp:222-228 — op counts and checksums
must agree across formats): ``operations`` = stored nnz x iterations is
computed from each variant's OWN tileset, so a format that dropped or
duplicated edges breaks the equality; ``slots`` counts the padded slots
the variant actually streams (its work amplification), which is allowed
to differ — that's the design tradeoff being measured.

Usage: python -m graphtap_tpu.tools.kernel_lab <which 0-8> <file> <nvertices> <niters>
(mirrors ``bin/main <which> <file> <nvertices> <niters>``,
singlenode/main.cpp:26).
"""

from __future__ import annotations

import sys
import time

import numpy as np


VARIANTS = {0: ("scan", "tcsc"), 1: ("segment", "tcsc"),
            2: ("scan", "csc"), 3: ("shuffle", "tcsc"),
            4: ("shuffle2", "tcsc"), 5: ("panel", "tcsc"),
            6: ("onehot", "tcsc"), 7: ("scan", "tcsc_cf"),
            # 8: DCSC — compact col ids, x gathered through JC (the
            # reference lab's dcsc_spmv.hpp:216-230 shape)
            8: ("scan", "dcsc")}

LANES = 128


def _slots_per_iter(ex) -> int:
    """Padded slots the variant streams per iteration (work volume)."""
    k = ex.kernel
    if k in ("scan", "segment"):
        return ex.tiles.Ep
    if k == "onehot":
        return ex._onehot_plans["main"].Ep
    m = ex._shuffle_meta
    if k == "shuffle":
        return m.total_rows * (m.npasses + 1) * LANES
    if k == "shuffle2":
        return sum(m.out_rows.values()) * LANES
    if k == "panel":
        from graphtap_tpu.kernels.panel_plan import PROWS, XROWS
        return ((m.exp_panels + 1) * XROWS + m.exp_panels * PROWS
                + m.pa_panels * PROWS + m.fix_panels * PROWS
                + m.f2_panels * PROWS + m.dense_rows) * LANES
    return ex.tiles.Ep


def run_variant(which: int, path: str, nvertices: int, niters: int,
                value_dtype=None) -> dict:
    import jax
    import jax.numpy as jnp
    from graphtap_tpu import Graph, GraphConfig, Compression, make_mesh
    from graphtap_tpu.apps.degree import DegreeProgram
    from graphtap_tpu.apps.pagerank import PageRankProgram
    from graphtap_tpu.config import EngineConfig, Ordering
    from graphtap_tpu.engine.executor import Executor

    if value_dtype is None:
        value_dtype = jnp.float32
    kernel, comp = VARIANTS[which]
    compression = {"tcsc": Compression.TCSC, "csc": Compression.CSC,
                   "tcsc_cf": Compression.TCSC_CF,
                   "dcsc": Compression.DCSC}[comp]

    mesh = make_mesh(jax.devices()[:1], shape=(1, 1))
    cfg = GraphConfig(num_vertices=nvertices, directed=True, transpose=True,
                      compression=compression)
    g = Graph.load(path, cfg, mesh=mesh)

    deg_ex = Executor(g, DegreeProgram(value_dtype=value_dtype),
                      EngineConfig(stationary=True, ordering=Ordering.COL),
                      tiles=g.tiled(Ordering.COL,
                                    compression=Compression.TCSC
                                    if comp == "tcsc_cf" else None),
                      kernel=kernel)
    deg_ex.initialize()
    deg_ex.execute(1)

    pr_ex = Executor(g, PageRankProgram(value_dtype=value_dtype),
                     EngineConfig(stationary=True, ordering=Ordering.ROW),
                     kernel=kernel)
    pr_ex.initialize(other=deg_ex)
    pr_ex.execute(niters)  # warmup/compile
    pr_ex.initialize(other=deg_ex)
    t0 = time.perf_counter()
    pr_ex.execute(niters)
    dt = time.perf_counter() - t0

    nnz = pr_ex.tiles.nnz_total
    checksum, reachable = pr_ex.checksum()
    mem = sum(a.nbytes for a in
              (pr_ex.tiles.rows, pr_ex.tiles.cols, pr_ex.tiles.ja)
              if a is not None)
    slots = _slots_per_iter(pr_ex) * niters
    return {
        "variant": f"{kernel}/{comp}",
        "memory_gb": mem / 1e9,
        "seconds": dt,
        "operations": nnz * niters,
        "slots": slots,
        "pad_factor": slots / max(1, nnz * niters),
        "gteps": nnz * niters / dt / 1e9,
        "checksum": checksum,
        "reachable": reachable,
    }


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 4:
        print("Usage: kernel_lab <which 0-8> <file> <nvertices> <niters>")
        return 1
    which, path, nv, niters = int(argv[0]), argv[1], int(argv[2]), int(argv[3])
    r = run_variant(which, path, nv, niters)
    print(f"{r['variant']} kernel unit test stats:")
    print(f"Utilized Memory: {r['memory_gb']:.6g} GB")
    print(f"Elapsed time   : {r['seconds']:.6g} Sec")
    print(f"Num Operations : {r['operations']}")
    print(f"Slots Streamed : {r['slots']} (pad x{r['pad_factor']:.2f})")
    print(f"GTEPS          : {r['gteps']:.4f}")
    print(f"Final value    : {r['checksum']:.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
