"""Benchmark driver: PageRank GTEPS on RMAT-20, one real chip.

Prints ONE JSON line (stdout):
  {"metric": "pagerank_gteps_rmat20", "value": N, "unit": "GTEPS",
   "vs_baseline": N}

The baseline is the reference's own TCSC SpMSpV kernel
(src/singlenode/tcsc_spmspv2.hpp) compiled with g++ -O2 and run on this
machine's CPU over the identical RMAT-20 graph (generated with
graphtap_tpu.ingest.rmat, seed 1): 318,767,104 edge-ops in 1.059 s for the
20-iteration PageRank loop = 0.3009 GTEPS (see BASELINE.md). GTEPS here is
counted the same way: (deduped) stored edges x iterations / loop seconds,
excluding ingest and compile — the reference likewise benchmarks over
pre-built RMAT binaries (graphtap.slurm:43-48), so host-side build
artifacts (tiles, shuffle plans) are disk-cached in .bench_cache/.

Env knobs: BENCH_KERNEL (panel|shuffle2|shuffle|scan|segment, default
panel — the v3 all-static panel-route pipeline, the fastest validated
kernel on-chip), BENCH_SCALE, BENCH_ITERS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_CPU_GTEPS = 0.3009  # reference TCSC on this host's CPU (see docstring)

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EDGE_FACTOR = 16
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
SEED = 1
KERNEL = os.environ.get("BENCH_KERNEL", "panel")
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def get_artifacts(graph, ordering, kernel, value_dtype, t0=None):
    import time as _t
    _ts = _t.perf_counter()
    """Tiles + shuffle plans for one ordering, disk-memoized."""
    import numpy as np
    from graphtap_tpu.tools import artifact_cache as ac

    R, C = graph.mesh.devices.shape
    key = f"rmat{SCALE}_ef{EDGE_FACTOR}_s{SEED}_{ordering.value}_{R}x{C}"
    tp = os.path.join(CACHE, f"tiles_{key}.npz")
    if os.path.exists(tp):
        tiles = ac.load_tileset(tp)
    else:
        tiles = graph.tiled(ordering)
        ac.save_tileset(tiles, tp)
    log(f"[bench] tiles({ordering.value}) ready "
        f"(+{_t.perf_counter()-_ts:.0f}s)")
    _ts = _t.perf_counter()
    plans = None
    if kernel == "shuffle":
        pp = os.path.join(CACHE, f"plans_{key}_{np.dtype(value_dtype).name}.npz")
        if os.path.exists(pp):
            plans = ac.load_shuffle_plans(pp)
        else:
            from graphtap_tpu.kernels.shuffle_engine import build_shuffle_plans
            plans = build_shuffle_plans(tiles,
                                        value_dtype=np.dtype(value_dtype))
            ac.save_shuffle_plans(plans, pp)
        log(f"[bench] plans({ordering.value}) ready "
            f"(+{_t.perf_counter()-_ts:.0f}s)")
    elif kernel == "shuffle2":
        pp = os.path.join(CACHE,
                          f"plans2_{key}_{np.dtype(value_dtype).name}.npz")
        if os.path.exists(pp):
            plans = ac.load_spmv2_meta(pp)
        else:
            from graphtap_tpu.kernels.gather_engine import build_spmv2_meta
            plans = build_spmv2_meta(tiles, value_dtype=np.dtype(value_dtype))
            ac.save_spmv2_meta(plans, pp)
        log(f"[bench] plans2({ordering.value}) ready "
            f"(+{_t.perf_counter()-_ts:.0f}s)")
    elif kernel == "panel":
        pp = os.path.join(CACHE,
                          f"plans3_{key}_{np.dtype(value_dtype).name}.npz")
        plans = ac.load_spmv3_meta(pp) if os.path.exists(pp) else None
        if plans is None:       # absent OR stale format version
            from graphtap_tpu.kernels.panel_engine import build_spmv3_meta
            plans = build_spmv3_meta(tiles, value_dtype=np.dtype(value_dtype))
            ac.save_spmv3_meta(plans, pp)
        log(f"[bench] plans3({ordering.value}) ready "
            f"(+{_t.perf_counter()-_ts:.0f}s)")
    return tiles, plans


def main():
    t0 = time.perf_counter()
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graphtap_tpu import Graph, GraphConfig, Compression, make_mesh
    from graphtap_tpu.apps.pagerank import PageRankProgram
    from graphtap_tpu.apps.degree import DegreeProgram
    from graphtap_tpu.config import EngineConfig, Ordering
    from graphtap_tpu.engine.executor import Executor
    from graphtap_tpu.tools.artifact_cache import cached_rmat

    os.makedirs(CACHE, exist_ok=True)
    src, dst, _ = cached_rmat(SCALE, EDGE_FACTOR, SEED, CACHE)
    n = 1 << SCALE
    log(f"[bench] edges ready E={src.size} t={time.perf_counter()-t0:.0f}s")

    mesh = make_mesh()
    cfg = GraphConfig(num_vertices=n, directed=True, transpose=True,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)

    # degree phase = ONE SpMV outside the timed loop: the v1 shuffle
    # kernel plans in seconds (counting sort), so only the PR ordering
    # pays the panel planning cost
    deg_kernel = "shuffle" if KERNEL in ("panel", "shuffle2") else KERNEL
    if SCALE >= 21 and KERNEL in ("panel", "shuffle2"):
        # the v1 shuffle plans are ~8.7 GB at RMAT-22 and the XLA
        # loop-boundary copy doubles frag_idx (7.3 GB) — the degree
        # phase alone exceeds HBM before PR starts.  One untimed SpMV
        # doesn't need plans: use the XLA scan kernel
        deg_kernel = "scan"
    tiles_col, plans_col = get_artifacts(g, Ordering.COL, deg_kernel,
                                         jnp.float32)
    tiles_row, plans_row = get_artifacts(g, Ordering.ROW, KERNEL,
                                         jnp.float32)
    log(f"[bench] artifacts ready t={time.perf_counter()-t0:.0f}s")

    t_c = time.perf_counter()
    deg_ex = Executor(g, DegreeProgram(value_dtype=jnp.float32),
                      EngineConfig(stationary=True, ordering=Ordering.COL),
                      tiles=tiles_col, kernel=deg_kernel,
                      shuffle_plans=plans_col)
    deg_ex.sync_uploads()
    upload_s = time.perf_counter() - t_c
    log(f"[bench] degree upload done ({upload_s:.1f}s) "
        f"t={time.perf_counter()-t0:.0f}s")
    deg_ex.initialize()
    deg_ex.execute(1)
    # release the degree phase's tiles + v1 plans from HBM BEFORE the
    # PR plans upload (reference: the free() between programs,
    # vertex_program.hpp:47-54) — at RMAT-22 the v1 shuffle plans are
    # ~8.7 GB and the PR panel plans ~5 GB; coexisting they OOM the
    # 16 GB chip at upload time.  free() keeps the state vectors the PR
    # initialize(other=...) needs.
    deg_ex.free()
    log(f"[bench] degree phase done t={time.perf_counter()-t0:.0f}s")

    t_c = time.perf_counter()
    pr_ex = Executor(g, PageRankProgram(value_dtype=jnp.float32),
                     EngineConfig(stationary=True, ordering=Ordering.ROW),
                     tiles=tiles_row, kernel=KERNEL,
                     shuffle_plans=plans_row)
    pr_ex.sync_uploads()
    upload_s += time.perf_counter() - t_c
    log(f"[bench] pr upload done t={time.perf_counter()-t0:.0f}s")
    pr_ex.initialize(other=deg_ex)

    nnz = pr_ex.tiles.nnz_total

    def fence(ex):
        # block_until_ready over the axon tunnel is not a reliable fence
        # (docs/KERNEL_NOTES.md): force a real data fetch of the state
        for leaf in jax.tree.leaves(ex.state):
            jax.device_get(leaf[(0,) * leaf.ndim])

    # warmup (compile) — run the full fixed-iteration loop once
    t_w = time.perf_counter()
    pr_ex.execute(ITERS)
    fence(pr_ex)
    warmup_s = time.perf_counter() - t_w
    log(f"[bench] warmup done t={time.perf_counter()-t0:.0f}s")

    # timed: re-init and run again
    pr_ex.initialize(other=deg_ex)
    fence(pr_ex)
    t1 = time.perf_counter()
    pr_ex.execute(ITERS)
    fence(pr_ex)
    dt = time.perf_counter() - t1

    gteps = nnz * ITERS / dt / 1e9
    checksum, _ = pr_ex.checksum()

    # correctness oracle at benchmark scale (reference analog: the
    # cross-format Final-value check, csc_spmv.hpp:222-228): an
    # independent f64 NumPy golden model, disk-memoized. f32 value-path
    # drift on RMAT-20 measured at ~2e-7 relative; gate at 1e-4.
    gp = os.path.join(CACHE, f"golden_rmat{SCALE}_ef{EDGE_FACTOR}"
                             f"_s{SEED}_i{ITERS}.txt")
    if os.path.exists(gp):
        golden_sum = float(open(gp).read())
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        import golden as golden_mod
        v = golden_mod.pagerank(src.astype(np.int64), dst.astype(np.int64),
                                n + 1, ITERS)
        golden_sum = float(v.sum())
        with open(gp, "w") as f:
            f.write(repr(golden_sum))
    rel = abs(checksum - golden_sum) / abs(golden_sum)
    assert rel < 1e-4, (
        f"checksum {checksum} vs golden {golden_sum} (rel {rel:.2e})")
    log(f"[bench] checksum ok: {checksum:.2f} vs golden {golden_sum:.4f} "
        f"(rel {rel:.1e})")

    print(json.dumps({
        "metric": f"pagerank_gteps_rmat{SCALE}",
        "value": round(gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / REF_CPU_GTEPS, 3),
        "detail": {
            "edges": int(nnz), "iters": ITERS, "seconds": round(dt, 4),
            "checksum": round(checksum, 2), "kernel": KERNEL,
            "devices": len(jax.devices()),
            "warmup_seconds": round(warmup_s, 1),
            "upload_seconds": round(upload_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
