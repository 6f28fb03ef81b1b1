"""End-to-end app tests on the reference's golden rmat10 fixtures,
validated against independent NumPy golden models and the reference's
own printed oracles (BASELINE.md).

The mesh is the full 8-CPU-device simulation (2×4), so every run
exercises the real all_gather / reduce-scatter collectives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from graphtap_tpu import Graph, GraphConfig, Compression, make_mesh
from graphtap_tpu.apps import (run_pagerank, run_cc, run_bfs, run_sssp,
                               run_degree)
from graphtap_tpu.apps.cc import cc_config
from graphtap_tpu.apps.bfs import bfs_config
from graphtap_tpu.apps.sssp import sssp_config
from graphtap_tpu.kernels.semiring import INF_I32

import golden

NV = 1025  # 1024 vertices + the id-0 slot (reference: graph.hpp:84-85)
RMAT10 = "/root/reference/data/rmat10_1024.bin"
RMAT10_W = "/root/reference/data/rmat10_1024_w.bin"

# Captured from the reference single-node lab (g++-built, see BASELINE.md):
#   ./main 0 rmat10_1024.bin 1024 20 -> Final value 317.018, V[0]=0.165455 ...
REF_PR_CHECKSUM = 317.0176895329694


@pytest.fixture(scope="module", params=[(1, 1), (2, 4)],
                ids=["mesh1x1", "mesh2x4"])
def mesh(request):
    import jax
    r, c = request.param
    return make_mesh(jax.devices()[: r * c], shape=(r, c))


def test_pagerank_matches_reference(mesh, rmat10_edges):
    src, dst = rmat10_edges
    cfg = GraphConfig(num_vertices=1024, directed=True, transpose=True,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)
    ex = run_pagerank(g, num_iterations=20, value_dtype=jnp.float64)
    total, reachable = ex.checksum()
    gold = golden.pagerank(src, dst, NV, 20)
    assert total == pytest.approx(REF_PR_CHECKSUM, rel=1e-9)
    assert total == pytest.approx(gold.sum(), rel=1e-12)
    ranks = ex.state_vector()["rank"]
    np.testing.assert_allclose(ranks, gold, rtol=1e-10, atol=1e-12)


def test_degree(mesh, rmat10_edges):
    src, dst = rmat10_edges
    cfg = GraphConfig(num_vertices=1024, directed=True, transpose=False,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)
    ex = run_degree(g, value_dtype=jnp.float64)
    deg = ex.state_vector()["degree"]
    gold = golden.degree(src, dst, NV)
    np.testing.assert_array_equal(deg.astype(np.int64), gold)


def test_bfs(mesh, rmat10_edges):
    src, dst = rmat10_edges
    g = Graph.from_edges(src, dst, None, bfs_config(1024), mesh=mesh)
    ex = run_bfs(g, root=0)
    sv = ex.state_vector()
    parent_g, hops_g = golden.bfs(src, dst, NV, root=0)
    np.testing.assert_array_equal(sv["hops"].astype(np.int64), hops_g)
    reached = hops_g != golden.INF
    np.testing.assert_array_equal(sv["parent"][reached].astype(np.int64),
                                  parent_g[reached])


def test_cc(mesh, rmat10_edges):
    src, dst = rmat10_edges
    g = Graph.from_edges(src, dst, None, cc_config(1024), mesh=mesh)
    ex = run_cc(g)
    labels = ex.state_vector()["label"]
    gold = golden.cc(src, dst, NV)
    np.testing.assert_array_equal(labels.astype(np.int64), gold)


def test_sssp(mesh, rmat10_w_edges):
    src, dst, w = rmat10_w_edges
    g = Graph.from_edges(src, dst, w, sssp_config(1024), mesh=mesh)
    ex = run_sssp(g, root=0)
    dist = ex.state_vector()["distance"]
    gold = golden.sssp(src, dst, w, NV, root=0)
    np.testing.assert_array_equal(dist.astype(np.int64), gold)


def test_checksum_reachable_counts(mesh, rmat10_edges):
    src, dst = rmat10_edges
    g = Graph.from_edges(src, dst, None, bfs_config(1024), mesh=mesh)
    ex = run_bfs(g, root=0)
    total, reachable = ex.checksum()
    _, hops_g = golden.bfs(src, dst, NV, root=0)
    mask = hops_g != golden.INF
    assert reachable == int(mask.sum())
    assert total == pytest.approx(float(hops_g[mask].sum()))


@pytest.mark.parametrize("capacity", [8, 64, 100000])
def test_bfs_sparse_exchange(mesh, rmat10_edges, capacity):
    """Activity-filtered exchange (reference: scatter/gather_nonstationary,
    vertex_program.hpp:865-966): sparse/dense vote per iteration must not
    change any result. Small capacities force mid-run dense fallbacks."""
    from graphtap_tpu.apps.bfs import BFSProgram
    from graphtap_tpu.config import EngineConfig, Ordering
    from graphtap_tpu.engine.executor import Executor

    src, dst = rmat10_edges
    g = Graph.from_edges(src, dst, None, bfs_config(1024), mesh=mesh)
    ex = Executor(g, BFSProgram(root=0),
                  EngineConfig(stationary=False, apply_depends_on_iter=True,
                               ordering=Ordering.ROW,
                               sparse_exchange_capacity=capacity))
    ex.initialize()
    ex.execute(0)
    sv = ex.state_vector()
    parent_g, hops_g = golden.bfs(src, dst, NV, root=0)
    np.testing.assert_array_equal(sv["hops"].astype(np.int64), hops_g)


def test_sssp_sparse_exchange(mesh, rmat10_w_edges):
    from graphtap_tpu.apps.sssp import SSSPProgram
    from graphtap_tpu.config import EngineConfig, Ordering
    from graphtap_tpu.engine.executor import Executor

    src, dst, w = rmat10_w_edges
    g = Graph.from_edges(src, dst, w, sssp_config(1024), mesh=mesh)
    ex = Executor(g, SSSPProgram(root=0),
                  EngineConfig(stationary=False, gather_depends_on_apply=True,
                               ordering=Ordering.ROW,
                               sparse_exchange_capacity=32))
    ex.initialize()
    ex.execute(0)
    dist = ex.state_vector()["distance"]
    gold = golden.sssp(src, dst, w, NV, root=0)
    np.testing.assert_array_equal(dist.astype(np.int64), gold)


def test_panel_kernel_2x4_mesh_scale14():
    """Multi-device panel-pipeline coverage at a nontrivial scale: the v3
    plans are per-device (padded to the mesh max) and the kernels run
    under shard_map on a 2x4 CPU mesh — the tile sweep the panel kernel
    distributes (reference: combine_2d_stationary,
    vertex_program.hpp:1058-1113). Checks against the f64 golden model."""
    import jax
    import jax.numpy as jnp
    from graphtap_tpu.ingest.rmat import rmat_edges
    from graphtap_tpu.apps.degree import DegreeProgram
    from graphtap_tpu.apps.pagerank import PageRankProgram
    from graphtap_tpu.config import EngineConfig, Ordering
    from graphtap_tpu.engine.executor import Executor
    import golden

    scale, iters = 14, 5
    src, dst, _ = rmat_edges(scale=scale, edge_factor=16, seed=1)
    n = 1 << scale
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    cfg = GraphConfig(num_vertices=n, directed=True, transpose=True,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)
    deg = Executor(g, DegreeProgram(value_dtype=jnp.float32),
                   EngineConfig(stationary=True, ordering=Ordering.COL),
                   kernel="panel")
    deg.initialize()
    deg.execute(1)
    pr = Executor(g, PageRankProgram(value_dtype=jnp.float32),
                  EngineConfig(stationary=True, ordering=Ordering.ROW),
                  kernel="panel")
    pr.initialize(other=deg)
    pr.execute(iters)
    cs, reach = pr.checksum()
    v = golden.pagerank(src.astype(np.int64), dst.astype(np.int64),
                        n + 1, iters)
    assert abs(cs - float(v.sum())) / abs(float(v.sum())) < 1e-4
