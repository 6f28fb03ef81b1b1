"""Engine-level tests of the Pallas kernel paths: the same golden-oracle
apps as test_apps.py, run with kernel='shuffle' (v1) and 'shuffle2' (the
v2 windowed-gather pipeline) in interpret mode on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphtap_tpu import Graph, GraphConfig, Compression, make_mesh
from graphtap_tpu.apps.degree import DegreeProgram
from graphtap_tpu.apps.pagerank import PageRankProgram
from graphtap_tpu.apps.bfs import BFSProgram, bfs_config
from graphtap_tpu.config import EngineConfig, Ordering
from graphtap_tpu.engine.executor import Executor

import golden

NV = 1025
RMAT10 = "/root/reference/data/rmat10_1024.bin"
REF_PR_CHECKSUM = 317.0176895329694


@pytest.fixture(scope="module", params=[(1, 1), (2, 2)],
                ids=["mesh1x1", "mesh2x2"])
def mesh(request):
    r, c = request.param
    return make_mesh(jax.devices()[: r * c], shape=(r, c))


@pytest.fixture(params=["shuffle", "shuffle2"])
def kernel(request):
    return request.param


def test_pagerank_shuffle(mesh, kernel, rmat10_edges):
    src, dst = rmat10_edges
    cfg = GraphConfig(num_vertices=1024, directed=True, transpose=True,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)

    deg_ex = Executor(g, DegreeProgram(value_dtype=jnp.float64),
                      EngineConfig(stationary=True, ordering=Ordering.COL),
                      kernel=kernel)
    deg_ex.initialize()
    deg_ex.execute(1)
    deg = deg_ex.state_vector()["degree"]
    np.testing.assert_array_equal(deg.astype(np.int64),
                                  golden.degree(src, dst, NV))

    pr_ex = Executor(g, PageRankProgram(value_dtype=jnp.float64),
                     EngineConfig(stationary=True, ordering=Ordering.ROW),
                     kernel=kernel)
    pr_ex.initialize(other=deg_ex)
    pr_ex.execute(20)
    total, reachable = pr_ex.checksum()
    assert total == pytest.approx(REF_PR_CHECKSUM, rel=1e-9)
    gold = golden.pagerank(src, dst, NV, 20)
    np.testing.assert_allclose(pr_ex.state_vector()["rank"], gold,
                               rtol=1e-10, atol=1e-12)


def test_bfs_shuffle(mesh, kernel, rmat10_edges):
    src, dst = rmat10_edges
    g = Graph.from_edges(src, dst, None, bfs_config(1024), mesh=mesh)
    ex = Executor(g, BFSProgram(root=0),
                  EngineConfig(stationary=False, apply_depends_on_iter=True,
                               ordering=Ordering.ROW),
                  kernel=kernel)
    ex.initialize()
    ex.execute(0)
    sv = ex.state_vector()
    parent_g, hops_g = golden.bfs(src, dst, NV, root=0)
    np.testing.assert_array_equal(sv["hops"].astype(np.int64), hops_g)


def test_sssp_shuffle2(mesh, rmat10_w_edges):
    """Weighted min-plus through the v2 pipeline (⊗ = add_sat in the
    expand kernel's weight application)."""
    from graphtap_tpu.apps.sssp import SSSPProgram, sssp_config
    src, dst, w = rmat10_w_edges
    g = Graph.from_edges(src, dst, w, sssp_config(1024), mesh=mesh)
    ex = Executor(g, SSSPProgram(root=0),
                  EngineConfig(stationary=False, gather_depends_on_apply=True,
                               ordering=Ordering.ROW),
                  kernel="shuffle2")
    ex.initialize()
    ex.execute(0)
    sv = ex.state_vector()
    dist_g = golden.sssp(src, dst, w, NV, root=0)
    np.testing.assert_array_equal(sv["distance"].astype(np.int64), dist_g)


def test_pagerank_panel(mesh, rmat10_edges):
    """The v3 panel pipeline through the engine on the golden oracle."""
    src, dst = rmat10_edges
    cfg = GraphConfig(num_vertices=1024, directed=True, transpose=True,
                      compression=Compression.TCSC)
    g = Graph.from_edges(src, dst, None, cfg, mesh=mesh)
    deg_ex = Executor(g, DegreeProgram(value_dtype=jnp.float64),
                      EngineConfig(stationary=True, ordering=Ordering.COL),
                      kernel="panel")
    deg_ex.initialize()
    deg_ex.execute(1)
    pr_ex = Executor(g, PageRankProgram(value_dtype=jnp.float64),
                     EngineConfig(stationary=True, ordering=Ordering.ROW),
                     kernel="panel")
    pr_ex.initialize(other=deg_ex)
    pr_ex.execute(20)
    total, _ = pr_ex.checksum()
    assert total == pytest.approx(REF_PR_CHECKSUM, rel=1e-9)
