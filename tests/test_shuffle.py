"""End-to-end tests of the static-shuffle SpMV pipeline (planner +
expand/group/reduce Pallas kernels) in interpreter mode against NumPy
ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphtap_tpu.kernels.shuffle_plan import (build_spmv_plan, LANES,
                                               RED_ROWS)
from graphtap_tpu.kernels.shuffle_kernels import (expand_stream,
                                                  group_stream,
                                                  grouped_reduce)

INF = 2147483647


def _random_case(rng, NR, NC, E, weighted, dtype=np.float32):
    rows = rng.integers(0, NR, E).astype(np.int64)
    cols = rng.integers(0, NC, E).astype(np.int64)
    w = rng.integers(1, 100, E).astype(dtype) if weighted else None
    x = (rng.random(NC).astype(dtype) if dtype == np.float32
         else rng.integers(0, 1000, NC).astype(dtype))
    return rows, cols, w, x


def _truth(rows, cols, w, x, NR, kind):
    contrib = x[cols] * (w if w is not None else 1)
    if kind == "sum":
        y = np.zeros(NR, dtype=np.float64)
        np.add.at(y, rows, contrib)
        return y
    y = np.full(NR, INF, dtype=np.int64)
    np.minimum.at(y, rows, contrib)
    return y


def _run_pipeline(plan, x, w, kind, identity):
    win = 64 * LANES
    Sx3 = -(-plan.NC // win)
    x3d = np.full((Sx3 * win,), identity if kind != "sum" else 0.0,
                  dtype=x.dtype)
    x3d[:plan.NC] = x
    x3d = x3d.reshape(Sx3, 64, LANES)
    contrib = expand_stream(
        jnp.asarray(x3d), jnp.asarray(plan.grp),
        jnp.asarray(plan.slot), jnp.asarray(plan.lane),
        jnp.asarray(plan.ev_x),
        jnp.asarray(plan.w_stream) if plan.w_stream is not None else None,
        identity if kind != "sum" else 0.0,
        interpret=True)
    grouped = group_stream(
        contrib, jnp.asarray(plan.frag_dst), jnp.asarray(plan.frag_idx),
        plan.rows_per_super, plan.npasses,
        rchunk=min(64, plan.rows_per_super), interpret=True)
    y = grouped_reduce(
        grouped, jnp.asarray(plan.lr), jnp.asarray(plan.ev_r),
        jnp.asarray(plan.chunk_block), plan.nblocks, kind, identity,
        rows_per_chunk=RED_ROWS, interpret=True)
    return np.asarray(y).reshape(-1)[:plan.NR]


def test_plan_simulation_consistency():
    """The simulated final layout must be a permutation (with holes) of
    the valid stream positions, grouped by row block per reduce chunk."""
    rng = np.random.default_rng(0)
    rows, cols, w, x = _random_case(rng, 1000, 2000, 5000, False)
    plan = build_spmv_plan(rows, cols, None, 1000, 2000,
                           nwin=4, rows_per_super=256)
    src = plan.final_src
    valid = src >= 0
    assert valid.sum() == 5000
    assert np.unique(src[valid]).size == 5000


@pytest.mark.parametrize("weighted", [False, True])
def test_pipeline_sum(weighted):
    rng = np.random.default_rng(1)
    NR, NC, E = 1000, 2000, 60000
    rows, cols, w, x = _random_case(rng, NR, NC, E, weighted)
    plan = build_spmv_plan(rows, cols, w, NR, NC, nwin=4,
                           rows_per_super=128)
    assert plan.nsupers >= 2  # exercise multiple supers
    y = _run_pipeline(plan, x, w, "sum", 0.0)
    t = _truth(rows, cols, w, x, NR, "sum")
    np.testing.assert_allclose(y, t.astype(np.float32), rtol=1e-4)


def test_pipeline_min():
    rng = np.random.default_rng(2)
    NR, NC, E = 600, 900, 4000
    rows = rng.integers(0, NR, E).astype(np.int64)
    cols = rng.integers(0, NC, E).astype(np.int64)
    x = rng.integers(0, 10000, NC).astype(np.int32)
    plan = build_spmv_plan(rows, cols, None, NR, NC, nwin=4,
                           rows_per_super=256, value_dtype=np.int32)
    y = _run_pipeline(plan, x, None, "min", INF)
    t = _truth(rows, cols, None, x, NR, "min")
    np.testing.assert_array_equal(y, t.astype(np.int32))


def test_hub_columns_and_empty_rows():
    """Power-law-ish case: one hub column with many edges, many empty
    rows, plus empty blocks."""
    rng = np.random.default_rng(3)
    NR, NC = 2000, 500
    rows = np.concatenate([rng.integers(0, 50, 3000),
                           rng.integers(1900, 2000, 500)]).astype(np.int64)
    cols = np.concatenate([np.full(3000, 7), rng.integers(0, NC, 500)]
                          ).astype(np.int64)
    x = rng.random(NC).astype(np.float32)
    plan = build_spmv_plan(rows, cols, None, NR, NC, nwin=4,
                           rows_per_super=256)
    y = _run_pipeline(plan, x, None, "sum", 0.0)
    t = _truth(rows, cols, None, x, NR, "sum")
    np.testing.assert_allclose(y, t.astype(np.float32), rtol=1e-4)
