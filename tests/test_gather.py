"""v2 windowed-gather pipeline: planner simulation + kernel correctness.

Mirrors the reference's format cross-check strategy (same input through
every kernel variant must agree — singlenode/main.cpp:34-59): the v2
pipeline is validated against numpy simulation and a dense ground truth.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphtap_tpu.kernels.gather_plan import (build_gather_plan,
                                              build_spmv2_plan,
                                              simulate_gather,
                                              LANES, SUB, STEP_EL)
from graphtap_tpu.kernels.gather_kernels import windowed_gather
from graphtap_tpu.kernels import semiring as sr


def _run_gather(plan, src2d, fill, weights=None, mul_kind="none"):
    return np.asarray(windowed_gather(
        jnp.asarray(src2d), jnp.asarray(plan.wsel), jnp.asarray(plan.base),
        jnp.asarray(plan.nact), jnp.asarray(plan.cidx),
        jnp.asarray(plan.meta),
        jnp.asarray(weights) if weights is not None else None,
        fill, plan.out_rows, plan.nsub, mul_kind=mul_kind, interpret=True))


def test_gather_plan_identity():
    n = 4 * STEP_EL
    src_of = np.arange(n, dtype=np.int64)
    plan = build_gather_plan(4 * SUB, 4 * SUB, src_of)
    src = np.random.default_rng(0).random((4 * SUB, LANES)).astype(np.float32)
    out = _run_gather(plan, src, 0.0)
    np.testing.assert_array_equal(out, src)


def test_gather_plan_random_permutation():
    rng = np.random.default_rng(1)
    rows = 8 * SUB
    n = rows * LANES
    src_of = rng.permutation(n).astype(np.int64)
    src_of[rng.random(n) < 0.1] = -1           # holes
    plan = build_gather_plan(rows, rows, src_of)
    src = rng.random((rows, LANES)).astype(np.float32)
    out = _run_gather(plan, src, -1.0)
    np.testing.assert_array_equal(out, simulate_gather(plan, src, -1.0))


def test_gather_plan_duplicates_and_conflicts():
    """Hub pattern: many outputs read few source slots (duplication), and
    same-lane outputs read the same source row at different lanes
    (conflict layers)."""
    rng = np.random.default_rng(2)
    rows = 4 * SUB
    n = rows * LANES
    src_of = rng.integers(0, 2 * LANES, size=n)   # all from 2 source rows
    plan = build_gather_plan(SUB, rows, src_of)
    assert plan.nsub >= 2                          # layered subops exist
    src = rng.random((SUB, LANES)).astype(np.float32)
    out = _run_gather(plan, src, 0.0)
    np.testing.assert_array_equal(out, simulate_gather(plan, src, 0.0))


def test_gather_plan_int32():
    rng = np.random.default_rng(3)
    rows = 2 * SUB
    n = rows * LANES
    src_of = rng.integers(-1, n, size=n)
    plan = build_gather_plan(rows, rows, src_of)
    src = rng.integers(0, 1 << 30, size=(rows, LANES)).astype(np.int32)
    out = _run_gather(plan, src, sr.INF_I32)
    np.testing.assert_array_equal(
        out, simulate_gather(plan, src, sr.INF_I32))


def _rand_graph(rng, nr, nc, e, weighted=False):
    r = rng.integers(0, nr, size=e).astype(np.int64)
    c = rng.integers(0, nc, size=e).astype(np.int64)
    w = rng.integers(1, 100, size=e).astype(np.int32) if weighted else None
    return r, c, w


def _dense_y(r, c, w, x, nr, semiring):
    y = np.full(nr, semiring.identity,
                dtype=np.float64 if x.dtype.kind == "f" else np.int64)
    for i in range(r.size):
        v = x[c[i]]
        if w is not None:
            if semiring.reduce_kind == "sum":
                v = v * w[i]
            else:
                v = v + w[i] if v < sr.INF_I32 else sr.INF_I32
        if semiring.reduce_kind == "sum":
            y[r[i]] += v
        elif semiring.reduce_kind == "min":
            y[r[i]] = min(y[r[i]], v)
    return y


@pytest.mark.parametrize("weighted,kind", [(False, "sum"), (True, "sum"),
                                           (False, "min"), (True, "min")])
def test_spmv2_plan_end_to_end(weighted, kind):
    """Full pipeline vs dense ground truth on a random graph (compact rows
    = identity renumbering here; iv_dense exercised separately)."""
    rng = np.random.default_rng(4)
    NR, NC, E = 1024, 2048, 20000
    r, c, w = _rand_graph(rng, NR, NC, E, weighted)
    if kind == "sum":
        semiring = sr.plus_times()
        x = rng.random(NC).astype(np.float32)
        dtype = np.float32
    else:
        semiring = sr.min_plus() if weighted else sr.min_select()
        x = rng.integers(0, 1000, size=NC).astype(np.int32)
        dtype = np.int32
    plan = build_spmv2_plan(r, c, w, NR, NC, dense_len=NR, iv_dense=None,
                            value_dtype=dtype)
    assert plan.pad_factor < 4.0

    # simulate: expand
    fill = np.asarray(semiring.identity, dtype)
    sx = plan.expand.src_rows
    x2d = np.full((sx, LANES), fill, dtype)
    x2d.reshape(-1)[:NC] = x
    buf = simulate_gather(plan.expand, x2d, fill)
    if weighted:
        ws = plan.w_stream.reshape(-1, LANES)
        valid = (plan.expand.src_of >= 0).reshape(-1, LANES)
        if kind == "sum":
            buf = np.where(valid, buf * ws, fill)
        else:
            buf = np.where(valid & (buf < sr.INF_I32), buf + ws, fill)
    for p, gp in enumerate(plan.passes):
        buf = simulate_gather(gp, buf, fill)
    # fold
    flat = buf.reshape(-1)
    ev = plan.ev_r.reshape(-1).astype(bool)
    rows_dst = (np.repeat(plan.chunk_block.astype(np.int64), STEP_EL) * LANES
                + plan.lr.reshape(-1).astype(np.int64))
    y = np.full(plan.nblocks * LANES, fill, np.float64 if kind == "sum"
                else np.int64)
    if kind == "sum":
        np.add.at(y, rows_dst[ev], flat[ev])
    else:
        np.minimum.at(y, rows_dst[ev], flat[ev])
    expect = _dense_y(r, c, w, x, NR, semiring)
    np.testing.assert_allclose(y[:NR], expect, rtol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_spmv2_local_vs_dense(kind):
    """spmv2_local (interpret) through the engine bridge vs ground truth,
    with TCSC renumbering via a TileSet."""
    from graphtap_tpu.parallel.layout import Partition
    from graphtap_tpu.format.tiles import build_tileset
    from graphtap_tpu.config import Compression
    from graphtap_tpu.kernels.gather_engine import (build_spmv2_meta,
                                                    spmv2_local)
    rng = np.random.default_rng(5)
    part = Partition(nv=1500, R=1, C=1, L=2048)
    E = 30000
    r = rng.integers(0, 1500, size=E)
    c = rng.integers(0, 1500, size=E)
    weighted = kind == "min"
    w = rng.integers(1, 50, size=E).astype(np.int32) if weighted else None
    ts = build_tileset(r, c, w, part, compression=Compression.TCSC,
                       weight_dtype=np.int32)
    dtype = np.float32 if kind == "sum" else np.int32
    meta = build_spmv2_meta(ts, value_dtype=dtype)
    t = {k: jnp.asarray(v[0]) for k, v in meta.arrays.items()}
    semiring = sr.plus_times() if kind == "sum" else sr.min_plus()
    if kind == "sum":
        x = rng.random(part.tile_cols).astype(np.float32)
    else:
        x = rng.integers(0, 1000, size=part.tile_cols).astype(np.int32)
    y = np.asarray(spmv2_local(jnp.asarray(x), t, meta, semiring,
                               dense_len=part.tile_rows, interpret=True))
    # dedup the way build_tileset does (parallel_edges=True keeps all)
    expect = _dense_y(r.astype(np.int64), c.astype(np.int64), w, x,
                      part.tile_rows, semiring)
    np.testing.assert_allclose(y, expect, rtol=1e-4)


def test_windowed_gather_segmented(monkeypatch):
    """Multi-segment driver: segments write disjoint row ranges of one
    aliased output buffer (offset out_specs) — force SEG_STEPS tiny so
    the 3-segment path runs at test scale."""
    from graphtap_tpu.kernels import gather_kernels as gk
    monkeypatch.setattr(gk, "SEG_STEPS", 4)
    rng = np.random.default_rng(7)
    rows = 12 * SUB                      # 12 steps -> 3 segments of 4
    n = rows * LANES
    src_of = rng.permutation(n).astype(np.int64)
    src_of[rng.random(n) < 0.2] = -1
    plan = build_gather_plan(rows, rows, src_of)
    src = rng.random((rows, LANES)).astype(np.float32)
    out = _run_gather(plan, src, -5.0)
    np.testing.assert_array_equal(out, simulate_gather(plan, src, -5.0))
