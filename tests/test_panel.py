"""v3 panel pipeline: planner + simulator correctness vs dense SpMV."""
import numpy as np
import pytest

from graphtap_tpu.kernels.panel_plan import (build_spmv3_plan,
                                             simulate_spmv3,
                                             simulate_route, _route_panels,
                                             LANES, PROWS, PSLOTS)
from graphtap_tpu.kernels import semiring as sr


def test_route_panels_random_permutation():
    """Expand-style route: free lane/row within the target stripe, ~94%
    real load + fill phantoms (like the planner's quota holes)."""
    rng = np.random.default_rng(0)
    npanels, srows = 3, 32
    sr_ = rng.integers(0, srows - 1, size=(npanels, PSLOTS))
    sc_ = rng.integers(0, 112, size=(npanels, PSLOTS))
    holes = rng.random((npanels, PSLOTS)) < 0.12
    sr_[holes] = srows - 1                       # fill row
    src = sr_ * LANES + sc_
    stripe = np.tile(np.arange(PSLOTS) // 1024, (npanels, 1))
    panel_of = np.repeat(np.arange(npanels), PSLOTS)
    plan, rows, lanes = _route_panels(
        src.reshape(-1) // LANES, src.reshape(-1) % LANES,
        stripe.reshape(-1), None, panel_of, npanels, srows,
        fill_from=srows - 1)
    v = rng.random((npanels * srows, LANES)).astype(np.float32)
    v.reshape(npanels, srows, LANES)[:, srows - 1, :] = 0.0  # fill row
    out = simulate_route(plan, v, npanels)
    got = out.reshape(npanels, 64, LANES)[panel_of, rows, lanes]
    expect = v.reshape(npanels, -1)[panel_of, src.reshape(-1)]
    real = ~holes.reshape(-1)
    np.testing.assert_array_equal(got[real], expect[real])
    assert rows.reshape(npanels, PSLOTS)[0][0] // 8 == stripe[0][0]
    np.testing.assert_array_equal(rows // 8, stripe.reshape(-1))


def test_route_panels_fixed_lane():
    """Pass-A-style route: fixed final lane, free row in stripe, with
    fill phantoms reading the reserved fill window."""
    rng = np.random.default_rng(1)
    npanels, srows = 2, 96
    fill0 = 88
    sr_ = rng.integers(0, fill0, size=(npanels, PSLOTS))
    sc_ = rng.integers(0, LANES, size=(npanels, PSLOTS))
    holes = rng.random((npanels, PSLOTS)) < 0.12
    sr_[holes] = fill0
    src = sr_ * LANES + sc_
    stripe = np.tile(np.arange(PSLOTS) // 1024, (npanels, 1))
    lane = np.tile(np.arange(PSLOTS) % LANES, (npanels, 1))
    panel_of = np.repeat(np.arange(npanels), PSLOTS)
    plan, rows, lanes = _route_panels(
        src.reshape(-1) // LANES, src.reshape(-1) % LANES,
        stripe.reshape(-1), lane.reshape(-1), panel_of, npanels, srows,
        fill_from=fill0)
    v = rng.random((npanels * srows, LANES)).astype(np.float32)
    v.reshape(npanels, srows, LANES)[:, fill0:, :] = 0.0
    out = simulate_route(plan, v, npanels)
    got = out.reshape(npanels, 64, LANES)[panel_of, rows, lanes]
    expect = v.reshape(npanels, -1)[panel_of, src.reshape(-1)]
    real = ~holes.reshape(-1)
    np.testing.assert_array_equal(got[real], expect[real])
    np.testing.assert_array_equal(lanes, lane.reshape(-1))


def _dense_y(r, c, w, x, nr, kind):
    y = np.full(nr, 0.0 if kind == "sum" else sr.INF_I32,
                dtype=np.float64 if kind == "sum" else np.int64)
    for i in range(r.size):
        v = x[c[i]]
        if w is not None:
            v = v * w[i] if kind == "sum" else (
                v + w[i] if v < sr.INF_I32 else sr.INF_I32)
        y[r[i]] = y[r[i]] + v if kind == "sum" else min(y[r[i]], v)
    return y


@pytest.mark.parametrize("kind,weighted", [("sum", False), ("sum", True),
                                           ("min", True)])
def test_spmv3_vs_dense(kind, weighted):
    rng = np.random.default_rng(2)
    NR, NC, E = 2048, 4096, 60000
    r = rng.integers(0, NR, size=E).astype(np.int64)
    c = rng.integers(0, NC, size=E).astype(np.int64)
    # power-law-ish hub columns and rows
    hub = rng.random(E) < 0.3
    c[hub] = rng.integers(0, 32, size=int(hub.sum()))
    r[hub] = rng.integers(0, 16, size=int(hub.sum()))
    w = rng.integers(1, 60, size=E).astype(np.int32) if weighted else None
    dtype = np.float32 if kind == "sum" else np.int32
    if kind == "sum":
        x = rng.random(NC).astype(np.float32)
        fill, mk = np.float32(0), ("mul" if weighted else "none")
    else:
        x = rng.integers(0, 500, size=NC).astype(np.int32)
        fill, mk = np.int32(sr.INF_I32), "add_sat"
    plan = build_spmv3_plan(r, c, w, NR, NC, dense_len=NR, iv_dense=None,
                            value_dtype=dtype)
    assert plan.pad_factor < 2.0
    y = simulate_spmv3(plan, x, fill, reduce_kind=kind, mul_kind=mk)
    expect = _dense_y(r, c, w, x, NR, kind)
    if kind == "sum":
        np.testing.assert_allclose(y[:NR], expect, rtol=1e-4)
    else:
        np.testing.assert_array_equal(y[:NR], expect)


@pytest.mark.parametrize("kind", ["sum", "min"])
def test_panel_kernels_match_simulator(kind):
    """The three Pallas kernels (interpret mode) against the planner's
    numpy simulator, end to end."""
    import jax.numpy as jnp
    from graphtap_tpu.kernels.panel_plan import (simulate_spmv3, STRIPE,
                                                 XROWS)
    from graphtap_tpu.kernels.panel_kernels import (route_expand,
                                                    route_passa,
                                                    fold_stripes,
                                                    colsum_chunks,
                                                    pack_route_plan)

    def pack(rt, npanels, out_rows=64, two_layer=True):
        return jnp.asarray(pack_route_plan(
            rt.idx1, rt.sel_a, rt.sel_b, rt.idx3, npanels, rt.src_rows,
            out_rows=out_rows, two_layer=two_layer))
    from graphtap_tpu.kernels.gather_plan import simulate_gather
    rng = np.random.default_rng(7)
    NR, NC, E = 1024, 2048, 30000
    r = rng.integers(0, NR, size=E).astype(np.int64)
    c = rng.integers(0, NC, size=E).astype(np.int64)
    w = rng.integers(1, 50, size=E).astype(np.int32) if kind == "min" \
        else None
    dtype = np.float32 if kind == "sum" else np.int32
    fill = np.float32(0) if kind == "sum" else np.int32(sr.INF_I32)
    mk = "none" if kind == "sum" else "add_sat"
    plan = build_spmv3_plan(r, c, w, NR, NC, dense_len=NR, iv_dense=None,
                            value_dtype=dtype)
    if kind == "sum":
        x = rng.random(NC).astype(np.float32)
    else:
        x = rng.integers(0, 500, size=NC).astype(np.int32)
    # simulator reference
    y_ref = simulate_spmv3(plan, x, fill, reduce_kind=kind, mul_kind=mk)

    # kernel pipeline (interpret)
    from graphtap_tpu.kernels.panel_plan import NWIN_X
    sx = plan.sx_rows
    x2d = np.full((sx, LANES), fill, dtype)
    x2d.reshape(-1)[:NC] = x
    x_ext = route_passa(jnp.asarray(x2d), jnp.asarray(plan.xr_bases),
                        pack(plan.xr_route, plan.exp_panels,
                             out_rows=XROWS, two_layer=False),
                        fill, plan.exp_panels, NWIN_X, interpret=True,
                        out_rows=XROWS, two_layer=False)
    w_stream = (jnp.asarray(plan.w_stream) if plan.w_stream is not None
                else None)
    s0 = route_expand(jnp.asarray(x_ext),
                      pack(plan.exp_route, plan.exp_panels),
                      w_stream, fill, plan.exp_panels, mul_kind=mk,
                      interpret=True)
    # the fused xr+exp kernel must produce the identical s0 stream
    from graphtap_tpu.kernels.panel_kernels import route_xr_exp
    xe_plan = np.concatenate(
        [np.asarray(pack(plan.xr_route, plan.exp_panels, out_rows=XROWS,
                         two_layer=False)).reshape(plan.exp_panels, -1,
                                                   LANES),
         np.asarray(pack(plan.exp_route, plan.exp_panels)).reshape(
             plan.exp_panels, -1, LANES)], axis=1).reshape(-1, LANES)
    s0_fused = route_xr_exp(jnp.asarray(x2d), jnp.asarray(plan.xr_bases),
                            jnp.asarray(xe_plan), w_stream, fill,
                            plan.exp_panels, NWIN_X, mul_kind=mk,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(s0_fused), np.asarray(s0))
    s0p = jnp.concatenate(
        [s0, jnp.full((STRIPE, LANES), fill, s0.dtype)], axis=0)
    s1 = route_passa(s0p, jnp.asarray(plan.pa_bases),
                     pack(plan.pa_route, plan.pa_panels),
                     fill, plan.pa_panels, plan.pa_nwin, interpret=True)
    nrb = int(plan.fix_dst.max()) + 1 if plan.fix_dst.size else 1
    s1f = jnp.concatenate(
        [s1, jnp.full((STRIPE, LANES), fill, s1.dtype)], axis=0)
    stack1 = route_passa(s1f, jnp.asarray(plan.fixr_bases),
                         pack(plan.fixr_route, plan.fix_panels),
                         fill, plan.fix_panels, plan.fixr_nwin,
                         interpret=True)
    y_mid = colsum_chunks(jnp.asarray(stack1), jnp.asarray(plan.fix_dst),
                          -(-nrb // STRIPE) * STRIPE, kind, fill,
                          interpret=True)
    hm = np.zeros(y_mid.shape[0], dtype=np.uint8)
    hm[:min(plan.hub_mask.size, y_mid.shape[0])] = \
        plan.hub_mask[:y_mid.shape[0]]
    hmj = jnp.asarray(hm.astype(np.int32))
    for W in (32, 64, 128):
        f = (jnp.sum(y_mid.reshape(-1, 128 // W, W), axis=2)
             if kind == "sum"
             else jnp.min(y_mid.reshape(-1, 128 // W, W), axis=2))
        f = jnp.repeat(f, W, axis=1)
        y_mid = jnp.where((hmj == W)[:, None], f, y_mid)
    from graphtap_tpu.kernels.panel_kernels import route_fold
    ym8 = np.full((-(-np.asarray(y_mid).shape[0] // STRIPE) * STRIPE,
                   LANES), fill, dtype)
    ym8[:np.asarray(y_mid).shape[0]] = np.asarray(y_mid)
    dstv = np.zeros(plan.f2_panels * STRIPE, np.int32)
    dstv[:plan.fix2_dst.size] = plan.fix2_dst
    y = route_fold(jnp.asarray(ym8), jnp.asarray(plan.f2_bases),
                   pack(plan.f2_route, plan.f2_panels),
                   jnp.asarray(dstv), plan.dense_rows, kind, fill,
                   plan.f2_panels, plan.f2_nwin, interpret=True)
    np.testing.assert_allclose(np.asarray(y).reshape(-1), y_ref,
                               rtol=1e-5)


def test_spmv3_hub_heavy_rmat_load():
    """Regression for the round-3 RMAT-20 failure: a skewed RMAT-style
    load whose landing-layer conflicts defeat the strictly-fixed-lane
    x->x_ext solver — the relax_lane repair tier must absorb the
    stragglers and the plan must stay correct end to end (reference hot
    loop this plans: vertex_program.hpp:1116-1327)."""
    from graphtap_tpu.ingest.rmat import rmat_edges
    from graphtap_tpu.kernels import panel_plan

    r, c, _ = rmat_edges(scale=14, edge_factor=16, seed=1)
    # compact-row renumber like the TCSC tileset (ROW-ordering analog)
    nr_ids, r2 = np.unique(r, return_inverse=True)
    NR = -(-nr_ids.size // 128) * 128
    NC = 1 << 14
    o = np.argsort(c, kind="stable")
    r2, c2 = r2[o], c[o].astype(np.int64)
    before = panel_plan.RELAXED_SLOTS
    plan = build_spmv3_plan(r2, c2, None, NR, NC, dense_len=NR,
                            iv_dense=None, value_dtype=np.float32)
    rng = np.random.default_rng(3)
    x = rng.random(NC).astype(np.float32)
    y = simulate_spmv3(plan, x, np.float32(0), reduce_kind="sum")
    expect = np.zeros(NR, dtype=np.float64)
    np.add.at(expect, r2, x[c2].astype(np.float64))
    np.testing.assert_allclose(y[:NR], expect, rtol=1e-4)
    # document whether the hub load actually exercised the repair tier
    print(f"relaxed slots: {panel_plan.RELAXED_SLOTS - before}")


def test_route_panels_relax_lane_overload():
    """Fixed-lane route with 9 slots demanding the same (stripe, lane) —
    strictly infeasible (a stripe has 8 rows), so the old solver raised
    'unplaceable slot after repair'.  With relax_lane the overflow slot
    must land at another lane and the route must stay value-correct."""
    from graphtap_tpu.kernels.panel_plan import RouteInfeasible
    srows = 16
    n = 9
    src_r = np.arange(n) % (srows - 1)
    src_c = np.arange(n).astype(np.int64)
    stripe = np.zeros(n, dtype=np.int64)
    lane = np.zeros(n, dtype=np.int64)            # all demand lane 0
    panel_of = np.zeros(n, dtype=np.int64)
    with pytest.raises(RouteInfeasible):
        _route_panels(src_r, src_c, stripe, lane, panel_of, 1, srows)
    plan, rows, lanes = _route_panels(
        src_r, src_c, stripe, lane, panel_of, 1, srows, relax_lane=True)
    assert np.sum(lanes != 0) >= 1                # someone got relaxed
    assert np.unique(rows * LANES + lanes).size == n   # distinct cells
    rng = np.random.default_rng(5)
    v = rng.random((srows, LANES)).astype(np.float32)
    out = simulate_route(plan, v, 1)
    got = out[rows, lanes]
    np.testing.assert_array_equal(got, v[src_r, src_c])


def test_route_fold_multi_segment(monkeypatch):
    """The segmented route_fold (y table > FOLD_SEG_ROWS streams one
    VMEM segment at a time via the prefetched per-panel segment id):
    shrink FOLD_SEG_ROWS so a small graph spans several segments, run
    the full panel pipeline in interpret mode, compare to a dense SpMV."""
    import jax.numpy as jnp
    from graphtap_tpu.kernels import panel_plan, panel_kernels, panel_engine
    from graphtap_tpu.kernels.panel_engine import (build_spmv3_meta,
                                                   spmv3_local)
    from graphtap_tpu.kernels.semiring import plus_times
    from graphtap_tpu.format.tiles import build_tileset
    from graphtap_tpu.parallel.layout import Partition
    from graphtap_tpu.config import Compression

    monkeypatch.setattr(panel_plan, "FOLD_SEG_ROWS", 64)
    monkeypatch.setattr(panel_kernels, "FOLD_SEG_ROWS", 64)
    monkeypatch.setattr(panel_engine, "FOLD_SEG_ROWS", 64)

    rng = np.random.default_rng(9)
    n = 4096
    E = 40000
    r = rng.integers(0, n, size=E).astype(np.int64)
    c = rng.integers(0, n, size=E).astype(np.int64)
    part = Partition.build(nv=n, R=1, C=1, segment_align=1024)
    ts = build_tileset(r, c, None, part, compression=Compression.TCSC)
    meta = build_spmv3_meta(ts, value_dtype=np.float32)
    assert meta.nrb > 64, "test must span several fold segments"
    assert meta.nrb % 64 == 0
    segs = meta.arrays["fixr_seg"][0]
    assert segs.max() > 0, "expected a multi-segment fixr plan"
    assert (np.diff(segs) >= 0).all()

    t = {k: jnp.asarray(v[0]) for k, v in meta.arrays.items()}
    x = rng.random(part.tile_cols).astype(np.float32)
    y = spmv3_local(jnp.asarray(x), t, meta, plus_times(),
                    dense_len=part.tile_rows, interpret=True)
    expect = np.zeros(part.tile_rows, dtype=np.float64)
    np.add.at(expect, r, x[c].astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4)


def test_route_panels_max_row_excludes_fill_row():
    """Regression for the round-3 mass-loss bug (scales >= 17): the
    fixed-lane solver's row freedom could land real x_ext slots in the
    expand route's fill row (XROWS-1); ``max_row`` must keep every real
    placement below it while staying feasible and value-correct."""
    rng = np.random.default_rng(11)
    srows = 16
    n = 7 * LANES           # heavy load on one stripe: rows fill deep
    src_r = rng.integers(0, srows, size=n)
    src_c = rng.integers(0, LANES, size=n)
    stripe = np.full(n, 3, dtype=np.int64)       # rows 24..31
    lane = np.tile(np.arange(LANES), 7)
    panel_of = np.zeros(n, dtype=np.int64)
    # without the cap the solver uses row 31 for some slots
    _, rows_nc, _ = _route_panels(src_r, src_c, stripe, lane, panel_of,
                                  1, srows, relax_lane=True)
    assert rows_nc.max() == 31
    plan, rows, lanes = _route_panels(src_r, src_c, stripe, lane,
                                      panel_of, 1, srows,
                                      relax_lane=True, max_row=31)
    assert rows.max() < 31 and rows.min() >= 24
    v = rng.random((srows, LANES)).astype(np.float32)
    out = simulate_route(plan, v, 1)
    np.testing.assert_array_equal(out[rows, lanes], v[src_r, src_c])


def test_spmv3_frontier_gating_exact():
    """Gated execution (frontier activity bits redirecting plan/window
    fetches to the fill blocks) must be bit-identical to the ungated
    pipeline when inactive x entries hold the ⊕-identity — the panel
    analog of the reference's xi-indexed work skipping
    (vertex_program.hpp:1438-1506)."""
    import jax.numpy as jnp
    from graphtap_tpu.kernels.panel_engine import (build_spmv3_meta,
                                                   spmv3_local)
    from graphtap_tpu.kernels.semiring import min_plus
    from graphtap_tpu.format.tiles import build_tileset
    from graphtap_tpu.parallel.layout import Partition
    from graphtap_tpu.config import Compression

    rng = np.random.default_rng(21)
    n, E = 4096, 50000
    r = rng.integers(0, n, size=E).astype(np.int64)
    c = rng.integers(0, n, size=E).astype(np.int64)
    w = rng.integers(1, 60, size=E).astype(np.int32)
    part = Partition.build(nv=n, R=1, C=1, segment_align=1024)
    ts = build_tileset(r, c, w, part, compression=Compression.TCSC)
    meta = build_spmv3_meta(ts, value_dtype=np.int32)
    t = {k: jnp.asarray(v[0]) for k, v in meta.arrays.items()}
    sem = min_plus()
    INF = np.int32(sem.identity)
    # a sparse frontier: ~2% of columns active, the rest at identity
    x = np.full(part.tile_cols, INF, np.int32)
    act = rng.random(part.tile_cols) < 0.02
    x[act] = rng.integers(0, 1000, size=int(act.sum())).astype(np.int32)
    y_ungated = np.asarray(spmv3_local(
        jnp.asarray(x), t, meta, sem, dense_len=part.tile_rows,
        interpret=True, gate=False))
    y_gated = np.asarray(spmv3_local(
        jnp.asarray(x), t, meta, sem, dense_len=part.tile_rows,
        interpret=True, gate=True))
    np.testing.assert_array_equal(y_gated, y_ungated)
    # auto dispatch (the engine default): a 2%-active frontier votes the
    # gated branch, a dense x the static branch — both bit-identical
    y_auto = np.asarray(spmv3_local(
        jnp.asarray(x), t, meta, sem, dense_len=part.tile_rows,
        interpret=True, gate="auto"))
    np.testing.assert_array_equal(y_auto, y_ungated)
    xd = rng.integers(0, 1000, size=part.tile_cols).astype(np.int32)
    yd_auto = np.asarray(spmv3_local(
        jnp.asarray(xd), t, meta, sem, dense_len=part.tile_rows,
        interpret=True, gate="auto"))
    yd_static = np.asarray(spmv3_local(
        jnp.asarray(xd), t, meta, sem, dense_len=part.tile_rows,
        interpret=True, gate=False))
    np.testing.assert_array_equal(yd_auto, yd_static)
    # and both match the dense oracle
    expect = np.full(part.tile_rows, np.int64(INF))
    contrib = x[c].astype(np.int64) + w
    contrib = np.where(x[c] == INF, np.int64(INF), contrib)
    np.minimum.at(expect, r, np.minimum(contrib, np.int64(INF)))
    np.testing.assert_array_equal(y_ungated, expect.astype(np.int32))


def test_spmv3_frontier_gating_empty_frontier():
    """An all-identity x (converged frontier) must produce an
    all-identity y through the gated path."""
    import jax.numpy as jnp
    from graphtap_tpu.kernels.panel_engine import (build_spmv3_meta,
                                                   spmv3_local)
    from graphtap_tpu.kernels.semiring import min_plus
    from graphtap_tpu.format.tiles import build_tileset
    from graphtap_tpu.parallel.layout import Partition
    from graphtap_tpu.config import Compression

    rng = np.random.default_rng(5)
    n, E = 2048, 20000
    r = rng.integers(0, n, size=E).astype(np.int64)
    c = rng.integers(0, n, size=E).astype(np.int64)
    part = Partition.build(nv=n, R=1, C=1, segment_align=1024)
    ts = build_tileset(r, c, None, part, compression=Compression.TCSC)
    meta = build_spmv3_meta(ts, value_dtype=np.int32)
    t = {k: jnp.asarray(v[0]) for k, v in meta.arrays.items()}
    sem = min_plus()
    INF = np.int32(sem.identity)
    x = np.full(part.tile_cols, INF, np.int32)
    y = np.asarray(spmv3_local(jnp.asarray(x), t, meta, sem,
                               dense_len=part.tile_rows, interpret=True,
                               gate=True))
    assert (y == INF).all()
