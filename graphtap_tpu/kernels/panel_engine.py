"""Device-stacked v3 panel-pipeline plans and the shard_map-local SpMV.

Bridges the v3 planner (panel_plan.py) and kernels (panel_kernels.py)
into the engine, mirroring gather_engine.py: one Spmv3Plan per device,
shapes normalized across the mesh (idle pad panels fold into a scratch
y row), arrays stacked with a leading device axis.

Pipeline per device:
  x → route x_ext → route_expand (⊗w) → route_passa (corner turn)
  → route_fold (fixup, segmented y_mid) → hub_fold → route_fold (fix2,
  straight into the dense y layout — the planner maps destinations
  through the TCSC renumbering's inverse, so no expansion gather).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from graphtap_tpu.format.tiles import TileSet
from graphtap_tpu.kernels.semiring import Semiring
from graphtap_tpu.kernels.panel_plan import (Spmv3Plan, build_spmv3_plan,
                                             RoutePlan, LANES, PROWS,
                                             STRIPE, XROWS, FOLD_SEG_ROWS)
from graphtap_tpu.kernels.panel_kernels import (route_passa, route_fold,
                                                route_xr_exp, hub_fold,
                                                pack_route_plan)


@dataclass
class Spmv3Meta:
    """Static meta + device-stacked plan arrays (dict of (D, ...) numpy)."""
    NC: int
    nblocks: int            # compact y rows + 8 scratch (diagnostic only)
    dense_rows: int
    f2_rows: int            # fix2 fold table rows (dense + scratch,
                            # rounded to whole FOLD_SEG_ROWS segments)
    exp_panels: int
    pa_panels: int
    pa_nwin: int
    fix_panels: int         # fix-route panels (8 chunks each)
    fixr_nwin: int
    fix2_chunks: int        # f2_panels * 8 (fix2_dst length)
    f2_panels: int
    f2_nwin: int
    nrb: int                # y_mid rows (padded to 8, + 8 scratch)
    xext_rows: int
    xr_nwin: int            # x->x_ext route window operands per panel
    sx_rows: int            # padded x table rows
    has_w: bool
    arrays: Dict[str, np.ndarray]

    def device_arrays(self, mesh):
        from graphtap_tpu.parallel.multihost import put_device_stacked
        return {k: put_device_stacked(a, mesh)
                for k, a in self.arrays.items()}


def _pad_route_nwin(rt: RoutePlan, npanels: int, old_nwin: int,
                    new_nwin: int) -> RoutePlan:
    """Extend a fix-route's per-panel window count: append zero idx1 rows
    for the extra (unreferenced) window bands."""
    if old_nwin == new_nwin:
        return rt
    sr_old = old_nwin * STRIPE
    sr_new = new_nwin * STRIPE
    idx1 = rt.idx1.reshape(npanels, sr_old, LANES)
    idx1 = np.concatenate(
        [idx1, np.zeros((npanels, sr_new - sr_old, LANES), np.int8)],
        axis=1)
    return RoutePlan(idx1=idx1.reshape(-1, LANES), sel_a=rt.sel_a,
                     sel_b=rt.sel_b, idx3=rt.idx3, src_rows=sr_new)


def _append_fill_panel(rt: RoutePlan, out_rows: int = PROWS) -> RoutePlan:
    """Append ONE panel whose output is pure ⊕-identity: its sel bands are
    31 (never matched — nsrc_bands < 31 always holds here), so the stage-2
    landing layers keep their fill initialization.  Producing the fill
    stripe inside the route kernel replaces the jnp.concatenate append in
    spmv3_local, which copied the whole 100+ MB stream every iteration
    just to add one 4 KB stripe."""
    return RoutePlan(
        idx1=np.concatenate(
            [rt.idx1, np.zeros((rt.src_rows, LANES), np.int8)]),
        sel_a=np.concatenate(
            [rt.sel_a, np.full((out_rows, LANES), 0xF8, np.uint8)]),
        sel_b=np.concatenate(
            [rt.sel_b, np.full((out_rows, LANES), 0xF8, np.uint8)]),
        idx3=np.concatenate(
            [rt.idx3, np.zeros((out_rows, LANES), np.uint8)]),
        src_rows=rt.src_rows)


def _match_window_slots(bases: np.ndarray, rt: RoutePlan, nwin: int,
                        out_rows: int = PROWS):
    """Permute each panel's window->operand-slot assignment so windows
    shared with the PREVIOUS panel keep their slot: the kernel's
    revolving input buffers then skip the re-fetch (measured: pass-A
    windows were 92% distinct fetches under the anchored slot order even
    though consecutive panels' window SETS overlap heavily).  Rewrites
    bases slot order, idx1 band rows and the sel band bits."""
    npan = bases.size // nwin
    b2 = bases.reshape(npan, nwin).copy()
    sr = nwin * 8
    idx1 = rt.idx1.reshape(npan, nwin, 8, LANES).copy()
    sel_a = rt.sel_a.reshape(npan, out_rows, LANES).copy()
    sel_b = rt.sel_b.reshape(npan, out_rows, LANES).copy()
    prev_slot: Dict[int, List[int]] = {}
    for t in range(nwin):
        prev_slot.setdefault(int(b2[0, t]), []).append(t)
    for p in range(1, npan):
        row = b2[p].copy()
        taken = np.zeros(nwin, dtype=bool)
        perm = np.full(nwin, -1, dtype=np.int64)      # old slot -> new slot
        # pass 1: keep shared windows on their previous slot
        avail = {w: list(ts) for w, ts in prev_slot.items()}
        for t in range(nwin):
            ts = avail.get(int(row[t]))
            if ts:
                s = ts.pop()
                if not taken[s]:
                    perm[t] = s
                    taken[s] = True
        # pass 2: the rest take free slots
        free = np.flatnonzero(~taken)
        fi = 0
        for t in range(nwin):
            if perm[t] < 0:
                perm[t] = free[fi]
                fi += 1
        b2[p, perm] = row
        idx1[p, perm] = idx1[p].copy()
        pi = np.arange(32, dtype=np.uint8)
        pi[:nwin] = perm.astype(np.uint8)
        sel_a[p] = (sel_a[p] & 7) | (pi[sel_a[p] >> 3] << 3)
        sel_b[p] = (sel_b[p] & 7) | (pi[sel_b[p] >> 3] << 3)
        prev_slot = {}
        for t in range(nwin):
            prev_slot.setdefault(int(b2[p, t]), []).append(t)
    rt2 = RoutePlan(idx1=idx1.reshape(npan * sr, LANES),
                    sel_a=sel_a.reshape(npan * out_rows, LANES),
                    sel_b=sel_b.reshape(npan * out_rows, LANES),
                    idx3=rt.idx3, src_rows=rt.src_rows)
    return b2.reshape(-1), rt2


def _pad_route(rt: RoutePlan, npanels: int, tgt: int,
               out_rows: int = PROWS) -> RoutePlan:
    """Pad a route plan with idle panels (streams zero: every slot reads
    source (0, 0) via layer a — a defined value; the pad panels' folds
    land in the scratch y row)."""
    if npanels == tgt:
        return rt
    ap = tgt - npanels
    return RoutePlan(
        idx1=np.concatenate(
            [rt.idx1, np.zeros((ap * rt.src_rows, LANES), np.int8)]),
        sel_a=np.concatenate(
            [rt.sel_a, np.zeros((ap * out_rows, LANES), np.uint8)]),
        sel_b=np.concatenate(
            [rt.sel_b, np.zeros((ap * out_rows, LANES), np.uint8)]),
        idx3=np.concatenate(
            [rt.idx3, np.zeros((ap * out_rows, LANES), np.uint8)]),
        src_rows=rt.src_rows)


def build_spmv3_meta(tiles: TileSet, value_dtype=np.float32) -> Spmv3Meta:
    from graphtap_tpu.parallel import multihost as mh
    part = tiles.part
    D = part.D
    NC = part.tile_cols
    dense_len = part.tile_rows

    plans: List[Spmv3Plan] = []
    for b in range(D):
        n = int(tiles.nnz[b, 0])
        r = tiles.rows[b, :n].astype(np.int64)
        c = tiles.cols[b, :n].astype(np.int64)
        w = tiles.weights[b, :n] if tiles.weights is not None else None
        iv = tiles.iv_dense[b] if tiles.ir is not None else None
        plans.append(build_spmv3_plan(r, c, w, tiles.NR, NC, dense_len, iv,
                                      value_dtype=value_dtype))

    p0 = plans[0]
    nwin = p0.pa_nwin
    exp_panels = int(mh.global_max(max(p.exp_panels for p in plans)))
    pa_panels = int(mh.global_max(max(p.pa_panels for p in plans)))
    fix_panels = int(mh.global_max(max(p.fix_panels for p in plans)))
    fixr_nwin = int(mh.global_max(max(p.fixr_nwin for p in plans)))
    f2_panels = int(mh.global_max(max(p.f2_panels for p in plans)))
    f2_nwin = int(mh.global_max(max(p.f2_nwin for p in plans)))
    fix2_chunks = f2_panels * STRIPE
    nrb = int(mh.global_max(max(
        (int(p.fix_dst.max()) + 1 if p.fix_dst.size else 1)
        for p in plans)))
    nrb = -(-nrb // STRIPE) * STRIPE + STRIPE     # + scratch row block
    if nrb > FOLD_SEG_ROWS:
        # multi-segment fold: the y table streams FOLD_SEG_ROWS-row
        # segments through VMEM (panels are segment-sorted), so nrb
        # rounds to whole segments
        nrb = -(-nrb // FOLD_SEG_ROWS) * FOLD_SEG_ROWS
    nblocks = int(mh.global_max(max(p.nblocks for p in plans))) + STRIPE
    dense_rows = int(mh.global_max(max(p.dense_rows for p in plans)))
    # fix2 folds straight into the DENSE y layout (one scratch block for
    # pad chunks past dense_len); the table streams FOLD_SEG_ROWS-row
    # VMEM segments when it spans more than one
    f2_rows = dense_rows + STRIPE
    if f2_rows > FOLD_SEG_ROWS:
        f2_rows = -(-f2_rows // FOLD_SEG_ROWS) * FOLD_SEG_ROWS
    xext_rows = exp_panels * XROWS
    has_w = tiles.weights is not None

    from graphtap_tpu.kernels.panel_plan import NWIN_X
    xr_nwin = NWIN_X

    sx = -(-(-(-NC // LANES)) // STRIPE) * STRIPE
    arrs: Dict[str, List[np.ndarray]] = {}
    for b, p in enumerate(plans):
        er = _append_fill_panel(_pad_route(p.exp_route, p.exp_panels,
                                           exp_panels))
        pr = _append_fill_panel(_pad_route(p.pa_route, p.pa_panels,
                                           pa_panels))
        # x -> x_ext route: pad + its own fill panel (content don't-care,
        # read only by the exp fill panel whose sel is all-0xF8)
        xr = _append_fill_panel(
            _pad_route(p.xr_route, p.exp_panels, exp_panels,
                       out_rows=XROWS), out_rows=XROWS)
        xb = np.zeros((exp_panels + 1) * xr_nwin, np.int32)
        xb[:p.xr_bases.size] = p.xr_bases
        # fix2 route_fold: pad panels/windows (pad windows read y_mid
        # block 0; pad chunks' slots are unrouted = fill = fold identity)
        f2 = _pad_route(
            _pad_route_nwin(p.f2_route, p.f2_panels, p.f2_nwin, f2_nwin),
            p.f2_panels, f2_panels)
        f2b = np.zeros((f2_panels, f2_nwin), np.int32)
        lb2 = p.f2_bases.reshape(p.f2_panels, p.f2_nwin)
        f2b[:p.f2_panels, :p.f2_nwin] = lb2
        fr = _pad_route(
            _pad_route_nwin(p.fixr_route, p.fix_panels, p.fixr_nwin,
                            fixr_nwin),
            p.fix_panels, fix_panels)
        # pa bases cover the fill panel too: its windows read s0's fill
        # panel (block exp_panels*8 — the first stripe past the real
        # panels IS the fill panel now, same index as the old appended
        # stripe)
        bases = np.full((pa_panels + 1) * nwin, exp_panels * 8, np.int32)
        bases[:p.pa_bases.size] = p.pa_bases
        # fixr bases: pad nwin columns and panels with the fill block,
        # rebasing the device-local fill id to the mesh-global one (the
        # fill block's CONTENT must be the ⊕-identity here)
        gfill = pa_panels * STRIPE
        fb = np.full((fix_panels, fixr_nwin), gfill, np.int32)
        lb = p.fixr_bases.reshape(p.fix_panels, p.fixr_nwin)
        fb[:p.fix_panels, :p.fixr_nwin] = np.where(
            lb >= p.pa_panels * STRIPE, gfill, lb)
        bases, pr = _match_window_slots(bases, pr, nwin)
        fb, fr = _match_window_slots(fb.reshape(-1), fr, fixr_nwin)
        xb, xr = _match_window_slots(xb, xr, xr_nwin, out_rows=XROWS)
        f2b, f2 = _match_window_slots(f2b.reshape(-1), f2, f2_nwin)
        arrs.setdefault("pa_bases", []).append(bases)
        arrs.setdefault("fixr_bases", []).append(fb)
        arrs.setdefault("xr_bases", []).append(xb)
        arrs.setdefault("f2_bases", []).append(f2b)
        # one packed uint8 plan stream per route (idx1+sel_a+sel_b+idx3
        # row-concatenated per panel): a single DMA stream per grid step
        # instead of four — the per-stream bookkeeping was the dominant
        # fixed cost of every route stage (docs/KERNEL_NOTES.md round 5)
        # fixr gets one extra fill-plan BLOCK (all-0xF8 sel) past its
        # fix_panels grid steps: frontier gating points inactive panels'
        # plan index at it (their dst/seg/ini stay their own, so the
        # fold correctly accumulates pure ⊕-identity)
        for nm, rt, npan, orows, twol in (
                ("pa", pr, pa_panels + 1, PROWS, True),
                ("fixr", _append_fill_panel(fr), fix_panels + 1, PROWS,
                 True),
                ("f2", f2, f2_panels, PROWS, True)):
            arrs.setdefault(f"{nm}_plan", []).append(pack_route_plan(
                rt.idx1, rt.sel_a, rt.sel_b, rt.idx3, npan, rt.src_rows,
                out_rows=orows, two_layer=twol))
        # fused x->x_ext + expand: both routes' plan blocks concatenated
        # per panel (the x_ext stream never exists in HBM)
        npan_xe = exp_panels + 1
        xr_pk = pack_route_plan(
            xr.idx1, xr.sel_a, xr.sel_b, xr.idx3, npan_xe, xr.src_rows,
            out_rows=XROWS, two_layer=False).reshape(npan_xe, -1, LANES)
        ex_pk = pack_route_plan(
            er.idx1, er.sel_a, er.sel_b, er.idx3, npan_xe, er.src_rows,
            out_rows=PROWS, two_layer=True).reshape(npan_xe, -1, LANES)
        arrs.setdefault("xe_plan", []).append(
            np.concatenate([xr_pk, ex_pk], axis=1).reshape(-1, LANES))
        # pad chunks fold into the scratch row blocks; dst entries are
        # SEGMENT-RELATIVE for the segmented route_fold, with per-panel
        # segment ids (non-decreasing: real panels are planner-sorted,
        # pad panels target the scratch rows in the last segment)
        fd = np.full(fix_panels * STRIPE, nrb - STRIPE, np.int64)
        fd[:p.fix_dst.size] = p.fix_dst
        sg = np.full(fix_panels, (nrb - STRIPE) // FOLD_SEG_ROWS, np.int64)
        sg[:p.fixr_seg.size] = p.fixr_seg
        # a device whose local nrb is smaller than the global table would
        # otherwise skip the tail segments entirely, leaving their y_mid
        # rows UNINITIALIZED (today provably unread by fix2, but hub_fold
        # streams the whole table) — point the pad panels at the missing
        # segments in order so every segment gets its ini=1 fill pass.
        # Local segments are contiguous from 0, so the missing ones are a
        # tail range and the non-decreasing panel order is preserved.
        nseg1 = nrb // FOLD_SEG_ROWS if nrb > FOLD_SEG_ROWS else 1
        have1 = set(sg[:p.fix_panels].tolist())
        miss1 = [s_ for s_ in range(nseg1) if s_ not in have1]
        npad1 = fix_panels - p.fix_panels
        assert len(miss1) <= npad1 or not miss1, (
            f"fixr: {len(miss1)} uncovered fold segments but only "
            f"{npad1} pad panels")
        for k_, s_ in enumerate(miss1):
            sg[p.fix_panels + k_] = s_
            fd[(p.fix_panels + k_) * STRIPE:(p.fix_panels + k_ + 1)
               * STRIPE] = s_ * FOLD_SEG_ROWS
        assert (np.diff(sg) >= 0).all(), "fixr panels not segment-sorted"
        fd_rel = fd - np.repeat(sg, STRIPE) * FOLD_SEG_ROWS
        seg_rows = min(nrb, FOLD_SEG_ROWS)
        assert fd_rel.min() >= 0 and fd_rel.max() < seg_rows, (
            fd_rel.min(), fd_rel.max(), seg_rows)
        ini = np.zeros(fix_panels, np.int32)
        ini[0] = 1
        ini[1:] = (sg[1:] != sg[:-1]).astype(np.int32)
        arrs.setdefault("fix_dst", []).append(fd_rel.astype(np.int32))
        arrs.setdefault("fixr_seg", []).append(sg.astype(np.int32))
        arrs.setdefault("fixr_ini", []).append(ini)
        hm = np.zeros(nrb, dtype=np.uint8)
        hm[:min(p.hub_mask.size, nrb)] = \
            p.hub_mask[:nrb].astype(np.uint8)
        # 2D broadcast for the one-pass hub_fold kernel's streamed read
        arrs.setdefault("hub_mask", []).append(
            np.broadcast_to(hm[:, None], (nrb, LANES)).copy())
        # fix2: pad panels fold into the scratch block in the LAST
        # segment; real dst entries become segment-relative (dense rows)
        seg_rows2 = min(f2_rows, FOLD_SEG_ROWS)
        fd2 = np.full(fix2_chunks, f2_rows - STRIPE, np.int64)
        fd2[:p.fix2_dst.size] = p.fix2_dst
        sg2 = np.full(f2_panels, (f2_rows - STRIPE) // FOLD_SEG_ROWS,
                      np.int64)
        sg2[:p.f2_seg.size] = p.f2_seg
        assert (np.diff(sg2) >= 0).all(), "f2 panels not segment-sorted"
        fd2_rel = fd2 - np.repeat(sg2, STRIPE) * FOLD_SEG_ROWS
        assert fd2_rel.min() >= 0 and fd2_rel.max() < seg_rows2, (
            fd2_rel.min(), fd2_rel.max(), seg_rows2)
        ini2 = np.zeros(f2_panels, np.int32)
        ini2[0] = 1
        ini2[1:] = (sg2[1:] != sg2[:-1]).astype(np.int32)
        arrs.setdefault("fix2_dst", []).append(fd2_rel.astype(np.int32))
        arrs.setdefault("f2_seg", []).append(sg2.astype(np.int32))
        arrs.setdefault("f2_ini", []).append(ini2)
        # dense segments no panel of THIS device visits are never written
        # by route_fold — unlike y_mid, the dense y is consumed in full
        # by the exchange, so spmv3_local masks those rows to the
        # ⊕-identity (cells can be mid-range sparse on sharded tiles)
        nseg2 = max(1, f2_rows // seg_rows2)
        segok = np.zeros(nseg2, np.int32)
        segok[np.unique(sg2)] = 1
        arrs.setdefault("f2_segok", []).append(segok)
        if has_w:
            ws = np.zeros(((exp_panels + 1) * PROWS, LANES),
                          dtype=value_dtype)
            if p.w_stream is not None:
                ws[:p.w_stream.shape[0]] = p.w_stream
            arrs.setdefault("w_stream", []).append(ws)

    arrays = {k: np.stack(v) for k, v in arrs.items()}
    return Spmv3Meta(NC=NC, nblocks=nblocks, dense_rows=dense_rows,
                     f2_rows=f2_rows,
                     exp_panels=exp_panels, pa_panels=pa_panels,
                     pa_nwin=nwin, fix_panels=fix_panels,
                     fixr_nwin=fixr_nwin,
                     fix2_chunks=fix2_chunks, f2_panels=f2_panels,
                     f2_nwin=f2_nwin, nrb=nrb,
                     xext_rows=xext_rows, xr_nwin=xr_nwin, sx_rows=sx,
                     has_w=has_w, arrays=arrays)


GATE_RATIO = 0.6    # activity fraction above which the dense pipeline
# wins — the reference's sparse/dense vote threshold
# (vertex_program.hpp:767, :1378), here over active x blocks


def spmv3_local(x, t: Dict, meta: Spmv3Meta, semiring: Semiring,
                dense_len: int, interpret: bool = False,
                gate=False):
    """Per-device v3 SpMV inside shard_map: x (NC,) → y_dense.

    ``gate`` turns on frontier gating for nonstationary programs:
    per-iteration activity bits per 8-row x block propagate through the
    panel graph (xe -> pa -> fixr), and inactive panels' plan indices /
    window bases are redirected to the fill blocks — the revolving
    buffers then skip those fetches, so a sparse iteration streams
    O(active panels) bytes.  Semantics are exact: inactive sources hold
    the ⊕-identity, which is precisely what the fill plan routes
    (reference: spmv_nonstationary's xi-indexed work skipping,
    vertex_program.hpp:1438-1506).

    ``gate="auto"`` (the engine default) dispatches per iteration with a
    ``lax.cond`` on the measured activity ratio — dense iterations run
    the strictly-static pipeline (no SMEM plan indirection), sparse ones
    the gated pipeline (the reference's per-iteration sparse/dense vote,
    vertex_program.hpp:767).  ``gate=True`` forces the gated pipeline
    (tests)."""
    fill = np.dtype(x.dtype).type(semiring.identity)
    if semiring.reduce_kind == "sum":
        mul_kind = "mul" if meta.has_w else "none"
    else:
        mul_kind = "add_sat" if meta.has_w else "none"
    sx = meta.sx_rows
    xp = x if sx * LANES == x.shape[0] else jnp.concatenate(
        [x, jnp.full((sx * LANES - x.shape[0],), fill, x.dtype)])
    # one appended all-fill block: the gated path redirects inactive
    # windows here (their true content is the ⊕-identity by the
    # nonstationary masking, so the substitution is exact)
    x2d = jnp.concatenate(
        [xp.reshape(sx, LANES),
         jnp.full((STRIPE, LANES), fill, x.dtype)])
    x_fill_blk = sx // STRIPE

    nxe = meta.exp_panels + 1
    npa = meta.pa_panels + 1

    def _activity(x2d):
        return jnp.any(
            (x2d[:sx] != fill).reshape(sx // STRIPE, STRIPE * LANES),
            axis=1)

    def _gating_maps(x2d):
        blk_act = _activity(x2d)
        xb = t["xr_bases"].reshape(nxe, meta.xr_nwin)
        w_act = blk_act[jnp.clip(xb, 0, sx // STRIPE - 1)]
        a_xe = jnp.any(w_act, axis=1).at[meta.exp_panels].set(True)
        ar_xe = jnp.arange(nxe, dtype=jnp.int32)
        xe_pidx = jnp.where(a_xe, ar_xe, meta.exp_panels)
        xe_bases = jnp.where(w_act, xb,
                             x_fill_blk).reshape(-1).astype(jnp.int32)
        pb = t["pa_bases"].reshape(npa, meta.pa_nwin)
        ps_act = a_xe[jnp.clip(pb // STRIPE, 0, nxe - 1)]
        a_pa = jnp.any(ps_act, axis=1).at[meta.pa_panels].set(True)
        ar_pa = jnp.arange(npa, dtype=jnp.int32)
        pa_pidx = jnp.where(a_pa, ar_pa, meta.pa_panels)
        pa_bases = jnp.where(ps_act, pb,
                             meta.exp_panels * STRIPE
                             ).reshape(-1).astype(jnp.int32)
        fb = t["fixr_bases"].reshape(meta.fix_panels, meta.fixr_nwin)
        fs_act = a_pa[jnp.clip(fb // STRIPE, 0, npa - 1)]
        a_fx = jnp.any(fs_act, axis=1)
        fx_pidx = jnp.where(a_fx,
                            jnp.arange(meta.fix_panels, dtype=jnp.int32),
                            meta.fix_panels)   # the appended fill block
        fx_bases = jnp.where(fs_act, fb,
                             meta.pa_panels * STRIPE
                             ).reshape(-1).astype(jnp.int32)
        return (xe_bases, xe_pidx, pa_bases, pa_pidx, fx_bases, fx_pidx)

    def _pipeline(x2d, xe_bases, xe_pidx, pa_bases, pa_pidx,
                  fx_bases, fx_pidx):
        # x -> x_ext -> s0 is ONE fused kernel: the x->x_ext route runs
        # over the panel's <= NWIN_X source x windows and the expand
        # route consumes the register-resident x_ext bands immediately
        # (the x_ext stream never round-trips HBM).  Both emit their
        # trailing fill panel (meta panels + 1): the pa/fixr fill
        # windows at blocks exp_panels*8 / pa_panels*8 land inside it.
        s0 = route_xr_exp(
            x2d, xe_bases, t["xe_plan"], t.get("w_stream"), fill,
            nxe, meta.xr_nwin, mul_kind=mul_kind,
            interpret=interpret, plan_idx=xe_pidx)
        s1 = route_passa(
            s0, pa_bases, t["pa_plan"], fill, npa,
            meta.pa_nwin, interpret=interpret, plan_idx=pa_pidx)
        y_mid = route_fold(
            s1, fx_bases, t["fixr_plan"], t["fix_dst"], meta.nrb,
            semiring.reduce_kind, fill, meta.fix_panels, meta.fixr_nwin,
            seg=t["fixr_seg"], ini=t["fixr_ini"], interpret=interpret,
            plan_idx=fx_pidx)
        # hub rows: lane-⊕-fold at the row's packed slot width
        # (hub_mask codes 32/64/128; several hubs share a row at
        # 2^c-lane boundaries) so fix2 reads one conflict-free cell per
        # hub — one streamed butterfly pass instead of three XLA
        # where-passes
        y_mid = hub_fold(y_mid, t["hub_mask"], semiring.reduce_kind,
                         interpret=interpret)
        # fix2 lands straight in the dense y layout (the planner mapped
        # each cell through the TCSC renumbering's inverse) — no
        # expansion gather
        y_dense = route_fold(
            y_mid, t["f2_bases"], t["f2_plan"], t["fix2_dst"],
            meta.f2_rows, semiring.reduce_kind, fill, meta.f2_panels,
            meta.f2_nwin, seg=t["f2_seg"], ini=t["f2_ini"],
            interpret=interpret)
        # rows of dense segments this device never visited are
        # uninitialized memory — mask them to the ⊕-identity before the
        # exchange (skipped statically when every device covers every
        # segment, the common case)
        if not bool(meta.arrays["f2_segok"].all()):
            seg_rows2 = min(meta.f2_rows, FOLD_SEG_ROWS)
            ok = jnp.repeat(t["f2_segok"] != 0, seg_rows2)[:, None]
            y_dense = jnp.where(ok, y_dense, fill)
        return y_dense.reshape(-1)[:dense_len]

    def _static(x2d):
        return _pipeline(x2d, t["xr_bases"], None, t["pa_bases"], None,
                         t["fixr_bases"], None)

    def _gated(x2d):
        return _pipeline(x2d, *_gating_maps(x2d))

    if not gate:
        return _static(x2d)
    if gate == "auto":
        # per-iteration sparse/dense dispatch: dense iterations take the
        # strictly-static pipeline (no SMEM plan indirection), sparse
        # ones the gated pipeline (the reference's activity-ratio vote,
        # vertex_program.hpp:767).  The vote is on PANEL activity (a
        # panel is active if any of its x windows holds an active
        # block), not raw vertex activity: gating's win scales with the
        # fraction of panels skipped, and panel activity saturates much
        # earlier than vertex activity on power-law frontiers.
        if meta.exp_panels == 0:
            return _static(x2d)
        from jax import lax
        blk_act = _activity(x2d)
        xb = t["xr_bases"].reshape(nxe, meta.xr_nwin)
        a_xe = jnp.any(blk_act[jnp.clip(xb, 0, sx // STRIPE - 1)],
                       axis=1)
        ratio = jnp.mean(a_xe[:meta.exp_panels].astype(jnp.float32))
        return lax.cond(ratio <= GATE_RATIO, _gated, _static, x2d)
    return _gated(x2d)
