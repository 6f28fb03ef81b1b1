"""Pallas kernels for the v3 panel pipeline — all-static streamed ops.

Every kernel is a fixed sequence of streamed crossbars/selects/reduces
over (64,128) panels; no SMEM scalar reads or dynamic slices in inner
loops (docs/KERNEL_NOTES.md round-2 probe table is the design basis).
Plans come from kernels/panel_plan.py.

Round-5 finding (docs/KERNEL_NOTES.md): each grid step pays ~60 ns per
STREAM for DMA bookkeeping, independent of bytes — so the four per-panel
plan arrays (idx1 / sel_a / sel_b / idx3) are packed row-wise into ONE
uint8 stream per route (``pack_route_plan``) and sliced statically
in-kernel.  That removes 3 streams from every grid step of every route.

  route_panel    the 3-stage in-panel route: stage 1 lane crossbar per
                 source band, stage 2 vertical move (take0 within band +
                 band select, two landing layers), stage 3 final lane
                 crossbar with the layer pick bit. Expand flavor reads
                 one x_ext panel (static index); pass-A flavor reads
                 NWIN stripe windows at prefetched bases.
  route_fold     fixup route fused with the chunk ⊕-fold into a
                 VMEM-resident y-table segment.
  hub_fold       one-pass lane-group ⊕-fold of hub rows (codes 32/64/
                 128) via a 7-step butterfly — replaces three XLA
                 where-passes over the whole y_mid table.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphtap_tpu.kernels.panel_plan import (LANES, PROWS, STRIPE, NDIG,
                                             XROWS, FOLD_SEG_ROWS)


def pack_route_plan(idx1, sel_a, sel_b, idx3, npanels: int, src_rows: int,
                    out_rows: int = PROWS, two_layer: bool = True
                    ) -> np.ndarray:
    """Concatenate a route's per-panel plan arrays row-wise into one
    uint8 stream: per panel [idx1 (src_rows), sel_a (out_rows),
    sel_b (out_rows, two-layer only), idx3 (out_rows)]."""
    pieces = [np.asarray(idx1).astype(np.uint8).reshape(
        npanels, src_rows, LANES),
        np.asarray(sel_a).astype(np.uint8).reshape(npanels, out_rows, LANES)]
    if two_layer:
        pieces.append(np.asarray(sel_b).astype(np.uint8).reshape(
            npanels, out_rows, LANES))
    pieces.append(np.asarray(idx3).astype(np.uint8).reshape(
        npanels, out_rows, LANES))
    return np.concatenate(pieces, axis=1).reshape(-1, LANES)


def plan_rows(src_rows: int, out_rows: int = PROWS,
              two_layer: bool = True) -> int:
    return src_rows + (3 if two_layer else 2) * out_rows


def _plan_slices(plan_ref, src_rows, out_rows, two_layer):
    idx1 = plan_ref[0:src_rows, :].astype(jnp.int32)
    sela = plan_ref[src_rows:src_rows + out_rows, :].astype(jnp.int32)
    if two_layer:
        selb = plan_ref[src_rows + out_rows:
                        src_rows + 2 * out_rows, :].astype(jnp.int32)
        idx3 = plan_ref[src_rows + 2 * out_rows:
                        src_rows + 3 * out_rows, :].astype(jnp.int32)
    else:
        selb = None
        idx3 = plan_ref[src_rows + out_rows:
                        src_rows + 2 * out_rows, :].astype(jnp.int32)
    return idx1, sela, selb, idx3


def _route_body(nsrc_bands, mul_kind, fill, has_w, nwin_refs,
                n_prefetch, two_layer, *kern_args):
    """Shared 3-stage route. kern_args layout: [*prefetch (n_prefetch),
    *src_refs (nwin_refs or 1), plan, (w), out].  two_layer=False skips
    the whole w_b band sweep — half the stage-2 crossbar work, for
    routes the planner solved single-layer (the x->x_ext route)."""
    kern_args = kern_args[n_prefetch:]
    srcs = kern_args[:nwin_refs]
    plan_ref = kern_args[nwin_refs]
    w_ref = kern_args[nwin_refs + 1] if has_w else None
    out_ref = kern_args[-1]
    sr = nsrc_bands * STRIPE
    orows = out_ref.shape[0]
    idx1_all, sela_all, selb_all, idx3_all = _plan_slices(
        plan_ref, sr, orows, two_layer)

    # stage 1: lane crossbar per source band
    us = []
    band = 0
    for sref in srcs:
        rows = sref.shape[0]
        for b in range(rows // STRIPE):
            v = sref[b * STRIPE:(b + 1) * STRIPE, :]
            ix = idx1_all[band * STRIPE:(band + 1) * STRIPE, :]
            us.append(jnp.take_along_axis(v, ix, axis=1))
            band += 1

    # stages 2+3 per output band
    for ob in range(orows // STRIPE):
        sla = sela_all[ob * STRIPE:(ob + 1) * STRIPE, :]
        wa = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
        ra, ba = sla & 7, sla >> 3
        if two_layer:
            slb = selb_all[ob * STRIPE:(ob + 1) * STRIPE, :]
            wb = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
            rb, bb = slb & 7, slb >> 3
        for sb in range(nsrc_bands):
            ta = jnp.take_along_axis(us[sb], ra, axis=0)
            wa = jnp.where(ba == sb, ta, wa)
            if two_layer:
                tb = jnp.take_along_axis(us[sb], rb, axis=0)
                wb = jnp.where(bb == sb, tb, wb)
        i3 = idx3_all[ob * STRIPE:(ob + 1) * STRIPE, :]
        m = i3 & 127
        ga = jnp.take_along_axis(wa, m, axis=1)
        if two_layer:
            gb = jnp.take_along_axis(wb, m, axis=1)
            acc = jnp.where(i3 >= 128, gb, ga)
        else:
            acc = ga
        if has_w:
            w = w_ref[ob * STRIPE:(ob + 1) * STRIPE, :]
            if mul_kind == "mul":
                acc = acc * w
            elif mul_kind == "add_sat":
                acc = jnp.where(acc >= jnp.asarray(fill, acc.dtype),
                                jnp.asarray(fill, acc.dtype), acc + w)
        out_ref[ob * STRIPE:(ob + 1) * STRIPE, :] = acc


def _xr_exp_body(nwin, mul_kind, fill, has_w, bases_ref, pidx_ref,
                 *kern_args):
    """Fused x->x_ext route (one landing layer) + expand route: the
    x_ext panel never round-trips HBM — it is built in registers from
    the panel's ``nwin`` x-table windows and immediately expanded to the
    (64,128) contribution panel.  Plan stream rows per panel:
    [xr_idx1 (nwin*8), xr_sel_a (XROWS), xr_idx3 (XROWS),
     exp_idx1 (XROWS), exp_sel_a (64), exp_sel_b (64), exp_idx3 (64)]."""
    srcs = kern_args[:nwin]
    plan_ref = kern_args[nwin]
    w_ref = kern_args[nwin + 1] if has_w else None
    out_ref = kern_args[-1]
    sr = nwin * STRIPE
    r0 = 0

    def rows(n):
        nonlocal r0
        a = plan_ref[r0:r0 + n, :].astype(jnp.int32)
        r0 += n
        return a

    xr_idx1 = rows(sr)
    xr_sela = rows(XROWS)
    xr_idx3 = rows(XROWS)
    ex_idx1 = rows(XROWS)
    ex_sela = rows(PROWS)
    ex_selb = rows(PROWS)
    ex_idx3 = rows(PROWS)

    # ---- x -> x_ext (single landing layer)
    us = []
    for b, sref in enumerate(srcs):
        v = sref[...]
        us.append(jnp.take_along_axis(
            v, xr_idx1[b * STRIPE:(b + 1) * STRIPE, :], axis=1))
    xe = []                                  # XROWS//STRIPE register bands
    for ob in range(XROWS // STRIPE):
        sla = xr_sela[ob * STRIPE:(ob + 1) * STRIPE, :]
        wa = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
        ra, ba = sla & 7, sla >> 3
        for sb in range(nwin):
            ta = jnp.take_along_axis(us[sb], ra, axis=0)
            wa = jnp.where(ba == sb, ta, wa)
        i3 = xr_idx3[ob * STRIPE:(ob + 1) * STRIPE, :]
        xe.append(jnp.take_along_axis(wa, i3 & 127, axis=1))

    # ---- expand (two landing layers) over the register x_ext bands
    us2 = [jnp.take_along_axis(
        xe[b], ex_idx1[b * STRIPE:(b + 1) * STRIPE, :], axis=1)
        for b in range(XROWS // STRIPE)]
    for ob in range(PROWS // STRIPE):
        sla = ex_sela[ob * STRIPE:(ob + 1) * STRIPE, :]
        slb = ex_selb[ob * STRIPE:(ob + 1) * STRIPE, :]
        wa = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
        wb = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
        ra, ba = sla & 7, sla >> 3
        rb, bb = slb & 7, slb >> 3
        for sb in range(XROWS // STRIPE):
            ta = jnp.take_along_axis(us2[sb], ra, axis=0)
            wa = jnp.where(ba == sb, ta, wa)
            tb = jnp.take_along_axis(us2[sb], rb, axis=0)
            wb = jnp.where(bb == sb, tb, wb)
        i3 = ex_idx3[ob * STRIPE:(ob + 1) * STRIPE, :]
        m = i3 & 127
        ga = jnp.take_along_axis(wa, m, axis=1)
        gb = jnp.take_along_axis(wb, m, axis=1)
        acc = jnp.where(i3 >= 128, gb, ga)
        if has_w:
            w = w_ref[ob * STRIPE:(ob + 1) * STRIPE, :]
            if mul_kind == "mul":
                acc = acc * w
            elif mul_kind == "add_sat":
                acc = jnp.where(acc >= jnp.asarray(fill, acc.dtype),
                                jnp.asarray(fill, acc.dtype), acc + w)
        out_ref[ob * STRIPE:(ob + 1) * STRIPE, :] = acc


def route_xr_exp(x2d, bases, plan, weights, fill, npanels: int,
                 nwin: int, mul_kind: str = "none",
                 interpret: bool = False, plan_idx=None):
    """x table -> contribution panels in ONE kernel (fused x->x_ext route
    + expand route); ``plan`` is the packed concatenation of both routes'
    streams (see _xr_exp_body), ``bases`` the per-panel x windows.
    ``plan_idx`` as in route_passa (frontier gating)."""
    has_w = weights is not None
    prows = nwin * STRIPE + 3 * XROWS + 3 * PROWS
    gated = plan_idx is not None
    if gated:
        kern = functools.partial(_xr_exp_body, nwin, mul_kind, fill,
                                 has_w)

        def mk_spec(t):
            return pl.BlockSpec((STRIPE, LANES),
                                lambda i, b, q, t=t: (b[i * nwin + t], 0))

        in_specs = [mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((prows, LANES), lambda i, b, q: (q[i], 0))]
        args = [bases, plan_idx] + [x2d] * nwin + [plan]
        if has_w:
            in_specs.append(pl.BlockSpec((PROWS, LANES),
                                         lambda i, b, q: (q[i], 0)))
            args.append(weights)
        out_specs = pl.BlockSpec((PROWS, LANES), lambda i, b, q: (i, 0))
    else:
        # static plan/weight maps (stationary): strictly sequential
        # streams, no SMEM indirection in the revolving-buffer pipeline
        def kern(bases_ref, *kern_args):
            return _xr_exp_body(nwin, mul_kind, fill, has_w,
                                bases_ref, None, *kern_args)

        def mk_spec(t):
            return pl.BlockSpec((STRIPE, LANES),
                                lambda i, b, t=t: (b[i * nwin + t], 0))

        in_specs = [mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((prows, LANES), lambda i, b: (i, 0))]
        args = [bases] + [x2d] * nwin + [plan]
        if has_w:
            in_specs.append(pl.BlockSpec((PROWS, LANES),
                                         lambda i, b: (i, 0)))
            args.append(weights)
        out_specs = pl.BlockSpec((PROWS, LANES), lambda i, b: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if gated else 1,
        grid=(npanels,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npanels * PROWS, LANES), x2d.dtype),
        interpret=interpret,
    )(*args)


def _route_fold_body(nwin, reduce_kind, fill, bases_ref, dst_ref,
                     seg_ref, ini_ref, pidx_ref, *kern_args):
    """3-stage route fused with the chunk ⊕-fold: instead of writing the
    routed (64,128) panel to HBM for a fold kernel to re-read, each
    output band folds to one row in-register and RMWs the VMEM-resident
    y-table SEGMENT at its prefetched (segment-relative) destination row.
    ini marks each segment's first panel (initialize the freshly-fetched
    block to the ⊕-identity)."""
    i = pl.program_id(0)
    srcs = kern_args[:nwin]
    plan_ref = kern_args[nwin]
    y_ref = kern_args[-1]
    sr = nwin * STRIPE
    idx1_all, sela_all, selb_all, idx3_all = _plan_slices(
        plan_ref, sr, PROWS, True)

    @pl.when(ini_ref[i] == 1)
    def _():
        y_ref[...] = jnp.full_like(y_ref, fill)

    us = []
    for b, sref in enumerate(srcs):
        v = sref[...]
        ix = idx1_all[b * STRIPE:(b + 1) * STRIPE, :]
        us.append(jnp.take_along_axis(v, ix, axis=1))

    for ob in range(PROWS // STRIPE):
        sla = sela_all[ob * STRIPE:(ob + 1) * STRIPE, :]
        slb = selb_all[ob * STRIPE:(ob + 1) * STRIPE, :]
        wa = jnp.full((STRIPE, LANES), fill, y_ref.dtype)
        wb = jnp.full((STRIPE, LANES), fill, y_ref.dtype)
        ra, ba = sla & 7, sla >> 3
        rb, bb = slb & 7, slb >> 3
        for sb in range(nwin):
            ta = jnp.take_along_axis(us[sb], ra, axis=0)
            wa = jnp.where(ba == sb, ta, wa)
            tb = jnp.take_along_axis(us[sb], rb, axis=0)
            wb = jnp.where(bb == sb, tb, wb)
        i3 = idx3_all[ob * STRIPE:(ob + 1) * STRIPE, :]
        m = i3 & 127
        ga = jnp.take_along_axis(wa, m, axis=1)
        gb = jnp.take_along_axis(wb, m, axis=1)
        acc = jnp.where(i3 >= 128, gb, ga)
        d = dst_ref[i * (PROWS // STRIPE) + ob]
        if reduce_kind == "sum":
            part = jnp.sum(acc, axis=0, keepdims=True)
            y_ref[pl.ds(d, 1), :] = y_ref[pl.ds(d, 1), :] + part
        elif reduce_kind == "min":
            part = jnp.min(acc, axis=0, keepdims=True)
            y_ref[pl.ds(d, 1), :] = jnp.minimum(y_ref[pl.ds(d, 1), :], part)
        else:
            part = jnp.max(acc, axis=0, keepdims=True)
            y_ref[pl.ds(d, 1), :] = jnp.maximum(y_ref[pl.ds(d, 1), :], part)


def route_fold(stream0, bases, plan, dst, nrows: int,
               reduce_kind: str, fill, npanels: int, nwin: int,
               seg=None, ini=None, interpret: bool = False,
               plan_idx=None):
    """Fixup route + chunk fold in one kernel: route panels of ``stream0``
    (read as ``nwin`` stripe windows at prefetched bases) and ⊕-fold each
    routed 8-row band into row ``dst[p*8+ob]`` of the y table.

    The y table is VMEM-resident one SEGMENT (≤ FOLD_SEG_ROWS rows) at a
    time: ``seg`` gives each panel's segment (non-decreasing — planner
    orders panels by destination segment), ``ini`` is 1 on each segment's
    first panel, and ``dst`` is segment-RELATIVE when nrows spans more
    than one segment.  With seg/ini omitted the table must fit one
    segment (dst absolute, single resident block — the f2 fold)."""
    seg_rows = min(nrows, FOLD_SEG_ROWS)
    nseg = -(-nrows // seg_rows)
    assert nrows == nseg * seg_rows, (nrows, seg_rows)
    if seg is None:
        assert nseg == 1, (
            f"route_fold: y table {nrows}x128 spans {nseg} segments — "
            f"pass the planner's per-panel seg/ini arrays")
        seg = jnp.zeros((npanels,), jnp.int32)
        ini = jnp.zeros((npanels,), jnp.int32).at[0].set(1)
    prows = plan_rows(nwin * STRIPE)
    gated = plan_idx is not None
    if gated:
        kern = functools.partial(_route_fold_body, nwin, reduce_kind,
                                 fill)

        def mk_spec(t):
            return pl.BlockSpec(
                (STRIPE, LANES),
                lambda i, b, d, s, n, q, t=t: (b[i * nwin + t], 0))

        in_specs = [mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((prows, LANES),
                         lambda i, b, d, s, n, q: (q[i], 0)),
        ]
        out_specs = pl.BlockSpec((seg_rows, LANES),
                                 lambda i, b, d, s, n, q: (s[i], 0))
        args = [bases, dst, seg, ini, plan_idx] + [stream0] * nwin + \
            [plan]
    else:
        # static plan map (stationary): sequential plan stream, no SMEM
        # indirection in the revolving-buffer pipeline
        def kern(bases_ref, dst_ref, seg_ref, ini_ref, *kern_args):
            return _route_fold_body(nwin, reduce_kind, fill, bases_ref,
                                    dst_ref, seg_ref, ini_ref, None,
                                    *kern_args)

        def mk_spec(t):
            return pl.BlockSpec(
                (STRIPE, LANES),
                lambda i, b, d, s, n, t=t: (b[i * nwin + t], 0))

        in_specs = [mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((prows, LANES),
                         lambda i, b, d, s, n: (i, 0)),
        ]
        out_specs = pl.BlockSpec((seg_rows, LANES),
                                 lambda i, b, d, s, n: (s[i], 0))
        args = [bases, dst, seg, ini] + [stream0] * nwin + [plan]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 if gated else 4,
        grid=(npanels,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), stream0.dtype),
        interpret=interpret,
    )(*args)


def route_expand(x_ext, plan, weights, fill,
                 npanels: int, mul_kind: str = "none",
                 interpret: bool = False):
    """Expand route: x_ext panels (npanels*XROWS,128) -> contribution
    panels (npanels*64,128), ⊗-weighted."""
    has_w = weights is not None
    kern = functools.partial(_route_body, XROWS // STRIPE, mul_kind, fill,
                             has_w, 1, 0, True)
    prows = plan_rows(XROWS)
    in_specs = [
        pl.BlockSpec((XROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((prows, LANES), lambda i: (i, 0)),
    ]
    args = [x_ext, plan]
    if has_w:
        in_specs.append(pl.BlockSpec((PROWS, LANES), lambda i: (i, 0)))
        args.append(weights)
    return pl.pallas_call(
        kern,
        grid=(npanels,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((PROWS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npanels * PROWS, LANES),
                                       x_ext.dtype),
        interpret=interpret,
    )(*args)


def route_passa(stream0, bases, plan, fill,
                npanels: int, nwin: int, interpret: bool = False,
                out_rows: int = PROWS, two_layer: bool = True,
                plan_idx=None):
    """Pass-A route: corner-turn reads of ``nwin`` stripe windows at
    prefetched bases (8-row block indices into stream0, which carries an
    appended all-fill panel), then the 3-stage route.  ``out_rows`` = 64
    for the contribution stream, 32 (XROWS) for the x->x_ext route.
    ``two_layer=False`` for single-landing-layer plans (xr): the packed
    plan then carries no sel_b block and stage 2 runs one band sweep.
    ``plan_idx`` (optional, (npanels,) int32) selects each grid step's
    plan block — frontier gating points inactive panels at the fill
    panel's plan (all-0xF8 sel -> pure ⊕-identity output) so the
    revolving buffers skip their fetches entirely."""
    prows = plan_rows(nwin * STRIPE, out_rows, two_layer)
    gated = plan_idx is not None
    kern = functools.partial(_route_body, nwin, "none", fill, False, nwin,
                             2 if gated else 1, two_layer)
    if gated:
        def mk_spec(t):
            return pl.BlockSpec((STRIPE, LANES),
                                lambda i, b, q, t=t: (b[i * nwin + t], 0))
        in_specs = [mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((prows, LANES), lambda i, b, q: (q[i], 0))]
        out_specs = pl.BlockSpec((out_rows, LANES),
                                 lambda i, b, q: (i, 0))
        args = [bases, plan_idx] + [stream0] * nwin + [plan]
    else:
        # static plan map: the ungated (stationary) path keeps the plan
        # stream strictly sequential so the revolving-buffer pipeline
        # never indirects through SMEM
        def mk_spec(t):
            return pl.BlockSpec((STRIPE, LANES),
                                lambda i, b, t=t: (b[i * nwin + t], 0))
        in_specs = [mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((prows, LANES), lambda i, b: (i, 0))]
        out_specs = pl.BlockSpec((out_rows, LANES), lambda i, b: (i, 0))
        args = [bases] + [stream0] * nwin + [plan]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if gated else 1,
        grid=(npanels,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npanels * out_rows, LANES),
                                       stream0.dtype),
        interpret=interpret,
    )(*args)


def _hub_body(reduce_kind, br, hm_ref, v_ref, out_ref):
    v = v_ref[...]
    hm = hm_ref[...].astype(jnp.int32)
    if reduce_kind == "sum":
        op = jnp.add
    elif reduce_kind == "min":
        op = jnp.minimum
    else:
        op = jnp.maximum
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    out = v
    acc = v
    for w, s in ((32, (1, 2, 4, 8, 16)), (64, (32,)), (128, (64,))):
        for sh in s:
            acc = op(acc, jnp.take_along_axis(acc, lane ^ sh, axis=1))
        out = jnp.where(hm == w, acc, out)
    out_ref[...] = out


def hub_fold(y_mid, hub_mask2d, reduce_kind: str,
             interpret: bool = False):
    """Collapse hub rows' packed 2^c-lane slots to their group-⊕ in ONE
    streamed pass (7-step lane butterfly, snapshots at widths 32/64/128
    selected by the row's hub code; code 0 rows pass through).  Replaces
    the three XLA where-passes that each re-streamed the y_mid table."""
    nr = y_mid.shape[0]
    br = STRIPE
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if nr % cand == 0:
            br = cand
            break
    kern = functools.partial(_hub_body, reduce_kind, br)
    return pl.pallas_call(
        kern,
        grid=(nr // br,),
        in_specs=[pl.BlockSpec((br, LANES), lambda i: (i, 0)),
                  pl.BlockSpec((br, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nr, LANES), y_mid.dtype),
        interpret=interpret,
    )(hub_mask2d, y_mid)


def _fold_body(reduce_kind, s1_ref, out_ref):
    for d in range(NDIG):
        v = s1_ref[d * STRIPE:(d + 1) * STRIPE, :]
        if reduce_kind == "sum":
            r = jnp.sum(v, axis=0, keepdims=True)
        elif reduce_kind == "min":
            r = jnp.min(v, axis=0, keepdims=True)
        else:
            r = jnp.max(v, axis=0, keepdims=True)
        out_ref[d:d + 1, :] = r


def fold_stripes(s1, reduce_kind: str, npanels: int,
                 interpret: bool = False):
    """Pass B: (npanels*64,128) routed stream -> (npanels*8,128) y_lane."""
    kern = functools.partial(_fold_body, reduce_kind)
    return pl.pallas_call(
        kern,
        grid=(npanels,),
        in_specs=[pl.BlockSpec((PROWS, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((STRIPE, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npanels * STRIPE, LANES), s1.dtype),
        interpret=interpret,
    )(s1)


def _chunk_body(reduce_kind, identity, dst_ref, c_ref, y_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.full_like(y_ref, identity)

    d = dst_ref[i]
    v = c_ref[...]
    if reduce_kind == "sum":
        part = jnp.sum(v, axis=0, keepdims=True)
        y_ref[pl.ds(d, 1), :] = y_ref[pl.ds(d, 1), :] + part
    elif reduce_kind == "min":
        part = jnp.min(v, axis=0, keepdims=True)
        y_ref[pl.ds(d, 1), :] = jnp.minimum(y_ref[pl.ds(d, 1), :], part)
    else:
        part = jnp.max(v, axis=0, keepdims=True)
        y_ref[pl.ds(d, 1), :] = jnp.maximum(y_ref[pl.ds(d, 1), :], part)


def colsum_chunks(ystack, chunk_dst, nblocks: int, reduce_kind: str,
                  identity, interpret: bool = False):
    """Fixup fold: ⊕ each (8,128) chunk into compact-y row chunk_dst[i]."""
    nchunks = ystack.shape[0] // STRIPE
    kern = functools.partial(_chunk_body, reduce_kind, identity)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec((STRIPE, LANES), lambda i, d: (i, 0))],
        out_specs=pl.BlockSpec((nblocks, LANES), lambda i, d: (0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, LANES), ystack.dtype),
        interpret=interpret,
    )(chunk_dst, ystack)
