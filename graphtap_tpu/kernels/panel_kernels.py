"""Pallas kernels for the v3 panel pipeline — all-static streamed ops.

Every kernel is a fixed sequence of streamed crossbars/selects/reduces
over (64,128) panels; no SMEM scalar reads or dynamic slices in inner
loops (docs/KERNEL_NOTES.md round-2 probe table is the design basis).
Plans come from kernels/panel_plan.py.

  route_panel    the 3-stage in-panel route: stage 1 lane crossbar per
                 source band, stage 2 vertical move (take0 within band +
                 band select, two landing layers), stage 3 final lane
                 crossbar with the layer pick bit. Expand flavor reads
                 one x_ext panel (static index); pass-A flavor reads
                 NWIN stripe windows at prefetched bases.
  fold_stripes   pass B: column-⊕ each of the 8 digit stripes of a
                 routed panel into one y_lane row. Pure streaming.
  colsum_chunks  fixup fold: column-⊕ each 8-row chunk of the gathered
                 piece stack into its compact-y row (revisited output,
                 like shuffle_kernels.grouped_reduce).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphtap_tpu.kernels.panel_plan import (LANES, PROWS, STRIPE, NDIG,
                                             XROWS, FOLD_SEG_ROWS)


def _route_body(nsrc_bands, mul_kind, fill, has_w, nwin_refs,
                has_prefetch, two_layer, *kern_args):
    """Shared 3-stage route. kern_args layout: [(prefetch), *src_refs
    (nwin_refs or 1), idx1, sel_a, (sel_b if two_layer), idx3, (w),
    out].  two_layer=False skips the whole w_b band sweep — half the
    stage-2 crossbar work, for routes the planner solved single-layer
    (the x->x_ext route, whose ~73% load leaves the greedy slack)."""
    if has_prefetch:
        kern_args = kern_args[1:]
    srcs = kern_args[:nwin_refs]
    if two_layer:
        idx1_ref, sela_ref, selb_ref, idx3_ref = \
            kern_args[nwin_refs:nwin_refs + 4]
        nplan = 4
    else:
        idx1_ref, sela_ref, idx3_ref = kern_args[nwin_refs:nwin_refs + 3]
        selb_ref = None
        nplan = 3
    w_ref = kern_args[nwin_refs + nplan] if has_w else None
    out_ref = kern_args[-1]

    # stage 1: lane crossbar per source band
    us = []
    band = 0
    for sref in srcs:
        rows = sref.shape[0]
        for b in range(rows // STRIPE):
            v = sref[b * STRIPE:(b + 1) * STRIPE, :]
            ix = idx1_ref[band * STRIPE:(band + 1) * STRIPE, :].astype(
                jnp.int32)
            us.append(jnp.take_along_axis(v, ix, axis=1))
            band += 1

    # stages 2+3 per output band
    for ob in range(out_ref.shape[0] // STRIPE):
        sla = sela_ref[ob * STRIPE:(ob + 1) * STRIPE, :].astype(jnp.int32)
        wa = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
        ra, ba = sla & 7, sla >> 3
        if two_layer:
            slb = selb_ref[ob * STRIPE:(ob + 1) * STRIPE, :].astype(
                jnp.int32)
            wb = jnp.full((STRIPE, LANES), fill, out_ref.dtype)
            rb, bb = slb & 7, slb >> 3
        for sb in range(nsrc_bands):
            ta = jnp.take_along_axis(us[sb], ra, axis=0)
            wa = jnp.where(ba == sb, ta, wa)
            if two_layer:
                tb = jnp.take_along_axis(us[sb], rb, axis=0)
                wb = jnp.where(bb == sb, tb, wb)
        i3 = idx3_ref[ob * STRIPE:(ob + 1) * STRIPE, :].astype(jnp.int32)
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


def _route_fold_body(nwin, reduce_kind, fill, bases_ref, dst_ref,
                     seg_ref, ini_ref, *kern_args):
    """3-stage route fused with the chunk ⊕-fold: instead of writing the
    routed (64,128) panel to HBM for colsum_chunks to re-read, each
    output band folds to one row in-register and RMWs the VMEM-resident
    y-table SEGMENT at its prefetched (segment-relative) destination row
    — saves the full write+read of the 150 MB fixup stack every
    iteration.  ini marks each segment's first panel (initialize the
    freshly-fetched block to the ⊕-identity)."""
    i = pl.program_id(0)
    srcs = kern_args[:nwin]
    idx1_ref, sela_ref, selb_ref, idx3_ref = kern_args[nwin:nwin + 4]
    y_ref = kern_args[-1]

    @pl.when(ini_ref[i] == 1)
    def _():
        y_ref[...] = jnp.full_like(y_ref, fill)

    us = []
    for b, sref in enumerate(srcs):
        v = sref[...]
        ix = idx1_ref[b * STRIPE:(b + 1) * STRIPE, :].astype(jnp.int32)
        us.append(jnp.take_along_axis(v, ix, axis=1))

    for ob in range(PROWS // STRIPE):
        sla = sela_ref[ob * STRIPE:(ob + 1) * STRIPE, :].astype(jnp.int32)
        slb = selb_ref[ob * STRIPE:(ob + 1) * STRIPE, :].astype(jnp.int32)
        wa = jnp.full((STRIPE, LANES), fill, y_ref.dtype)
        wb = jnp.full((STRIPE, LANES), fill, y_ref.dtype)
        ra, ba = sla & 7, sla >> 3
        rb, bb = slb & 7, slb >> 3
        for sb in range(nwin):
            ta = jnp.take_along_axis(us[sb], ra, axis=0)
            wa = jnp.where(ba == sb, ta, wa)
            tb = jnp.take_along_axis(us[sb], rb, axis=0)
            wb = jnp.where(bb == sb, tb, wb)
        i3 = idx3_ref[ob * STRIPE:(ob + 1) * STRIPE, :].astype(jnp.int32)
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


def route_fold(stream0, bases, idx1, sel_a, sel_b, idx3, dst, nrows: int,
               reduce_kind: str, fill, npanels: int, nwin: int,
               seg=None, ini=None, interpret: bool = False):
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
    kern = functools.partial(_route_fold_body, nwin, reduce_kind, fill)

    def mk_spec(t):
        return pl.BlockSpec((STRIPE, LANES),
                            lambda i, b, d, s, n, t=t: (b[i * nwin + t], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(npanels,),
        in_specs=[mk_spec(t) for t in range(nwin)] + [
            pl.BlockSpec((nwin * STRIPE, LANES),
                         lambda i, b, d, s, n: (i, 0)),
            pl.BlockSpec((PROWS, LANES), lambda i, b, d, s, n: (i, 0)),
            pl.BlockSpec((PROWS, LANES), lambda i, b, d, s, n: (i, 0)),
            pl.BlockSpec((PROWS, LANES), lambda i, b, d, s, n: (i, 0)),
        ],
        out_specs=pl.BlockSpec((seg_rows, LANES),
                               lambda i, b, d, s, n: (s[i], 0)),
    )
    args = [bases, dst, seg, ini] + [stream0] * nwin + \
        [idx1, sel_a, sel_b, idx3]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), stream0.dtype),
        interpret=interpret,
    )(*args)


def route_expand(x_ext, idx1, sel_a, sel_b, idx3, weights, fill,
                 npanels: int, mul_kind: str = "none",
                 interpret: bool = False):
    """Expand route: x_ext panels (npanels*XROWS,128) -> contribution
    panels (npanels*64,128), ⊗-weighted."""
    has_w = weights is not None
    kern = functools.partial(_route_body, XROWS // STRIPE, mul_kind, fill,
                             has_w, 1, False, True)
    in_specs = [
        pl.BlockSpec((XROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((XROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((PROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((PROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((PROWS, LANES), lambda i: (i, 0)),
    ]
    args = [x_ext, idx1, sel_a, sel_b, idx3]
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


def route_passa(stream0, bases, idx1, sel_a, sel_b, idx3, fill,
                npanels: int, nwin: int, interpret: bool = False,
                out_rows: int = PROWS, two_layer: bool = True):
    """Pass-A route: corner-turn reads of ``nwin`` stripe windows at
    prefetched bases (8-row block indices into stream0, which carries an
    appended all-fill panel), then the 3-stage route.  ``out_rows`` = 64
    for the contribution stream, 32 (XROWS) for the x->x_ext route.
    ``two_layer=False`` for single-landing-layer plans (xr): sel_b is
    ignored (not streamed) and stage 2 runs one band sweep."""
    kern = functools.partial(_route_body, nwin, "none", fill, False, nwin,
                             True, two_layer)

    def mk_spec(t):
        return pl.BlockSpec((STRIPE, LANES),
                            lambda i, b, t=t: (b[i * nwin + t], 0))

    plan_streams = [idx1, sel_a, sel_b, idx3] if two_layer else \
        [idx1, sel_a, idx3]
    plan_specs = [pl.BlockSpec((nwin * STRIPE, LANES),
                               lambda i, b: (i, 0))] + \
        [pl.BlockSpec((out_rows, LANES), lambda i, b: (i, 0))] * \
        (len(plan_streams) - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npanels,),
        in_specs=[mk_spec(t) for t in range(nwin)] + plan_specs,
        out_specs=pl.BlockSpec((out_rows, LANES), lambda i, b: (i, 0)),
    )
    args = [bases] + [stream0] * nwin + plan_streams
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npanels * out_rows, LANES),
                                       stream0.dtype),
        interpret=interpret,
    )(*args)


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
