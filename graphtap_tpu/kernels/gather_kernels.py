"""The windowed-gather Pallas kernel: one primitive for the v2 SpMV pipeline.

Implements an arbitrary *static* gather (permutation with duplication) from
a 2D source table to an output stream, under a window-locality constraint
planned host-side (kernels/gather_plan.py). Every stage of the v2 pipeline
is one application of this kernel:

  expand      — source = the gathered x vector as a (NC/128, 128) table;
                output = per-edge contributions in (super, col)-sorted
                stream order (reference's x-gather, the inner
                ``x[JC[j]]`` reads of spmv_stationary,
                vertex_program.hpp:1162-1216).
  radix pass  — source = the previous stream; output = the stream stably
                partitioned by the next 2 bits of the destination-block
                code (replaces the reference's per-rank serial scatter —
                the TPU has no scatter, so the plan routes every element
                through lane/sublane crossbars instead).
  mexp        — source = the compact (renumbered) y table; output = the
                dense row block (the IR expansion of TCSC_BASE,
                compressed_column.hpp:274-297).

Kernel contract (all shapes static, planned host-side):
  grid = (nsteps, NSUB); output block (8, 128) revisited across the NSUB
  inner dimension. Per (step i, subop s):
    u[j, l]   = src[wsel[i*NSUB+s]*8 + j, cidx[i*NSUB+s, j, l]]
    g[ri, l]  = u[jsel[ri, l], l]           (jsel = meta & 7)
    out[ri,l] = g where (meta >> 3) == s    (sid 31 = slot invalid)
  After the last subop the optional weight stream is ⊗-applied and invalid
  slots are filled with the ⊕-identity.

Mosaic notes (docs/KERNEL_NOTES.md): lane crossbar = take_along_axis
axis=1 on (8,128); sublane crossbar = axis=0 (S=8 only); int8 streams must
be upcast to i32 before compares; scalars only from SMEM prefetch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8
SID_INVALID = 31


def _wg_body(nsub, mul_kind, fill, has_w, has_carry,
             wsel_ref, base_ref, nact_ref, src_ref, cidx_ref, meta_ref,
             w_ref, *rest):
    out_ref = rest[-1]          # optional carry ref (aliased, unread)
    i = pl.program_id(0)
    s = pl.program_id(1)

    meta32 = meta_ref[0].astype(jnp.int32)            # (8,128)
    sid = meta32 >> 3

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.full_like(out_ref, fill)

    @pl.when(s < nact_ref[i])
    def _():
        c32 = cidx_ref[0].astype(jnp.int32)
        u = jnp.take_along_axis(src_ref[...], c32, axis=1)
        j32 = meta32 & 7
        g = jnp.take_along_axis(u, j32, axis=0)
        out_ref[...] = jnp.where(sid == s, g, out_ref[...])

    if has_w or mul_kind != "none":
        @pl.when(s == nsub - 1)
        def _():
            acc = out_ref[...]
            if mul_kind == "mul":
                acc = acc * w_ref[0]
            elif mul_kind == "add_sat":
                # min-plus ⊗ with INF guard (reference: sssp.h:49-56)
                acc = jnp.where(acc >= jnp.asarray(fill, acc.dtype),
                                jnp.asarray(fill, acc.dtype),
                                acc + w_ref[0])
            out_ref[...] = jnp.where(sid == SID_INVALID,
                                     jnp.full_like(acc, fill), acc)


SEG_STEPS = 2048   # max grid steps per pallas_call: keeps the wsel/nact
                   # scalar-prefetch arrays within the ~1 MB SMEM budget


def seg_round_rows(rows: int) -> int:
    """Round a windowed_gather out_rows so the segmented driver's
    ``nsteps % SEG_STEPS == 0`` contract holds (planners call this on
    every stage's output rows; ≤ one segment needs no rounding)."""
    steps = rows // SUB
    if steps > SEG_STEPS:
        steps = -(-steps // SEG_STEPS) * SEG_STEPS
    return steps * SUB


def windowed_gather(src2d, wsel, base, nact, cidx, meta, weights, fill,
                    out_rows: int, nsub: int, mul_kind: str = "none",
                    interpret: bool = False):
    """Segmented driver: one pallas_call per ≤SEG_STEPS-step segment (all
    segments share one kernel lowering). ``out_rows`` must be a multiple
    of 8·SEG_STEPS when larger (the planner pads).

    ``cidx`` is the COMPACT active-subop stream (see GatherPlan); its
    block for (step i, subop s) is ``max(base[i] + min(s, nact[i]-1), 0)``
    — absolute, so segments receive the whole array unsliced."""
    nsteps = out_rows // SUB
    if nsteps <= SEG_STEPS:
        return _windowed_gather_call(src2d, wsel, base, nact, cidx, meta,
                                     weights, fill, out_rows, nsub,
                                     mul_kind, interpret)
    assert nsteps % SEG_STEPS == 0, (nsteps, SEG_STEPS)
    # segments write disjoint row ranges of ONE (out_rows,128) buffer via
    # offset out_specs + input_output_aliasing — concatenating per-segment
    # outputs copied the whole stream once more per stage
    out = None
    for q in range(nsteps // SEG_STEPS):
        s0 = q * SEG_STEPS
        out = _windowed_gather_call(
            src2d,
            jax.lax.dynamic_slice_in_dim(wsel, s0 * nsub, SEG_STEPS * nsub),
            jax.lax.dynamic_slice_in_dim(base, s0, SEG_STEPS),
            jax.lax.dynamic_slice_in_dim(nact, s0, SEG_STEPS),
            cidx,
            jax.lax.dynamic_slice_in_dim(meta, s0, SEG_STEPS),
            (jax.lax.dynamic_slice_in_dim(weights, s0, SEG_STEPS)
             if weights is not None else None),
            fill, SEG_STEPS * SUB, nsub, mul_kind, interpret,
            full_rows=out_rows, step_offset=s0, carry=out)
    return out


BLK64 = 64
SEG_STEPS64 = 1024   # 64-row steps per pallas_call (wsel prefetch budget)


def _wg64_body(nsub, fill, wsel_ref, base_ref, nact_ref, src_ref, cidx_ref,
               meta_ref, out_ref):
    i = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.full_like(out_ref, fill)

    @pl.when(s < nact_ref[i])
    def _():
        c32 = cidx_ref[0].astype(jnp.int32)               # (8,128)
        u = jnp.take_along_axis(src_ref[...], c32, axis=1)
        meta32 = meta_ref[0].astype(jnp.int32)            # (64,128)
        sid = meta32 >> 3
        j = meta32 & 7
        for b in range(BLK64 // SUB):
            jb = j[b * SUB:(b + 1) * SUB, :]
            g = jnp.take_along_axis(u, jb, axis=0)
            out_ref[b * SUB:(b + 1) * SUB, :] = jnp.where(
                sid[b * SUB:(b + 1) * SUB, :] == s, g,
                out_ref[b * SUB:(b + 1) * SUB, :])


def windowed_gather64(src2d, wsel, base, nact, cidx, meta, fill,
                      out_rows: int, nsub: int, interpret: bool = False):
    """64-row-block variant of windowed_gather: each (8,128) source window
    is fetched ONCE per 64-row output block and consumed by all 8 bands —
    8x less window DMA per output slot than the 8-row kernel, which is
    what the fold-stage gathers (many windows per step) need to stream at
    HBM rate. Plans come from build_gather_plan(block_rows=64)."""
    nsteps = out_rows // BLK64
    if nsteps <= SEG_STEPS64:
        return _wg64_call(src2d, wsel, base, nact, cidx, meta, fill,
                          out_rows, nsub, interpret)
    assert nsteps % SEG_STEPS64 == 0, (nsteps, SEG_STEPS64)
    outs = []
    for q in range(nsteps // SEG_STEPS64):
        s0 = q * SEG_STEPS64
        outs.append(_wg64_call(
            src2d,
            jax.lax.dynamic_slice_in_dim(wsel, s0 * nsub,
                                         SEG_STEPS64 * nsub),
            jax.lax.dynamic_slice_in_dim(base, s0, SEG_STEPS64),
            jax.lax.dynamic_slice_in_dim(nact, s0, SEG_STEPS64),
            cidx,
            jax.lax.dynamic_slice_in_dim(meta, s0, SEG_STEPS64),
            fill, SEG_STEPS64 * BLK64, nsub, interpret))
    return jnp.concatenate(outs, axis=0)


def seg_round_rows64(rows: int) -> int:
    """Round a windowed_gather64 out_rows to the segmented driver's
    contract (multiple of 64; multiple of 64*SEG_STEPS64 when larger)."""
    steps = -(-rows // BLK64)
    if steps > SEG_STEPS64:
        steps = -(-steps // SEG_STEPS64) * SEG_STEPS64
    return steps * BLK64


def _wg64_call(src2d, wsel, base, nact, cidx, meta, fill, out_rows: int,
               nsub: int, interpret: bool = False):
    nsteps = out_rows // BLK64
    kern = functools.partial(_wg64_body, nsub, fill)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps, nsub),
        in_specs=[
            pl.BlockSpec((SUB, LANES),
                         lambda i, s, w, b, n: (w[i * nsub + s], 0)),
            pl.BlockSpec((1, SUB, LANES), _cidx_map(nsub)),
            pl.BlockSpec((1, BLK64, LANES),
                         lambda i, s, w, b, n: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BLK64, LANES),
                               lambda i, s, w, b, n: (i, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), src2d.dtype),
        interpret=interpret,
    )(wsel, base, nact, src2d, cidx.reshape(-1, SUB, LANES), meta)


def _cidx_map(nsub):
    """Block index of the compact cidx stream for (step i, subop s): the
    step's active blocks are base[i]..base[i]+nact[i]-1; idle subops
    repeat the last active block (revolving buffer skips the DMA)."""
    def m(i, s, w, b, n):
        return (jnp.maximum(b[i] + jnp.minimum(s, n[i] - 1), 0), 0, 0)
    return m


def _windowed_gather_call(src2d, wsel, base, nact, cidx, meta, weights,
                          fill, out_rows: int, nsub: int,
                          mul_kind: str = "none", interpret: bool = False,
                          full_rows: int = 0, step_offset: int = 0,
                          carry=None):
    """Run the windowed-gather kernel.

    src2d:   (S, 128) source table (S multiple of 8).
    wsel:    (nsteps*nsub,) int32 window block index (8-row units) per
             (step, subop); repeats the previous value on idle subops so
             the revolving input buffer skips the DMA.
    base:    (nsteps,) int32 exclusive cumsum of nact (compact cidx base).
    nact:    (nsteps,) int32 active subop count per step.
    cidx:    (sum(nact), 8, 128) int8 source-lane index per window slot —
             compact: active (step, subop) pairs only.
    meta:    (nsteps, 8, 128) uint8 per output slot: j(3 bits)|sid(5 bits);
             sid=31 marks an invalid slot (filled with ``fill``).
    weights: (nsteps, 8, 128) value-dtype ⊗-operand stream or None.
    Returns (out_rows, 128) of src2d.dtype.
    """
    nsteps = out_rows // SUB
    has_w = weights is not None
    has_carry = carry is not None
    kern = functools.partial(_wg_body, nsub, mul_kind, fill, has_w,
                             has_carry)
    cidx3 = cidx.reshape(-1, SUB, LANES)
    in_specs = [
        pl.BlockSpec((SUB, LANES),
                     lambda i, s, w, b, n: (w[i * nsub + s], 0)),
        pl.BlockSpec((1, SUB, LANES), _cidx_map(nsub)),
        pl.BlockSpec((1, SUB, LANES), lambda i, s, w, b, n: (i, 0, 0)),
    ]
    if has_w:
        wstream = weights
        in_specs.append(
            pl.BlockSpec((1, SUB, LANES), lambda i, s, w, b, n: (i, 0, 0)))
    else:
        wstream = jnp.zeros((1, SUB, LANES), src2d.dtype)
        # idle weight stream: constant index map keeps one resident block
        in_specs.append(
            pl.BlockSpec((1, SUB, LANES), lambda i, s, w, b, n: (0, 0, 0)))
    rows_total = full_rows if full_rows else out_rows
    off = step_offset
    args = [wsel, base, nact, src2d, cidx3, meta, wstream]
    if has_carry:
        # the carry is the same buffer, aliased to the output: this
        # segment only rewrites its own row range (offset out_specs)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(carry)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps, nsub),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SUB, LANES),
                               lambda i, s, w, b, n: (i + off, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), src2d.dtype),
        input_output_aliases={7: 0} if has_carry else {},
        interpret=interpret,
    )(*args)
