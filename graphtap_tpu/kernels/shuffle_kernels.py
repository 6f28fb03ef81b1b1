"""Pallas kernels for the static-shuffle SpMV pipeline.

Three kernels driven entirely by host-precomputed plans
(kernels/shuffle_plan.py): no scatter, no dynamic gather from large
tables — only streaming block I/O, dynamic single-row VMEM reads/writes,
lane crossbars (take_along_axis → tpu.dynamic_gather), and masked merges.

  expand_kernel : x (VMEM-resident) → per-edge contributions,
                  column-sorted edge stream. Replaces the XLA `jnp.take`
                  x-gather (measured 0.12 Gelem/s) with window reads +
                  crossbars.
  group_kernel  : in-VMEM stable radix passes regrouping the contribution
                  stream by destination 128-row block, per VMEM-sized
                  "super". Replaces scatter/sort.
  reduce_kernel : blocked one-hot ⊕-fold of the grouped stream into the
                  compact row space (variant of kernels/pallas_spmv.py
                  with validity masks and per-chunk row-block targeting).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8
WROWS = 64


# --------------------------------------------------------------------------
# expand
# --------------------------------------------------------------------------

def _expand_body(mul_kind, fill,
                 grp_ref, win_ref, slot_ref, lane_ref, ev_ref, w_ref,
                 out_ref):
    # win_ref: (1, 8, 128) — this step's 1024-column window of x, chosen
    # by the prefetch-driven index_map. No scalar reads, no dynamic
    # slicing: per sub-row j, broadcast window row j and lane-crossbar it.
    lane32 = lane_ref[:, :].astype(jnp.int32)
    slot = slot_ref[:, :].astype(jnp.int32)
    acc = jnp.zeros((SUB, LANES), dtype=out_ref.dtype)
    for j in range(WROWS):
        wj = jnp.broadcast_to(win_ref[0, j:j + 1, :], (SUB, LANES))
        g = jnp.take_along_axis(wj, lane32, axis=1)
        acc = jnp.where(slot == j, g, acc)
    ev = ev_ref[:, :].astype(jnp.int32) != 0
    if mul_kind == "mul":
        acc = acc * w_ref[:, :]
    elif mul_kind == "add_sat":
        # min-plus ⊗: guard the INF sentinel (reference: sssp.h:49-56)
        acc = jnp.where(acc >= jnp.asarray(fill, acc.dtype),
                        jnp.asarray(fill, acc.dtype), acc + w_ref[:, :])
    out_ref[:, :] = jnp.where(ev, acc, jnp.asarray(fill, out_ref.dtype))


def expand_stream(x3d, grp, slot, lane, evalid, weights, fill,
                  mul_kind=None, interpret=False):
    """Run the expand kernel.

    x3d: (Sx3, 64, 128) table (x reshaped into 8192-column windows);
    grp: (nsteps,) int32 window id per 8-row output step (scalar
    prefetch); slot/lane: (out_rows, 128) int8 sub-row / lane of each
    edge's column within its step's window; evalid: (out_rows, 128) int8;
    weights: (out_rows, 128) or None. mul_kind: None | 'mul' | 'add_sat'.
    Returns contrib (out_rows, 128).
    """
    out_rows = slot.shape[0]
    nsteps = out_rows // SUB
    has_w = weights is not None
    if mul_kind is None:
        mul_kind = "mul" if has_w else "none"
    kern = functools.partial(_expand_body, mul_kind, fill)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, WROWS, LANES), lambda i, g: (g[i], 0, 0)),
            pl.BlockSpec((SUB, LANES), lambda i, g: (i, 0)),
            pl.BlockSpec((SUB, LANES), lambda i, g: (i, 0)),
            pl.BlockSpec((SUB, LANES), lambda i, g: (i, 0)),
            pl.BlockSpec((SUB, LANES),
                         (lambda i, g: (i, 0)) if has_w else
                         (lambda i, g: (0, 0))),
        ],
        out_specs=pl.BlockSpec((SUB, LANES), lambda i, g: (i, 0)),
    )
    args = [grp, x3d, slot, lane, evalid,
            weights if has_w else jnp.zeros((SUB, LANES), x3d.dtype)]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), x3d.dtype),
        interpret=interpret,
    )(*args)


# --------------------------------------------------------------------------
# group (in-VMEM radix passes per super)
# --------------------------------------------------------------------------

def _group_pass_body(smax, dst_ref, in_ref, idx_ref, out_ref):
    """One radix pass over one super: per 8-row source vreg, one lane
    crossbar per fragment slot, masked-merged into prefetch-addressed
    destination rows of the output (the proven reduce-kernel pattern:
    dynamic row writes driven by SMEM-prefetched scalars only)."""
    k8 = pl.program_id(0)
    rows8 = in_ref[:, :]                                   # (8,128)
    for j in range(smax):
        raw = idx_ref[:, j * LANES:(j + 1) * LANES].astype(jnp.int32)
        m8 = raw >= 0
        idx8 = jnp.maximum(raw, 0)
        g8 = jnp.take_along_axis(rows8, idx8, axis=1)
        for i in range(SUB):
            d = dst_ref[(k8 * SUB + i) * smax + j]

            @pl.when(d >= 0)
            def _():
                cur = out_ref[pl.ds(d, 1), :]
                out_ref[pl.ds(d, 1), :] = jnp.where(
                    m8[i:i + 1, :], g8[i:i + 1, :], cur)


def group_stream(contrib, frag_dst, frag_idx,
                 rows_per_super: int, npasses: int, rchunk: int = 64,
                 interpret=False):
    """Regroup the contribution stream by destination row block.

    contrib: (total_rows, 128); frag_dst: (nsupers, npasses, rps, SMAX)
    int32 (-1 = idle slot); frag_idx: (nsupers, npasses, rps, SMAX*128)
    int8 (-1 = unwritten lane). One pallas_call per (super, pass); the
    whole super stays in HBM↔VMEM streamed blocks. Returns the regrouped
    stream (holes contain garbage — masked by the reduce plan's evalid).
    """
    nsupers = frag_dst.shape[0]
    smax = frag_dst.shape[3]
    rps = rows_per_super
    kern = functools.partial(_group_pass_body, smax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rps // SUB,),
        in_specs=[
            pl.BlockSpec((SUB, LANES), lambda k, d: (k, 0)),
            pl.BlockSpec((SUB, smax * LANES), lambda k, d: (k, 0)),
        ],
        out_specs=pl.BlockSpec((rps, LANES), lambda k, d: (0, 0)),
    )

    def one(args):
        sup_in, dst, idx = args
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rps, LANES), contrib.dtype),
            interpret=interpret,
        )(dst.reshape(-1), sup_in, idx)

    buf = contrib.reshape(nsupers, rps, LANES)
    for p in range(npasses):
        # one kernel lowering, executed per super on device (lax.map)
        buf = jax.lax.map(one, (buf, frag_dst[:, p], frag_idx[:, p]))
    return buf.reshape(nsupers * rps, LANES)


# --------------------------------------------------------------------------
# reduce (grouped stream -> compact y)
# --------------------------------------------------------------------------

def _reduce_body(reduce_kind, identity, rows_per_chunk,
                 cb_ref, c_ref, lr_ref, ev_ref, y_ref):
    ci = pl.program_id(0)
    cb = cb_ref[ci]

    @pl.when(ci == 0)
    def _():
        y_ref[...] = jnp.full_like(y_ref, identity)

    c = c_ref[:].reshape(-1, 1)
    lr = lr_ref[:].astype(jnp.int32).reshape(-1, 1)
    ev = ev_ref[:].astype(jnp.int32).reshape(-1, 1) != 0
    n = c.shape[0]
    lanes = lax.broadcasted_iota(jnp.int32, (n, LANES), 1)
    hit = (lr == lanes) & ev
    vals = jnp.where(hit, c, jnp.asarray(identity, c_ref.dtype))
    if reduce_kind == "sum":
        part = jnp.sum(jnp.where(hit, c, 0), axis=0, keepdims=True)
        y_ref[pl.ds(cb, 1), :] = y_ref[pl.ds(cb, 1), :] + part
    elif reduce_kind == "min":
        part = jnp.min(vals, axis=0, keepdims=True)
        y_ref[pl.ds(cb, 1), :] = jnp.minimum(y_ref[pl.ds(cb, 1), :], part)
    else:
        part = jnp.max(vals, axis=0, keepdims=True)
        y_ref[pl.ds(cb, 1), :] = jnp.maximum(y_ref[pl.ds(cb, 1), :], part)


def grouped_reduce(contrib, lr, evalid, chunk_block, nblocks: int,
                   reduce_kind: str, identity, rows_per_chunk: int = 8,
                   interpret=False):
    """⊕-fold a row-block-grouped stream into (nblocks, 128).

    contrib/lr/evalid: (total_rows, 128); chunk_block: (nchunks,) int32,
    one entry per ``rows_per_chunk`` stream rows, all of whose valid lanes
    target that 128-row block.
    """
    nchunks = chunk_block.shape[0]
    chunk_el = rows_per_chunk * LANES
    kern = functools.partial(_reduce_body, reduce_kind, identity,
                             rows_per_chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((chunk_el,), lambda i, cb: (i,)),
            pl.BlockSpec((chunk_el,), lambda i, cb: (i,)),
            pl.BlockSpec((chunk_el,), lambda i, cb: (i,)),
        ],
        out_specs=pl.BlockSpec((nblocks, LANES), lambda i, cb: (0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, LANES), contrib.dtype),
        interpret=interpret,
    )(chunk_block, contrib.reshape(-1), lr.reshape(-1),
      evalid.reshape(-1))
