"""Pallas TPU kernel: blocked one-hot segment reduction for SpMV.

The production ⊕-fold `y[row] ⊕= contrib[e]` over row-sorted edges
(the reference's serial inner loop, vertex_program.hpp:1162-1185) as a
Pallas kernel:

* Edges are regrouped host-side by **row block** (RB = 128 destination
  rows per block, the TPU lane width); each block's edge list is padded to
  a multiple of the chunk size. Chunks of the same block are consecutive.
* The kernel grid walks chunks. The output BlockSpec maps every chunk to
  its row block via a scalar-prefetched ``chunk_block`` array, so the
  y-block stays resident in VMEM while its chunks stream through
  (Pallas revisiting-output accumulation).
* Per chunk, the fold is a one-hot select + axis reduction on the VPU:
  ``y[j] ⊕= ⊕_e where(lrow[e] == j, contrib[e], id)`` — no scatter, no
  gather, fully vectorized over (CHUNK, RB) registers.

The x-gather and ⊗ happen outside in XLA (``edge_contributions``); this
kernel only reduces. It handles any semiring via the ⊕/identity pair
(sum, min, max).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphtap_tpu.kernels.semiring import Semiring

RB = 128          # rows per block = lane width
CHUNK = 2048      # edges per grid step


@dataclass
class PallasPlan:
    """Host-side edge regrouping for the blocked kernel (per device).

    Arrays are device-stacked (leading D axis) like TileSet fields.
    """
    Ep: int                   # padded edge-array length (multiple of CHUNK)
    nblocks: int              # number of RB-row blocks (NR rounded up)
    nchunks: int              # Ep // CHUNK
    lrows: np.ndarray         # (D, Ep) int32 row offset within block [0, RB)
    cols: np.ndarray          # (D, Ep) int32 local col (for the x gather)
    weights: Optional[np.ndarray]  # (D, Ep) or None
    evalid: np.ndarray        # (D, Ep) bool — real edge vs block padding
    chunk_block: np.ndarray   # (D, nchunks) int32 row block of each chunk


def build_pallas_plan(rows: np.ndarray, cols: np.ndarray,
                      weights: Optional[np.ndarray], nnz: np.ndarray,
                      NR: int) -> PallasPlan:
    """Regroup per-device row-sorted edge arrays into block-chunked form.

    ``rows``/``cols``/``weights``: (D, Ep_in); ``nnz``: (D, 1) valid counts.
    """
    D = rows.shape[0]
    nblocks = -(-NR // RB)
    per_dev = []
    max_len = 1
    for b in range(D):
        n = int(nnz[b, 0])
        r = rows[b, :n].astype(np.int64)
        blk = r // RB
        # pad each block's edge run to a multiple of CHUNK
        counts = np.bincount(blk, minlength=nblocks)
        padded = ((counts + CHUNK - 1) // CHUNK) * CHUNK
        # blocks with zero edges get zero chunks
        total = int(padded.sum())
        max_len = max(max_len, total)
        per_dev.append((n, r, blk, counts, padded))

    Ep = ((max_len + CHUNK - 1) // CHUNK) * CHUNK
    nchunks = Ep // CHUNK

    lrows = np.zeros((D, Ep), dtype=np.int32)
    cols_out = np.zeros((D, Ep), dtype=np.int32)
    w_out = np.zeros((D, Ep), dtype=weights.dtype) if weights is not None else None
    evalid = np.zeros((D, Ep), dtype=bool)
    chunk_block = np.zeros((D, nchunks), dtype=np.int32)

    for b in range(D):
        n, r, blk, counts, padded = per_dev[b]
        starts_in = np.concatenate([[0], np.cumsum(counts)])
        starts_out = np.concatenate([[0], np.cumsum(padded)])
        # vectorized placement: output position of edge e
        pos = starts_out[blk] + (np.arange(n) - starts_in[blk])
        lrows[b, pos] = (r % RB).astype(np.int32)
        cols_out[b, pos] = cols[b, :n]
        if w_out is not None:
            w_out[b, pos] = weights[b, :n]
        evalid[b, pos] = True
        # chunk -> block map; trailing (all-padding) chunks point at the
        # last real block and contribute identity
        nch = (padded // CHUNK)
        cb = np.repeat(np.arange(nblocks), nch)
        chunk_block[b, :cb.size] = cb
        if cb.size < nchunks:
            chunk_block[b, cb.size:] = cb[-1] if cb.size else 0

    return PallasPlan(Ep=Ep, nblocks=nblocks, nchunks=nchunks,
                      lrows=lrows, cols=cols_out, weights=w_out,
                      evalid=evalid, chunk_block=chunk_block)


def _reduce_kernel(reduce_kind, identity, cb_ref, contrib_ref, lrows_ref,
                   y_ref):
    ci = pl.program_id(0)
    cb = cb_ref[ci]

    # The whole y lives in VMEM for the duration of the grid; zero it once.
    @pl.when(ci == 0)
    def _():
        y_ref[...] = jnp.full_like(y_ref, identity)

    c = contrib_ref[:].reshape(CHUNK, 1)              # (CHUNK, 1)
    lr = lrows_ref[:].reshape(CHUNK, 1)               # (CHUNK, 1)
    lanes = lax.broadcasted_iota(jnp.int32, (CHUNK, RB), 1)
    onehot = lr == lanes                              # (CHUNK, RB)
    vals = jnp.where(onehot, c, identity)
    if reduce_kind == "sum":
        part = jnp.sum(vals, axis=0, keepdims=True)   # (1, RB)
        y_ref[pl.ds(cb, 1), :] = y_ref[pl.ds(cb, 1), :] + part
    elif reduce_kind == "min":
        part = jnp.min(vals, axis=0, keepdims=True)
        y_ref[pl.ds(cb, 1), :] = jnp.minimum(y_ref[pl.ds(cb, 1), :], part)
    else:
        part = jnp.max(vals, axis=0, keepdims=True)
        y_ref[pl.ds(cb, 1), :] = jnp.maximum(y_ref[pl.ds(cb, 1), :], part)


@functools.partial(jax.jit, static_argnames=("nblocks", "nchunks",
                                             "reduce_kind", "identity",
                                             "interpret"))
def _pallas_reduce(contrib, lrows, chunk_block, nblocks: int, nchunks: int,
                   reduce_kind: str, identity, interpret: bool = False):
    kern = functools.partial(_reduce_kernel, reduce_kind, identity)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i, cb: (i,)),
            pl.BlockSpec((CHUNK,), lambda i, cb: (i,)),
        ],
        # whole output resident in VMEM; rows written by dynamic slice
        out_specs=pl.BlockSpec((nblocks, RB), lambda i, cb: (0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, RB), contrib.dtype),
        interpret=interpret,
    )(chunk_block, contrib, lrows)


def pallas_segment_reduce(contrib: jnp.ndarray, lrows: jnp.ndarray,
                          chunk_block: jnp.ndarray, nblocks: int,
                          NR: int, semiring: Semiring,
                          interpret: bool = False) -> jnp.ndarray:
    """⊕-fold chunked contributions into the compact row space (NR,)."""
    y = _pallas_reduce(contrib, lrows, chunk_block, nblocks,
                       chunk_block.shape[0],
                       semiring.reduce_kind,
                       float(semiring.identity)
                       if jnp.issubdtype(contrib.dtype, jnp.floating)
                       else int(semiring.identity),
                       interpret=interpret)
    return y.reshape(-1)[:NR]
