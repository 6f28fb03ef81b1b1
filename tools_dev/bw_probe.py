"""HBM streaming-bandwidth probe (the round-5 ceiling experiment).

Measures pure HBM->HBM streaming through Pallas copy kernels across
block geometries, plus two calibration rows (XLA elementwise, multi-
stream reduction), to pin the real single-chip streaming ceiling that
the panel pipeline's cost model uses (docs/KERNEL_NOTES.md, "Round-5
findings").  The round-2 "~35 GB/s ceiling" came from measuring with
(8,128) blocks only — this probe exists so that number can never be
trusted again without a table behind it.

Method: arrays of ~268 MB (f32), each timed region chains NCHAIN
dependent kernel calls (y = copy(y)) under one jit so per-dispatch
overhead amortizes; GB/s counts read+write bytes (2 x nbytes x NCHAIN).

Usage: python tools_dev/bw_probe.py            # full table
       python tools_dev/bw_probe.py quick      # small subset

Reference analog: the per-format memory-bandwidth accounting of the
singlenode lab (csc_spmv.hpp:222-228) — here the roofline side of it.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MB = 1 << 20
TARGET_BYTES = 268 * MB
NCHAIN = 8


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)          # compile + warm
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def copy_1d(rows_per_block, lanes, dtype=jnp.float32):
    """1D grid: (rows, lanes) array, block (rows_per_block, lanes)."""
    isz = np.dtype(dtype).itemsize
    rows = TARGET_BYTES // (lanes * isz)
    rows -= rows % rows_per_block
    x = jnp.ones((rows, lanes), dtype)
    call = pl.pallas_call(
        _copy_kernel,
        grid=(rows // rows_per_block,),
        in_specs=[pl.BlockSpec((rows_per_block, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows_per_block, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), dtype))

    @jax.jit
    def chained(x):
        for _ in range(NCHAIN):
            x = call(x)
        return x

    dt = _time(chained, x)
    return 2 * x.nbytes * NCHAIN / dt / 1e9


def copy_2d(bm, bn, dtype=jnp.float32):
    """2D grid over a square-ish array with (bm, bn) blocks."""
    isz = np.dtype(dtype).itemsize
    n = 8192
    m = TARGET_BYTES // (n * isz)
    m -= m % bm
    assert n % bn == 0
    x = jnp.ones((m, n), dtype)
    call = pl.pallas_call(
        _copy_kernel,
        grid=(m // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, bn), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), dtype))

    @jax.jit
    def chained(x):
        for _ in range(NCHAIN):
            x = call(x)
        return x

    dt = _time(chained, x)
    return 2 * x.nbytes * NCHAIN / dt / 1e9


def xla_elementwise():
    rows = TARGET_BYTES // (1024 * 4)
    x = jnp.ones((rows, 1024), jnp.float32)

    @jax.jit
    def chained(x):
        for _ in range(NCHAIN):
            x = x + 1.0
        return x

    dt = _time(chained, x)
    return 2 * x.nbytes * NCHAIN / dt / 1e9


def multi_stream_sum(nstreams, rows_per_block=64, lanes=1024):
    """nstreams input streams summed to one output — measures whether
    concurrent DMA streams aggregate beyond the single-stream rate."""
    rows = TARGET_BYTES // (lanes * 4 * nstreams)
    rows -= rows % rows_per_block
    xs = [jnp.full((rows, lanes), float(i + 1)) for i in range(nstreams)]

    def kern(*refs):
        o = refs[-1]
        acc = refs[0][...]
        for r in refs[1:-1]:
            acc = acc + r[...]
        o[...] = acc

    spec = pl.BlockSpec((rows_per_block, lanes), lambda i: (i, 0))
    call = pl.pallas_call(
        kern, grid=(rows // rows_per_block,),
        in_specs=[spec] * nstreams, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32))

    @jax.jit
    def chained(*xs):
        y = call(*xs)
        for _ in range(NCHAIN - 1):
            y = call(y, *xs[1:])
        return y

    dt = _time(chained, *xs)
    nbytes = (nstreams + 1) * xs[0].nbytes * NCHAIN
    return nbytes / dt / 1e9


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    rows = [("XLA elementwise x+1", xla_elementwise())]
    for rb in (8, 64, 256, 1024) if not quick else (8, 256):
        rows.append((f"pallas copy 1D ({rb},1024)", copy_1d(rb, 1024)))
    for bm, bn in ((8, 128), (64, 128), (256, 128), (256, 512),
                   (512, 1024)) if not quick else ((8, 128), (256, 512)):
        rows.append((f"pallas copy 2D ({bm},{bn})", copy_2d(bm, bn)))
    if not quick:
        rows.append(("pallas copy int8 (64,1024) byte rate",
                     copy_1d(64, 1024, jnp.int8)))
        rows.append(("2-stream sum -> 1 out (64,1024)", multi_stream_sum(2)))
        rows.append(("4-stream sum -> 1 out (64,1024)", multi_stream_sum(4)))
    print(f"{'config':44s}  GB/s (read+write)")
    for name, gbs in rows:
        print(f"{name:44s}  {gbs:7.1f}")


if __name__ == "__main__":
    main()
