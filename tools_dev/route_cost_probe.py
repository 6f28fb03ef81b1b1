"""Route-kernel cost-model probe (the round-5 per-grid-step experiment).

The panel pipeline's route kernels fetch ``nwin`` prefetched-base
(8,128) stripe windows per grid step and emit one (64,128) panel.  This
probe isolates that access pattern on synthetic data to answer two
questions the cost model depends on (docs/KERNEL_NOTES.md, "Route-kernel
cost model"):

  * what does one grid step COST as a function of nwin (fixed floor vs
    marginal window)?
  * does window LOCALITY matter (all panels reading the same bases vs
    uniformly random bases)?

Findings feeding the round-5 rework: ~60 ns per STREAM per grid step of
DMA bookkeeping (hence packing the four plan arrays into one uint8
stream), marginal window ~30 ns, locality irrelevant (revolving window
buffers hide it).

Usage: python tools_dev/route_cost_probe.py [npanels]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIPE, LANES, PROWS = 8, 128, 64
XBLOCKS = 4096          # source table: 4096 stripe blocks (16 MB f32)


def _body(nwin, bases_ref, *refs):
    out_ref = refs[-1]
    acc = refs[0][...]
    for t in range(1, nwin):
        acc = acc + refs[t][...]
    out_ref[...] = jnp.tile(acc, (PROWS // STRIPE, 1))


def route_like(x2d, bases, npanels, nwin):
    kern = functools.partial(_body, nwin)

    def mk_spec(t):
        return pl.BlockSpec((STRIPE, LANES),
                            lambda i, b, t=t: (b[i * nwin + t], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npanels,),
        in_specs=[mk_spec(t) for t in range(nwin)],
        out_specs=pl.BlockSpec((PROWS, LANES), lambda i, b: (i, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npanels * PROWS, LANES),
                                       x2d.dtype))(bases, x2d)


def measure(npanels, nwin, mode="random"):
    x = jnp.ones((XBLOCKS * STRIPE, LANES), jnp.float32)
    rng = np.random.default_rng(7)
    if mode == "same":
        b = np.zeros((npanels * nwin,), np.int32)
    else:
        b = rng.integers(0, XBLOCKS, size=npanels * nwin).astype(np.int32)
    bases = jnp.asarray(b)
    f = jax.jit(functools.partial(route_like, npanels=npanels, nwin=nwin))
    jax.block_until_ready(f(x, bases))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x, bases))
    dt = time.perf_counter() - t0
    return dt / npanels * 1e6        # us per panel


def main():
    npanels = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    print(f"{'nwin':>5s}  us/panel  (npanels={npanels}, random bases)")
    for nwin in (4, 12, 20, 31):
        print(f"{nwin:5d}  {measure(npanels, nwin):8.2f}")
    same = measure(npanels, 20, mode="same")
    rand = measure(npanels, 20, mode="random")
    print(f"bases all-same vs random at nwin=20: {same:.2f} vs {rand:.2f} "
          f"us/panel (locality effect)")


if __name__ == "__main__":
    main()
