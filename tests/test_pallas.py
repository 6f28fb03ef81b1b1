"""Pallas kernel tests (interpreter mode on CPU; the real-chip run is
exercised by bench.py and the kernel lab)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from graphtap_tpu.kernels.semiring import plus_times, min_select, INF_I32
from graphtap_tpu.kernels.pallas_spmv import (build_pallas_plan,
                                              pallas_segment_reduce, RB, CHUNK)


def _plan_and_truth(rng, NR, E, dtype, reduce_kind):
    rows = np.sort(rng.integers(0, NR, E)).astype(np.int32)
    vals = (rng.random(E).astype(np.float32) if dtype == np.float32
            else rng.integers(0, 1000, E).astype(np.int32))
    # ground truth
    if reduce_kind == "sum":
        truth = np.zeros(NR, dtype=np.float64)
        np.add.at(truth, rows, vals)
    else:
        truth = np.full(NR, INF_I32, dtype=np.int64)
        np.minimum.at(truth, rows, vals)
    # plan built from device-stacked arrays (D=1)
    cols = np.zeros(E, dtype=np.int32)
    plan = build_pallas_plan(rows[None], cols[None], None,
                             np.array([[E]], np.int32), NR)
    return plan, vals, rows, truth


def test_plan_layout():
    rng = np.random.default_rng(0)
    NR, E = 1000, 30000
    plan, vals, rows, _ = _plan_and_truth(rng, NR, E, np.float32, "sum")
    assert plan.Ep % CHUNK == 0
    assert plan.evalid[0].sum() == E
    # every valid edge's block must equal its chunk's block
    blk_of_edge = np.repeat(plan.chunk_block[0], CHUNK)
    lr = plan.lrows[0]
    v = plan.evalid[0]
    # reconstruct global rows and compare as multisets
    rec = blk_of_edge[v] * RB + lr[v]
    np.testing.assert_array_equal(np.sort(rec), np.sort(rows))


@pytest.mark.parametrize("reduce_kind", ["sum", "min"])
def test_pallas_reduce_interpret(reduce_kind):
    rng = np.random.default_rng(1)
    NR, E = 1000, 30000
    dtype = np.float32 if reduce_kind == "sum" else np.int32
    plan, vals, rows, truth = _plan_and_truth(rng, NR, E, dtype, reduce_kind)
    sem = plus_times() if reduce_kind == "sum" else min_select()

    # scatter values into the plan's chunked layout
    contrib = np.full(plan.Ep, sem.identity,
                      dtype=dtype)
    blk = rows.astype(np.int64) // RB
    counts = np.bincount(blk, minlength=plan.nblocks)
    padded = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    starts_in = np.concatenate([[0], np.cumsum(counts)])
    starts_out = np.concatenate([[0], np.cumsum(padded)])
    pos = starts_out[blk] + (np.arange(E) - starts_in[blk])
    contrib[pos] = vals

    with pltpu.force_tpu_interpret_mode():
        y = pallas_segment_reduce(
            jnp.asarray(contrib), jnp.asarray(plan.lrows[0]),
            jnp.asarray(plan.chunk_block[0]), plan.nblocks, NR, sem)
    y = np.asarray(y)
    if reduce_kind == "sum":
        np.testing.assert_allclose(y, truth.astype(np.float32), rtol=1e-4)
    else:
        np.testing.assert_array_equal(y, truth.astype(np.int32))
