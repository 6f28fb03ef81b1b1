"""Device-stacked shuffle-SpMV plans and the shard_map-local SpMV.

Bridges the static planner (shuffle_plan.py) and kernels
(shuffle_kernels.py) into the engine: builds one SpmvPlan per device from
a TileSet, normalizes shapes across devices (shard_map runs one program),
stacks the plan arrays with a leading device axis, and exposes
``spmv_local`` — the per-device SpMV used inside the jitted superstep.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from graphtap_tpu.format.tiles import TileSet
from graphtap_tpu.kernels.semiring import Semiring
from graphtap_tpu.kernels.shuffle_plan import (build_spmv_plan,
                                               plan_monotone_expand,
                                               LANES, RED_ROWS)
from graphtap_tpu.kernels.shuffle_kernels import (expand_stream,
                                                  group_stream,
                                                  grouped_reduce)


@dataclass
class ShufflePlans:
    """Static meta + device-stacked plan arrays (dict of (D, ...) numpy)."""
    NWIN: int
    total_rows: int
    rows_per_super: int
    nsupers: int
    npasses: int
    SMAX: int
    nblocks: int
    NR: int
    NC: int
    has_w: bool
    mexp_rows: int           # dense-expand output rows (C*L/128)
    arrays: Dict[str, np.ndarray]

    def device_arrays(self, mesh):
        from graphtap_tpu.parallel.multihost import put_device_stacked
        return {k: put_device_stacked(a, mesh)
                for k, a in self.arrays.items()}


def build_shuffle_plans(tiles: TileSet, value_dtype=np.float32,
                        nwin: int = 8, rows_per_super: int = 4096
                        ) -> ShufflePlans:
    part = tiles.part
    D = part.D
    NR, NC = tiles.NR, part.tile_cols

    def _build(b, rps_, force_np=None):
        n = int(tiles.nnz[b, 0])
        r = tiles.rows[b, :n].astype(np.int64)
        c = tiles.cols[b, :n].astype(np.int64)
        w = (tiles.weights[b, :n] if tiles.weights is not None else None)
        return build_spmv_plan(r, c, w, NR, NC, nwin=nwin,
                               rows_per_super=rps_,
                               value_dtype=value_dtype,
                               force_npasses=force_np)

    plans = [_build(b, rows_per_super) for b in range(D)]
    # shard_map runs ONE program: normalize super size (a hub-heavy device
    # may have escalated) then pass count (extra passes are identity)
    rps = max(p.rows_per_super for p in plans)
    plans = [p if p.rows_per_super == rps else _build(b, rps)
             for b, p in enumerate(plans)]
    npasses = max(p.npasses for p in plans)
    plans = [p if p.npasses == npasses else _build(b, rps, npasses)
             for b, p in enumerate(plans)]
    nsupers = max(p.nsupers for p in plans)
    smax = max(p.SMAX for p in plans)
    total_rows = nsupers * rps

    def pad_to(a, shape, fill):
        out = np.full(shape, fill, dtype=a.dtype)
        sl = tuple(slice(0, s) for s in a.shape)
        out[sl] = a
        return out

    has_w = tiles.weights is not None
    arrs = {k: [] for k in ("grp", "slot", "lane", "ev_x", "w_stream",
                            "frag_dst", "frag_idx", "chunk_block", "lr",
                            "ev_r", "mexp_grp_a", "mexp_grp_b",
                            "mexp_slot_a", "mexp_slot_b", "mexp_lane",
                            "mexp_ev_a", "mexp_ev_b")}
    mexp_rows = part.tile_rows // LANES
    from graphtap_tpu.kernels.shuffle_plan import SUB
    for b, p in enumerate(plans):
        arrs["grp"].append(pad_to(p.grp, (total_rows // SUB,), 0))
        arrs["slot"].append(pad_to(p.slot, (total_rows, LANES), 0))
        arrs["lane"].append(pad_to(p.lane, (total_rows, LANES), 0))
        arrs["ev_x"].append(pad_to(p.ev_x, (total_rows, LANES), 0))
        if has_w:
            arrs["w_stream"].append(
                pad_to(p.w_stream, (total_rows, LANES), 0))
        arrs["frag_dst"].append(pad_to(
            p.frag_dst, (nsupers, npasses, rps, smax), -1))
        arrs["frag_idx"].append(pad_to(
            p.frag_idx, (nsupers, npasses, rps, smax * LANES), -1))
        arrs["chunk_block"].append(pad_to(
            p.chunk_block, (total_rows // RED_ROWS,), 0))
        arrs["lr"].append(pad_to(p.lr, (total_rows, LANES), 0))
        arrs["ev_r"].append(pad_to(p.ev_r, (total_rows, LANES), 0))
        mp = plan_monotone_expand(tiles.iv_dense[b].astype(np.int64))
        arrs["mexp_grp_a"].append(mp.grp_a)
        arrs["mexp_grp_b"].append(mp.grp_b)
        arrs["mexp_slot_a"].append(mp.slot_a)
        arrs["mexp_slot_b"].append(mp.slot_b)
        arrs["mexp_lane"].append(mp.lane)
        arrs["mexp_ev_a"].append(mp.ev_a)
        arrs["mexp_ev_b"].append(mp.ev_b)
        mexp_rows = mp.out_rows
    if not has_w:
        del arrs["w_stream"]
    arrays = {k: np.stack(v) for k, v in arrs.items()}
    return ShufflePlans(
        NWIN=nwin, total_rows=total_rows, rows_per_super=rps,
        nsupers=nsupers, npasses=npasses, SMAX=smax,
        nblocks=plans[0].nblocks, NR=NR, NC=NC, has_w=has_w,
        mexp_rows=mexp_rows, arrays=arrays)


def spmv_local(x, t: Dict, meta: ShufflePlans, semiring: Semiring,
               dense_len: int, interpret: bool = False):
    """Per-device SpMV inside shard_map: x (NC,) → y_dense (dense_len,).

    ``t`` holds the LOCAL plan slices (leading device axis already
    dropped)."""
    from graphtap_tpu.kernels.shuffle_plan import SUB, WROWS
    fill = semiring.identity
    if semiring.reduce_kind == "sum":
        mul_kind = "mul" if meta.has_w else "none"
    else:
        mul_kind = "add_sat" if meta.has_w else "none"
    win = WROWS * LANES
    sx3 = -(-x.shape[0] // win)
    xp = jnp.concatenate(
        [x, jnp.full((sx3 * win - x.shape[0],), fill, x.dtype)]) \
        if sx3 * win != x.shape[0] else x
    x3d = xp.reshape(sx3, WROWS, LANES)
    contrib = expand_stream(
        x3d, t["grp"], t["slot"], t["lane"], t["ev_x"],
        t.get("w_stream"), fill, mul_kind=mul_kind, interpret=interpret)
    grouped = group_stream(
        contrib, t["frag_dst"], t["frag_idx"],
        meta.rows_per_super, meta.npasses, rchunk=64, interpret=interpret)
    y_blocks = grouped_reduce(
        grouped, t["lr"], t["ev_r"], t["chunk_block"], meta.nblocks,
        semiring.reduce_kind, fill, rows_per_chunk=RED_ROWS,
        interpret=interpret)
    # compact -> dense row block: two monotone-expand passes (each
    # 8-dense-row step reads at most two 1024-entry windows)
    yflat = y_blocks.reshape(-1)
    ntab = -(-yflat.shape[0] // win) + 1
    ytab = jnp.concatenate(
        [yflat, jnp.full((ntab * win - yflat.shape[0],), fill,
                         yflat.dtype)]).reshape(ntab, WROWS, LANES)
    ya = expand_stream(ytab, t["mexp_grp_a"], t["mexp_slot_a"],
                       t["mexp_lane"], t["mexp_ev_a"], None, fill,
                       mul_kind="none", interpret=interpret)
    yb = expand_stream(ytab, t["mexp_grp_b"], t["mexp_slot_b"],
                       t["mexp_lane"], t["mexp_ev_b"], None, fill,
                       mul_kind="none", interpret=interpret)
    y_dense = jnp.where(t["mexp_ev_b"].astype(jnp.int32) != 0, yb, ya)
    return y_dense.reshape(-1)[:dense_len]
