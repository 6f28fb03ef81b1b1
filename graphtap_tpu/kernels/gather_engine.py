"""Device-stacked v2 gather-pipeline plans and the shard_map-local SpMV.

Bridges the v2 planner (gather_plan.py) and the windowed-gather kernel
(gather_kernels.py) into the engine: builds one Spmv2Plan per device from
a TileSet, normalizes shapes across devices (shard_map runs one program),
stacks the plan arrays with a leading device axis, and exposes
``spmv2_local`` — the per-device SpMV used inside the jitted superstep.

Pipeline per device (see gather_plan.py):
  x → expand → radix pass 0..3 → compare-fold (grouped_reduce) → mexp
  → dense y row block, then the engine reduce-scatters along 'cols'.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from graphtap_tpu.format.tiles import TileSet
from graphtap_tpu.kernels.semiring import Semiring
from graphtap_tpu.kernels.gather_plan import (Spmv2Plan, build_spmv2_plan,
                                              GatherPlan, LANES, SUB,
                                              SID_INVALID, NPASSES)
from graphtap_tpu.kernels.gather_kernels import (windowed_gather, SEG_STEPS,
                                                 seg_round_rows)
from graphtap_tpu.kernels.shuffle_kernels import grouped_reduce

_STAGES = ["exp"] + [f"p{p}" for p in range(NPASSES)] + ["mx"]


@dataclass
class Spmv2Meta:
    """Static meta + device-stacked plan arrays (dict of (D, ...) numpy)."""
    NC: int
    nblocks: int            # padded compact y rows (mult of 8)
    dense_rows: int
    final_rows: int
    npasses: int
    has_w: bool
    nsub: Dict[str, int]    # per stage
    out_rows: Dict[str, int]
    arrays: Dict[str, np.ndarray]

    def device_arrays(self, mesh):
        from graphtap_tpu.parallel.multihost import put_device_stacked
        return {k: put_device_stacked(a, mesh)
                for k, a in self.arrays.items()}


def _pad_gather_plan(g: GatherPlan, nsteps: int, nsub: int,
                     src_rows: int,
                     cidx_blocks: Optional[int] = None) -> GatherPlan:
    """Pad one device's plan to the mesh-common (nsteps, nsub,
    cidx_blocks).  The compact cidx only grows by zero blocks at the end
    (never streamed: pad steps have nact=0, so their index_map repeats
    the last active block); base pads with the total so pad steps'
    ``base-1`` lands on that last active block."""
    br = g.block_rows
    gn = g.out_rows // br
    wsel = g.wsel.reshape(gn, g.nsub)
    if nsub > g.nsub:
        wsel = np.concatenate(
            [wsel, np.repeat(wsel[:, -1:], nsub - g.nsub, axis=1)], axis=1)
    if nsteps > gn:
        pad_w = np.repeat(wsel[-1:], nsteps - gn, axis=0) if gn else \
            np.zeros((nsteps - gn, nsub), np.int32)
        wsel = np.concatenate([wsel, pad_w], axis=0)
        nact = np.concatenate([g.nact, np.zeros(nsteps - gn, np.int32)])
        total = np.int32(g.nact.sum())
        base = np.concatenate(
            [g.base, np.full(nsteps - gn, total, np.int32)])
        meta = np.concatenate(
            [g.meta, np.full((nsteps - gn, br, LANES), SID_INVALID << 3,
                             np.uint8)], axis=0)
        src_of = np.concatenate(
            [g.src_of, np.full((nsteps - gn) * br * LANES, -1, np.int64)])
    else:
        nact, base, meta, src_of = g.nact, g.base, g.meta, g.src_of
    cidx = g.cidx
    if cidx_blocks is not None and cidx_blocks > cidx.shape[0]:
        cidx = np.concatenate(
            [cidx, np.zeros((cidx_blocks - cidx.shape[0], SUB, LANES),
                            np.int8)], axis=0)
    return GatherPlan(out_rows=nsteps * br, nsub=nsub, src_rows=src_rows,
                      wsel=wsel.reshape(-1), nact=nact, base=base,
                      cidx=cidx, meta=meta, src_of=src_of, block_rows=br)


def build_spmv2_meta(tiles: TileSet, value_dtype=np.float32,
                     bchg_cap: int = 10) -> Spmv2Meta:
    part = tiles.part
    D = part.D
    NC = part.tile_cols
    dense_len = part.tile_rows
    renumber = tiles.ir is not None

    plans: List[Spmv2Plan] = []
    for b in range(D):
        n = int(tiles.nnz[b, 0])
        r = tiles.rows[b, :n].astype(np.int64)
        c = tiles.cols[b, :n].astype(np.int64)
        w = tiles.weights[b, :n] if tiles.weights is not None else None
        iv = tiles.iv_dense[b] if renumber else None
        plans.append(build_spmv2_plan(
            r, c, w, tiles.NR, NC, dense_len, iv,
            value_dtype=value_dtype, bchg_cap=bchg_cap))

    # normalization dims must agree across the whole mesh — in a
    # multi-process run each host planned only its own devices' tiles
    from graphtap_tpu.parallel import multihost as mh

    _seg_round = seg_round_rows
    nblocks = int(mh.global_max(max(p.nblocks for p in plans)))
    nblocks = -(-nblocks // SUB) * SUB
    dense_rows = _seg_round(int(mh.global_max(max(p.dense_rows
                                                  for p in plans))))

    def stage_plans(key):
        if key == "exp":
            return [p.expand for p in plans]
        if key == "mx":
            return [p.mexp for p in plans]
        return [p.passes[int(key[1:])] for p in plans]

    nsub = {}
    out_rows = {}
    src_rows = {}
    prev_rows = plans[0].expand.src_rows  # x table rows — same all devices
    for k in _STAGES:
        gs = stage_plans(k)
        nsub[k] = int(mh.global_max(max(g.nsub for g in gs)))
        if k == "mx":
            out_rows[k] = dense_rows
            src_rows[k] = nblocks
        else:
            out_rows[k] = _seg_round(
                int(mh.global_max(max(g.out_rows for g in gs))))
            src_rows[k] = prev_rows if k == "exp" else out_rows[
                _STAGES[_STAGES.index(k) - 1]]
            prev_rows = out_rows[k]
    final_rows = out_rows[f"p{NPASSES - 1}"]

    cidx_blocks = {k: int(mh.global_max(max(g.cidx.shape[0]
                                            for g in stage_plans(k))))
                   for k in _STAGES}
    arrs: Dict[str, List[np.ndarray]] = {}
    has_w = tiles.weights is not None
    for b, p in enumerate(plans):
        for k in _STAGES:
            g = stage_plans(k)[b]
            gp = _pad_gather_plan(g, out_rows[k] // SUB, nsub[k],
                                  src_rows[k], cidx_blocks[k])
            arrs.setdefault(f"{k}_wsel", []).append(gp.wsel)
            arrs.setdefault(f"{k}_base", []).append(gp.base)
            arrs.setdefault(f"{k}_nact", []).append(gp.nact)
            arrs.setdefault(f"{k}_cidx", []).append(gp.cidx)
            arrs.setdefault(f"{k}_meta", []).append(gp.meta)
        fr = final_rows
        lr = np.zeros((fr, LANES), np.int8)
        lr[:p.lr.shape[0]] = p.lr
        ev = np.zeros((fr, LANES), np.int8)
        ev[:p.ev_r.shape[0]] = p.ev_r
        cb = np.zeros(fr // SUB, np.int32)
        cb[:p.chunk_block.size] = p.chunk_block
        arrs.setdefault("lr", []).append(lr)
        arrs.setdefault("ev_r", []).append(ev)
        arrs.setdefault("chunk_block", []).append(cb)
        if has_w:
            ws = np.zeros((out_rows["exp"] // SUB, SUB, LANES),
                          dtype=value_dtype)
            if p.w_stream is not None:
                ws[:p.w_stream.shape[0]] = p.w_stream
            arrs.setdefault("w_stream", []).append(ws)

    arrays = {k: np.stack(v) for k, v in arrs.items()}
    return Spmv2Meta(NC=NC, nblocks=nblocks, dense_rows=dense_rows,
                     final_rows=final_rows, npasses=NPASSES, has_w=has_w,
                     nsub=nsub, out_rows=out_rows, arrays=arrays)


def spmv2_local(x, t: Dict, meta: Spmv2Meta, semiring: Semiring,
                dense_len: int, interpret: bool = False):
    """Per-device v2 SpMV inside shard_map: x (NC,) → y_dense (dense_len,).

    ``t`` holds the LOCAL plan slices (leading device axis dropped)."""
    fill = np.dtype(x.dtype).type(semiring.identity)  # static, not traced
    if semiring.reduce_kind == "sum":
        mul_kind = "mul" if meta.has_w else "none"
    else:
        mul_kind = "add_sat" if meta.has_w else "none"
    sxrows = -(-x.shape[0] // LANES)
    sxrows = -(-sxrows // SUB) * SUB
    xp = x if sxrows * LANES == x.shape[0] else jnp.concatenate(
        [x, jnp.full((sxrows * LANES - x.shape[0],), fill, x.dtype)])
    x2d = xp.reshape(sxrows, LANES)

    buf = windowed_gather(
        x2d, t["exp_wsel"], t["exp_base"], t["exp_nact"], t["exp_cidx"],
        t["exp_meta"], t.get("w_stream"), fill, meta.out_rows["exp"],
        meta.nsub["exp"], mul_kind=mul_kind, interpret=interpret)
    for p in range(meta.npasses):
        k = f"p{p}"
        buf = windowed_gather(
            buf, t[f"{k}_wsel"], t[f"{k}_base"], t[f"{k}_nact"],
            t[f"{k}_cidx"], t[f"{k}_meta"], None, fill, meta.out_rows[k],
            meta.nsub[k], mul_kind="none", interpret=interpret)
    y_blocks = grouped_reduce(
        buf, t["lr"], t["ev_r"], t["chunk_block"], meta.nblocks,
        semiring.reduce_kind, fill, rows_per_chunk=SUB, interpret=interpret)
    y_dense = windowed_gather(
        y_blocks, t["mx_wsel"], t["mx_base"], t["mx_nact"], t["mx_cidx"],
        t["mx_meta"], None, fill, meta.dense_rows, meta.nsub["mx"],
        mul_kind="none", interpret=interpret)
    return y_dense.reshape(-1)[:dense_len]
