"""Host-side static planner for the TPU shuffle/SpMV kernel pipeline.

The TPU has no efficient random gather/scatter: XLA lowers both to
serialized loops (measured ~0.12 Gelem/s for `jnp.take`, ~0.03 Gelem/s
for scatter-add on this chip). But the graph is STATIC: every index the
SpMV uses (edge columns for the x-gather, edge rows for the y-fold) is
known at ingest. This module converts those static index patterns into
*plans* — per-chunk routing tables driving three Pallas kernels
(kernels/shuffle_kernels.py) built only from operations the TPU does
well: lane crossbars (take_along_axis → tpu.dynamic_gather), masked
merges, dynamic single-row VMEM reads/writes, and streaming block I/O.

Pipeline (per device, per superstep):
  expand  — x (VMEM-resident) → per-edge contributions, edges sorted by
            column; each (8,128) output block reads ≤ 8·NWIN x-rows and
            lane-shuffles them into place (duplication is free: the
            crossbar is a gather).
  group   — stable radix-8 passes regrouping contributions by destination
            128-row block, entirely in VMEM within "supers" (fixed-stride
            VMEM-sized stream slices). Hole elements injected here pad
            every row block's run to reduce-chunk alignment.
  reduce  — blocked one-hot ⊕-fold of the grouped stream.

The planner simulates the passes in NumPy; the simulated final layout IS
the reduce plan. Everything is per-device; the engine stacks plans over
devices for shard_map.

Stream layout: the column-sorted edge stream is padded so that super s
occupies rows [s*rows_per_super, (s+1)*rows_per_super) exactly; unused
rows/lanes are invalid (ev_x = 0) and flow through as holes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

LANES = 128
SUB = 8
RED_ROWS = 8                 # stream rows per reduce chunk (8*128 = 1024 el)
RADIX_BITS = 3
RADIX = 1 << RADIX_BITS


@dataclass
class SpmvPlan:
    """Complete static plan for one device's SpMV."""
    NC: int                  # x length (local col space)
    NR: int                  # compact row space
    nblocks: int             # ceil(NR / 128)
    n_edges: int
    # --- expand ---
    NWIN: int
    total_rows: int          # nsupers * rows_per_super
    win_rows: np.ndarray     # (total_rows, NWIN) int32
    slot: np.ndarray         # (total_rows, 128) int8
    lane: np.ndarray         # (total_rows, 128) int8
    ev_x: np.ndarray         # (total_rows, 128) int8
    w_stream: Optional[np.ndarray]  # (total_rows, 128) value dtype
    # --- group ---
    rows_per_super: int
    nsupers: int
    npasses: int
    SMAX: int
    frag_dst: np.ndarray     # (nsupers, npasses, rps, SMAX) int32
    frag_idx: np.ndarray     # (nsupers, npasses, rps, SMAX*128) int8
    frag_mask: np.ndarray    # (nsupers, npasses, rps, SMAX*128) int8
    # --- reduce ---
    chunk_block: np.ndarray  # (total_rows/RED_ROWS,) int32
    lr: np.ndarray           # (total_rows, 128) int8
    ev_r: np.ndarray         # (total_rows, 128) int8
    # simulated final source (stream position per grouped slot, -1 hole);
    # kept for testing
    final_src: np.ndarray    # (total_rows*128,) int64


def _plan_expand_rows(cols: np.ndarray, nwin: int):
    """Pack column-sorted edges into 128-wide rows with ≤ nwin distinct
    x-row windows each. Returns per-row lists + perm (edge -> flat
    position in the unpadded row sequence)."""
    E = cols.size
    xrow = cols // LANES
    xlane = (cols % LANES).astype(np.int8)

    change = np.flatnonzero(np.diff(xrow)) + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    ends = np.concatenate([change, [E]]).astype(np.int64)
    run_rows = xrow[starts]

    win_rows_l: List[np.ndarray] = []
    slot_l, lane_l, ev_l = [], [], []
    perm = np.empty(E, dtype=np.int64)

    cur_wins: List[int] = []
    cur_n = 0
    cur_slot = np.zeros(LANES, dtype=np.int8)
    cur_lane = np.zeros(LANES, dtype=np.int8)
    cur_ev = np.zeros(LANES, dtype=bool)

    def flush():
        nonlocal cur_wins, cur_n, cur_slot, cur_lane, cur_ev
        w = np.zeros(nwin, dtype=np.int32)
        w[:len(cur_wins)] = cur_wins
        win_rows_l.append(w)
        slot_l.append(cur_slot)
        lane_l.append(cur_lane)
        ev_l.append(cur_ev)
        cur_wins = []
        cur_n = 0
        cur_slot = np.zeros(LANES, dtype=np.int8)
        cur_lane = np.zeros(LANES, dtype=np.int8)
        cur_ev = np.zeros(LANES, dtype=bool)

    for rr, s, e in zip(run_rows, starts, ends):
        off = int(s)
        while off < e:
            if cur_n == LANES or (int(rr) not in cur_wins and
                                  len(cur_wins) == nwin):
                flush()
            if int(rr) not in cur_wins:
                cur_wins.append(int(rr))
            j = cur_wins.index(int(rr))
            take = int(min(e - off, LANES - cur_n))
            sl = slice(cur_n, cur_n + take)
            cur_slot[sl] = j
            cur_lane[sl] = xlane[off:off + take]
            cur_ev[sl] = True
            perm[off:off + take] = (len(win_rows_l) * LANES +
                                    np.arange(cur_n, cur_n + take))
            cur_n += take
            off += take
    if cur_n or not win_rows_l:
        flush()

    return (np.stack(win_rows_l), np.stack(slot_l), np.stack(lane_l),
            np.stack(ev_l), perm)


def _pack_supers(blk_rows: np.ndarray, cap_el: int):
    """Greedy packing of expand rows into supers so that each super's
    content, padded per block to reduce-chunk multiples, fits cap_el.

    blk_rows: (nrows, 128) int64 block ids (-1 invalid). Returns list of
    (row_lo, row_hi)."""
    nrows = blk_rows.shape[0]
    chunk_el = RED_ROWS * LANES
    supers = []
    r0 = 0
    while r0 < nrows:
        counts: dict = {}
        padded = 0
        r = r0
        while r < nrows:
            row = blk_rows[r]
            v = row >= 0
            trial = dict(counts)
            if v.any():
                for b, c in zip(*np.unique(row[v], return_counts=True)):
                    trial[int(b)] = trial.get(int(b), 0) + int(c)
            trial_padded = sum(-(-c // chunk_el) * chunk_el
                               for c in trial.values())
            if trial_padded > cap_el:
                if r == r0:
                    raise ValueError("one expand row exceeds super capacity")
                break
            counts = trial
            padded = trial_padded
            r += 1
        supers.append((r0, r))
        r0 = r
    return supers


def build_spmv_plan(rows: np.ndarray, cols: np.ndarray,
                    weights: Optional[np.ndarray],
                    NR: int, NC: int,
                    nwin: int = 8,
                    rows_per_super: int = 4096,
                    smax_cap: int = 32,
                    value_dtype=np.float32) -> SpmvPlan:
    """Build the full static plan from (compact-row, local-col) edges."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    E = rows.size
    order = np.lexsort((rows, cols))
    r_s = rows[order]
    c_s = cols[order]
    w_s = np.asarray(weights)[order] if weights is not None else None

    winr_u, slot_u, lane_u, ev_u, perm_u = _plan_expand_rows(c_s, nwin)
    nrows_u = winr_u.shape[0]

    # destination info per unpadded stream position
    blk_u = np.full(nrows_u * LANES, -1, dtype=np.int64)
    lr_u = np.zeros(nrows_u * LANES, dtype=np.int64)
    blk_u[perm_u] = r_s // LANES
    lr_u[perm_u] = r_s % LANES

    cap_el = rows_per_super * LANES
    supers = _pack_supers(blk_u.reshape(nrows_u, LANES), cap_el)
    nsupers = len(supers)
    rps = rows_per_super
    total_rows = nsupers * rps
    n_tot = total_rows * LANES

    # --- padded stream layout: super s rows at [s*rps, s*rps + (hi-lo)) ---
    win_rows = np.zeros((total_rows, nwin), dtype=np.int32)
    slot = np.zeros((total_rows, LANES), dtype=np.int8)
    lane = np.zeros((total_rows, LANES), dtype=np.int8)
    ev_x = np.zeros((total_rows, LANES), dtype=np.int8)
    w_stream = (np.zeros((total_rows, LANES), dtype=value_dtype)
                if w_s is not None else None)
    blk_p = np.full(n_tot, -1, dtype=np.int64)
    lr_p = np.zeros(n_tot, dtype=np.int64)
    row_map = np.full(nrows_u, -1, dtype=np.int64)
    for si, (lo, hi) in enumerate(supers):
        dst0 = si * rps
        n = hi - lo
        row_map[lo:hi] = np.arange(dst0, dst0 + n)
        win_rows[dst0:dst0 + n] = winr_u[lo:hi]
        slot[dst0:dst0 + n] = slot_u[lo:hi]
        lane[dst0:dst0 + n] = lane_u[lo:hi]
        ev_x[dst0:dst0 + n] = ev_u[lo:hi]
        blk_p[dst0 * LANES:(dst0 + n) * LANES] = \
            blk_u[lo * LANES:hi * LANES]
        lr_p[dst0 * LANES:(dst0 + n) * LANES] = lr_u[lo * LANES:hi * LANES]
    if w_stream is not None:
        w_flat = np.zeros(n_tot, dtype=value_dtype)
        pos_p = row_map[perm_u // LANES] * LANES + perm_u % LANES
        w_flat[pos_p] = w_s
        w_stream = w_flat.reshape(total_rows, LANES)

    nblocks = -(-NR // LANES)
    # radix passes: enough bits for the largest per-super block-rank space
    max_ranks = 2
    for si, (lo, hi) in enumerate(supers):
        seg = blk_p[si * rps * LANES:(si * rps + (hi - lo)) * LANES]
        nb = np.unique(seg[seg >= 0]).size
        max_ranks = max(max_ranks, nb + 1)
    nbits = int(np.ceil(np.log2(max_ranks)))
    npasses = max(1, -(-nbits // RADIX_BITS))

    frag_dst = np.full((nsupers, npasses, rps, smax_cap), -1, dtype=np.int32)
    frag_idx = np.zeros((nsupers, npasses, rps, smax_cap * LANES),
                        dtype=np.int8)
    frag_mask = np.zeros((nsupers, npasses, rps, smax_cap * LANES),
                         dtype=np.int8)
    chunk_block = np.zeros(total_rows // RED_ROWS, dtype=np.int32)
    lr_out = np.zeros((total_rows, LANES), dtype=np.int8)
    ev_r = np.zeros((total_rows, LANES), dtype=np.int8)
    final_src = np.full(n_tot, -1, dtype=np.int64)

    chunk_el = RED_ROWS * LANES
    for si in range(nsupers):
        base = si * cap_el
        seg_blk = blk_p[base:base + cap_el]
        valid0 = seg_blk >= 0
        blocks_sorted = np.unique(seg_blk[valid0])
        hole_key = blocks_sorted.size

        key = np.full(cap_el, hole_key, dtype=np.int64)
        key[valid0] = np.searchsorted(blocks_sorted, seg_blk[valid0])
        src = np.where(valid0, np.arange(base, base + cap_el), -1)

        # alignment holes: give trailing invalid slots block keys so each
        # block's run pads to a chunk multiple (stable sort puts them
        # after the real elements of the same key)
        counts = np.bincount(key[valid0], minlength=hole_key)
        pads = (-(-counts // chunk_el)) * chunk_el - counts
        pad_keys = np.repeat(np.arange(hole_key), pads)
        free = np.flatnonzero(~valid0)
        assert pad_keys.size <= free.size, "super capacity overflow"
        key[free[:pad_keys.size]] = pad_keys
        # note: padded-hole src stays -1: they reserve layout slots only.
        # stability caveat: pad holes must sort AFTER real elements of the
        # same block. Real elements of block b all precede free slots?
        # Not necessarily (invalid lanes interleave). Handle by sorting on
        # (key, is_hole, position):
        is_hole = src < 0

        cur_src = src
        cur_key = key
        cur_hole = is_hole
        for p in range(npasses):
            digit = (cur_key >> (p * RADIX_BITS)) & (RADIX - 1)
            # stable sort with holes of equal digit AFTER real elements is
            # not required for correctness (holes are indistinguishable),
            # plain stable sort on digit suffices.
            order2 = np.argsort(digit, kind="stable")
            dest = np.empty(cap_el, dtype=np.int64)
            dest[order2] = np.arange(cap_el)

            occ_idx = np.flatnonzero(~cur_hole)
            if occ_idx.size:
                srow = occ_idx // LANES
                slane = occ_idx % LANES
                dpos = dest[occ_idx]
                drow = dpos // LANES
                dlane = dpos % LANES
                fkey = srow * np.int64(2 * rps + 2) + drow
                o3 = np.argsort(fkey, kind="stable")
                fk = fkey[o3]
                newf = np.concatenate([[True], fk[1:] != fk[:-1]])
                fid = np.cumsum(newf) - 1
                nfrag = int(fid[-1]) + 1
                frow = srow[o3][newf]
                jseq = np.arange(nfrag)
                row_change = np.concatenate([[True], frow[1:] != frow[:-1]])
                row_start = jseq[row_change]
                jj = jseq - np.repeat(row_start, np.diff(
                    np.concatenate([np.flatnonzero(row_change), [nfrag]])))
                if jj.max() + 1 > smax_cap:
                    raise ValueError(
                        f"SMAX overflow: {int(jj.max()) + 1} > {smax_cap}")
                frag_dst[si, p, frow, jj] = drow[o3][newf].astype(np.int32)
                j_of = jj[fid]
                frag_idx[si, p, srow[o3], j_of * LANES + dlane[o3]] = \
                    slane[o3].astype(np.int8)
                frag_mask[si, p, srow[o3], j_of * LANES + dlane[o3]] = 1

            nsrc = np.full(cap_el, -1, dtype=np.int64)
            nkey = np.zeros(cap_el, dtype=np.int64)
            nhole = np.ones(cap_el, dtype=bool)
            nsrc[dest] = cur_src
            nkey[dest] = cur_key
            nhole[dest] = cur_hole
            cur_src, cur_key, cur_hole = nsrc, nkey, nhole

        fv = ~cur_hole
        final_src[base:base + cap_el] = np.where(fv, cur_src, -1)
        lrv = np.where(fv, lr_p[np.where(fv, cur_src, 0)], 0)
        r0 = si * rps
        lr_out[r0:r0 + rps] = lrv.reshape(rps, LANES).astype(np.int8)
        ev_r[r0:r0 + rps] = fv.reshape(rps, LANES).astype(np.int8)
        blk_final = np.full(cap_el, -1, dtype=np.int64)
        blk_final[fv] = blk_p[cur_src[fv]]
        bc = blk_final.reshape(-1, chunk_el)
        ch0 = r0 // RED_ROWS
        for ci in range(bc.shape[0]):
            present = bc[ci][bc[ci] >= 0]
            if present.size:
                u = np.unique(present)
                assert u.size == 1, f"reduce chunk spans blocks {u}"
                chunk_block[ch0 + ci] = u[0]

    return SpmvPlan(
        NC=NC, NR=NR, nblocks=nblocks, n_edges=E,
        NWIN=nwin, total_rows=total_rows,
        win_rows=win_rows, slot=slot, lane=lane, ev_x=ev_x,
        w_stream=w_stream,
        rows_per_super=rps, nsupers=nsupers, npasses=npasses,
        SMAX=smax_cap, frag_dst=frag_dst, frag_idx=frag_idx,
        frag_mask=frag_mask,
        chunk_block=chunk_block, lr=lr_out, ev_r=ev_r,
        final_src=final_src)
