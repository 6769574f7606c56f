"""Slim-postings join pipeline — the scale path for ``mode='join'``.

Round 1 shipped each record's FULL rank array on EVERY prefix-token posting
(shuffle volume O(n·p) per record); this module re-architects the join as:

    ranked records ──sig(map_batches)──▶ signature-dedup
      ├─▶ Tsig  (one row per distinct signature: sig, sz, ranks[, s],
      │          member counts)          — ONE rank-array shuffle, total O(n)
      ├─▶ Tmem  (sig, side, key)         — slim membership, no rank arrays
      ├─▶ postings from Tsig: (bucket, tok, sig, sz, pos, kh, hl, hr)
      │          ≈ 32 bytes/posting, O(p) per DISTINCT record  ── the one
      │          candidate-generation shuffle, now rank-free
      ├─▶ per-bucket pair gen (DuckDB hash join; size bounds + positional
      │          gate + salted-grid role rule) → candidate sig pairs
      ├─▶ verify: two bucket-hash joins back to Tsig re-attach both rank
      │          arrays (volume proportional to CANDIDATES, the irreducible
      │          verify input), exact vectorized scoring
      └─▶ expand: matched sig pairs × Tmem memberships → record pairs

Exact duplicates (identical token signatures — the common case in dedup
corpora) collapse into one Tsig row, so postings, pair generation and
verification all run once per distinct signature.

Candidate pairs may be emitted from several buckets (one per shared prefix
token); they are deduplicated during the first verify attach.  Identity
pairs (a,a) — the dominant duplicate source in self-joins — are emitted
only in the bucket holding the signature's FIRST prefix token
(``min(pos) = 0``), so they are exact-once by construction.

Semantics anchor: the reference's filter-verify loop
(``/root/reference/py_stringsimjoin/join/set_sim_join.py:99-125``) — a
candidate only ever needs the two records' ordered token arrays, which is
exactly what the verify attach reconstructs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..core import bounds
from ..core.comp_ops import COMP_OP_MAP
from .pairgen import _lev_many
from .postings import KNUTH, MAX_GRID_AREA, _token_hashes

_MASK63 = np.uint64((1 << 63) - 1)


def _hash_bucket(sig: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((sig.astype(np.uint64) * KNUTH) >> np.uint64(13)) \
        % np.uint64(num_buckets)


class SigStage:
    """Append a 63-bit signature column: polynomial hash over the sorted
    rank array + size (+ the raw string for EDIT_DISTANCE, whose verify
    needs the exact string, not just the qgram bag)."""

    _P = np.uint64(0x100000001B3)

    def __init__(self, hash_string: bool = False):
        self.hash_string = hash_string
        self._pows = None  # P^i table, grown on demand

    def _powers(self, n: int) -> np.ndarray:
        if self._pows is None or len(self._pows) < n:
            m = max(n, 1024)
            p = np.full(m, self._P, dtype=np.uint64)
            p[0] = np.uint64(1)
            self._pows = np.cumprod(p)  # uint64 wrap = mod 2^64
        return self._pows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ranks = batch['ranks'].combine_chunks()
        off = ranks.offsets.to_numpy()
        flat = (ranks.values.to_numpy(zero_copy_only=False).astype(np.uint64)
                if len(ranks.values) else np.empty(0, np.uint64))
        n = len(batch)
        lens = np.diff(off)
        pows = self._powers(int(lens.max()) + 1 if n else 1)
        # positional weights restart at each row
        pos = np.arange(len(flat)) - np.repeat(off[:-1], lens)
        weighted = (flat + np.uint64(1)) * pows[pos]
        sig = np.zeros(n, dtype=np.uint64)
        if len(flat):
            row_id = np.repeat(np.arange(n), lens)
            np.add.at(sig, row_id, weighted)  # uint64 wrap
        sz = batch['sz'].to_numpy().astype(np.uint64)
        sig = (sig ^ (sz * np.uint64(0x9E3779B97F4A7C15))) * self._P
        if self.hash_string:
            sig ^= _token_hashes(batch['s'].combine_chunks())
        sig &= _MASK63
        return batch.append_column('sig', pa.array(sig.astype(np.int64)))


class SlimPostingsStage:
    """Tsig rows → slim postings: one row per (distinct signature, prefix
    token), NO rank arrays.  Heavy tokens use the unordered salted grid
    (each signature covers cells {(min(kh,c), max(kh,c))}; kh = -1 marks
    the diagonal visit) — both join sides live in ONE postings stream, so
    the two-table row/column scheme collapses into the same-relation grid
    with side membership carried as hl/hr flags."""

    def __init__(self, num_buckets: int, heavy_ref=None,
                 emit_sides: bool = True, num_parts: int | None = None,
                 slim_wire: bool = False):
        self.num_buckets = num_buckets
        # same-relation broadcast postings have hl = hr = 1 on every row;
        # emit_sides=False drops the two flag columns from the shuffle
        self.emit_sides = emit_sides
        # slim_wire (broadcast path only): ship (part:i16, tok:i32, sig:i32,
        # pos:i32, cell:i16) = 16 B/posting instead of the 26 B full row —
        # sz and kh are recomputed in the candgen kernel from the broadcast
        # signature table (sz = bc.sz[si]; kh = bc.sigs[si] % g), and the
        # absolute bucket/grid-cell id is only HASHED into 'part' here,
        # never shipped.  'cell' is the grid-LOCAL cell i*g+j (-1 for
        # unsalted rows); (tok, cell) reproduces the (bucket, tok) grouping
        # exactly because bucket = hash(tok) for unsalted rows and the
        # absolute cell id is a function of (tok, cell) for salted ones.
        self.slim_wire = slim_wire
        # num_parts: emit a 'part' = hash(bucket) % num_parts column so the
        # kernel can process MANY buckets per call (one SQL joining on
        # (bucket, tok) per partition) — per-group DuckDB planning overhead
        # (~20 ms) times tens of thousands of grid cells was the flagship's
        # dominant cost otherwise
        self.num_parts = num_parts
        heavy = None
        if heavy_ref is not None:
            heavy = (ray.get(heavy_ref)
                     if isinstance(heavy_ref, ray.ObjectRef) else heavy_ref)
        self.heavy = heavy or {}
        self._heavy_cache = None

    def _heavy_arrays(self):
        if self._heavy_cache is None:
            ranks = np.array(sorted(self.heavy), dtype=np.int64)
            hidx = np.array([self.heavy[r][0] for r in ranks], dtype=np.int64)
            g = np.array([self.heavy[r][1] for r in ranks], dtype=np.int64)
            self._heavy_cache = (ranks, hidx, g)
        return self._heavy_cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        ranks_col = batch['ranks'].combine_chunks()
        plen = batch['plen'].to_numpy()
        nrows = len(batch)
        offsets = ranks_col.offsets.to_numpy()
        flat = (ranks_col.values.to_numpy(zero_copy_only=False)
                if len(ranks_col.values) else np.empty(0, np.int32))

        reps = np.minimum(plen, np.diff(offsets)).astype(np.int64)
        row_idx = np.repeat(np.arange(nrows), reps)
        pos = (np.arange(len(row_idx)) -
               np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])),
                         reps)).astype(np.int32)
        tok = flat[np.repeat(offsets[:-1], reps) + pos]
        # bag tokenizers (EDIT_DISTANCE) may repeat a token inside the
        # prefix; keep the first (lowest-pos) occurrence only
        if len(tok):
            dup = np.zeros(len(tok), bool)
            dup[1:] = (tok[1:] == tok[:-1]) & (row_idx[1:] == row_idx[:-1])
            if dup.any():
                keep = ~dup
                row_idx, pos, tok = row_idx[keep], pos[keep], tok[keep]

        sig = batch['sig'].to_numpy()
        bucket = ((tok.astype(np.uint64) * KNUTH) >> np.uint64(7)) \
            % np.uint64(self.num_buckets)
        bucket = bucket.astype(np.int64)
        kh_col = np.full(len(tok), -1, dtype=np.int16)
        cell_col = np.full(len(tok), -1, dtype=np.int16)
        out = (row_idx, tok, pos, bucket, kh_col, cell_col)

        if self.heavy:
            hr, hidx_arr, hg_arr = self._heavy_arrays()
            p = np.minimum(np.searchsorted(hr, tok), len(hr) - 1)
            hmask = hr[p] == tok if len(hr) else np.zeros(len(tok), bool)
            if hmask.any():
                sel = np.nonzero(hmask)[0]
                g = hg_arr[p[sel]]
                # stride by the global MAX grid area (see PostingsStage:
                # per-token g² strides let different tokens' cell ranges
                # overlap; harmless here only because pair64 dedup is
                # global, but kept disjoint for consistency)
                base = self.num_buckets + hidx_arr[p[sel]] * MAX_GRID_AREA
                khv = (sig[row_idx[sel]].astype(np.uint64)
                       % g.astype(np.uint64)).astype(np.int64)
                rep = np.repeat(np.arange(len(sel)), g)
                c = (np.arange(len(rep)) -
                     np.repeat(np.concatenate(([0], np.cumsum(g)[:-1])), g))
                khr, gr, baser = khv[rep], g[rep], base[rep]
                cl = np.minimum(khr, c) * gr + np.maximum(khr, c)
                cells = baser + cl
                khcol = np.where(c == khr, -1, khr).astype(np.int16)
                keep = ~hmask
                out = (np.concatenate([row_idx[keep], row_idx[sel][rep]]),
                       np.concatenate([tok[keep], tok[sel][rep]]),
                       np.concatenate([pos[keep], pos[sel][rep]]),
                       np.concatenate([bucket[keep], cells]),
                       np.concatenate([kh_col[keep], khcol]),
                       np.concatenate([cell_col[keep],
                                       cl.astype(np.int16)]))

        row_idx, tok, pos, bucket, kh_col, cell_col = out
        take = pa.array(row_idx)
        sig_col = 'si' if 'si' in batch.column_names else 'sig'
        if self.slim_wire:
            cols = {
                'tok': pa.array(tok.astype(np.int32)),
                'sig': batch[sig_col].take(take),
                'pos': pa.array(pos),
                'cell': pa.array(cell_col),
            }
        else:
            cols = {
                'bucket': pa.array(bucket.astype(np.int32), pa.int32()),
                'tok': pa.array(tok.astype(np.int32)),
                'sig': batch[sig_col].take(take),
                'sz': batch['sz'].take(take),
                'pos': pa.array(pos),
                'kh': pa.array(kh_col),
            }
        if self.num_parts:
            part = ((bucket.astype(np.uint64) * KNUTH) >> np.uint64(9)) \
                % np.uint64(self.num_parts)
            cols['part'] = (pa.array(part.astype(np.int16), pa.int16())
                            if self.slim_wire else
                            pa.array(part.astype(np.int32), pa.int32()))
        if self.emit_sides:
            hl = (batch['c_l'].to_numpy() > 0).astype(np.int8)
            hr_flag = (batch['c_r'].to_numpy() > 0).astype(np.int8)
            cols['hl'] = pa.array(hl[row_idx])
            cols['hr'] = pa.array(hr_flag[row_idx])
        return pa.table(cols)


def _cand_luts(sim_type: str, threshold, max_sz: int):
    """Integer lookup tables for the candgen filters, replacing per-pair
    float rounding (bounds.py round-before-ceil semantics preserved — the
    LUT is built with the very same expressions over the value range).

    Returns (size_lo, size_hi, ovt_sum, ovt_min):
      size_lo/size_hi : per partner size sz, allowed own-size interval
                        (None when the measure has no size bound)
      ovt_sum         : overlap threshold indexed by szA + szB
                        (JACCARD / DICE), else None
      ovt_min         : overlap threshold indexed by min(szA, szB)
                        (OVERLAP_COEFFICIENT), else None
    COSINE's ovt (ceil(round(t*sqrt(n1*n2),4))) is computed directly."""
    s = np.arange(max_sz + 2, dtype=np.float64)
    size_lo = size_hi = ovt_sum = ovt_min = None
    if sim_type == 'JACCARD':
        size_lo = np.ceil(np.round(threshold * s, 4)).astype(np.int64)
        size_hi = np.floor(np.round(s / threshold, 4)).astype(np.int64)
    elif sim_type == 'COSINE':
        tt = threshold * threshold
        size_lo = np.ceil(np.round(tt * s, 4)).astype(np.int64)
        size_hi = np.floor(np.round(s / tt, 4)).astype(np.int64)
    elif sim_type == 'DICE':
        lo, hi = threshold / (2 - threshold), (2 - threshold) / threshold
        size_lo = np.ceil(np.round(lo * s, 4)).astype(np.int64)
        size_hi = np.floor(np.round(hi * s, 4)).astype(np.int64)
    elif sim_type == 'OVERLAP':
        size_lo = np.full(max_sz + 2, int(threshold), dtype=np.int64)
        size_hi = np.full(max_sz + 2, np.iinfo(np.int64).max // 2,
                          dtype=np.int64)
    elif sim_type == 'EDIT_DISTANCE':
        # qgram BAG lengths differ exactly as string lengths do, so the
        # reference's length filter |len(a)-len(b)| <= d is |szA-szB| <= d
        size_lo = np.maximum(s - threshold, 0).astype(np.int64)
        size_hi = (s + threshold).astype(np.int64)
    s2 = np.arange(2 * (max_sz + 2), dtype=np.float64)
    if sim_type == 'JACCARD':
        c = threshold / (1 + threshold)
        ovt_sum = np.ceil(np.round(c * s2, 4)).astype(np.int64)
    elif sim_type == 'DICE':
        ovt_sum = np.ceil(np.round((threshold / 2) * s2, 4)).astype(np.int64)
    elif sim_type == 'OVERLAP_COEFFICIENT':
        ovt_min = np.ceil(np.round(threshold * s, 4)).astype(np.int64)
    return size_lo, size_hi, ovt_sum, ovt_min


def _candgen_parts(nsig: int) -> int:
    """Candidate-generation partition count: constant 256 at bench scales
    (identical kernel-call counts at every parallelism level, which the
    scaling protocol requires), growing with the DATA beyond ~25M distinct
    signatures so one partition never has to hold an unbounded slice of a
    corpus-scale postings stream.  Depends only on the input, never on
    cluster size.  Capped at 32768: the slim-wire postings carry 'part'
    as int16 (16 B rows — the whole point of the slim wire)."""
    return int(min(32768, max(256, nsig // 100_000)))


# triangle-enumeration slab: bounds peak memory of the per-pair arrays
# (~60 B/pair live at once -> ~250 MB per concurrent task)
_CAND_SLAB = 4_000_000
# verify-side membership-expansion slab: bounds the transient pair_idx /
# off / key-gather arrays even when one duplicate class explodes to m² rows
_EXPAND_SLAB = 8_000_000


def _np_candidates(tbl: pa.Table, sim_type: str, threshold,
                   same_relation: bool, bc=None,
                   heavy_arrays=None,
                   count_mode: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-partition candidate generation over slim postings.

    Replaces the DuckDB (bucket, tok) self-join + pair-level HAVING gate.
    A lexsort groups the postings by (bucket, token) with SIZE-ascending
    order inside each group, and enumeration is restricted to pairs
    (i, j) where i precedes j and i is *positionally eligible*:
    ``szi - posi >= ovt(szi, szi)``.  Soundness: at a true pair's first
    (minimal) shared prefix token every shared token still lies to the
    right in both arrays, so ``overlap <= min(szA - posA, szB - posB)``
    (reference anchor: ``filter/position_filter.py:340-344``); for the
    size-SMALLER side x, ``szx - posx >= overlap >= ovt(szx, szy) >=
    ovt(szx, szx)`` because ovt is monotone in the partner size and
    ``szy >= szx``.  Heavy boilerplate-token groups are almost entirely
    ineligible rows (their prefix positions are deep), so this cuts the
    enumerated pair volume ~53x on the flagship corpus (695M -> 13M)
    before the exact joint filters run.

    same_relation: emits each candidate once, canonically (a <= b), plus
    exact-once identity pairs via each signature's pos==0 posting.
    Two-table: emits (L, R) oriented pairs via the hl/hr side flags (both
    orientations when both memberships exist)."""
    tok = tbl['tok'].to_numpy().astype(np.uint32)
    si0 = tbl['sig'].to_numpy()
    if 'bucket' in tbl.column_names:
        bucket = tbl['bucket'].to_numpy().astype(np.uint64)
        key0 = (bucket << np.uint64(32)) | tok.astype(np.uint64)
        sz0 = tbl['sz'].to_numpy()
        kh0 = tbl['kh'].to_numpy()
    else:
        # slim wire: (tok, cell) reproduces the (bucket, tok) grouping; sz
        # and kh are recomputed from the broadcast signature table (16 B
        # postings never ship them — see SlimPostingsStage.slim_wire)
        cell = tbl['cell'].to_numpy().astype(np.int64)
        key0 = ((tok.astype(np.uint64) << np.uint64(16))
                | (cell + 1).astype(np.uint64))
        sz0 = bc.sz[si0]
        kh0 = np.full(len(tok), -1, dtype=np.int16)
        salted = cell >= 0
        if salted.any():
            hr0, hg0 = heavy_arrays
            sel = np.nonzero(salted)[0]
            p = np.minimum(np.searchsorted(hr0, tok[sel]),
                           max(len(hr0) - 1, 0))
            g = hg0[p]
            i_cell, j_cell = cell[sel] // g, cell[sel] % g
            khv = (bc.sigs[si0[sel]].astype(np.uint64)
                   % g.astype(np.uint64)).astype(np.int64)
            kh0[sel] = np.where(i_cell == j_cell, -1, khv).astype(np.int16)
    o = np.lexsort((si0, sz0, key0))
    key = key0[o]
    si = si0[o].astype(np.int64)
    sz = sz0[o].astype(np.int32)
    pos = tbl['pos'].to_numpy()[o].astype(np.int32)
    kh = kh0[o].astype(np.int16)
    two_table = not same_relation
    if two_table:
        hl = tbl['hl'].to_numpy()[o].astype(bool)
        hr = tbl['hr'].to_numpy()[o].astype(bool)
    n = len(key)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    set_measure = sim_type in ('JACCARD', 'COSINE', 'DICE', 'OVERLAP',
                               'OVERLAP_COEFFICIENT')
    size_lo, size_hi, ovt_sum, ovt_min = _cand_luts(sim_type, threshold,
                                                    int(sz.max()))
    rem = (sz - pos).astype(np.int64)

    out_a, out_b = [], []
    if not count_mode:
        # identity pairs: exactly once, via the sig's first prefix token
        idm = pos == 0
        if two_table:
            idm &= hl & hr
        idd = si[idm]
        out_a.append(idd)
        out_b.append(idd)

    def emit(ii: np.ndarray, ji: np.ndarray) -> None:
        szi, szj = sz[ii], sz[ji]
        if count_mode:
            # counts must be group-consistent: the positional ovt term
            # varies by group and would corrupt them; the (pair-level)
            # size bounds only drop pairs that can never reach the
            # threshold, so skipping them is merely conservative
            keep = np.ones(len(ii), dtype=bool)
        elif size_lo is not None:
            keep = (szi >= size_lo[szj]) & (szi <= size_hi[szj])
        else:
            keep = np.ones(len(ii), dtype=bool)
        if set_measure and not count_mode:
            if ovt_sum is not None:
                ovt = ovt_sum[szi + szj]
            elif ovt_min is not None:
                ovt = ovt_min[np.minimum(szi, szj)]
            elif sim_type == 'COSINE':
                ovt = np.ceil(np.round(
                    threshold * np.sqrt((szi * szj).astype(np.float64)),
                    4)).astype(np.int64)
            else:  # OVERLAP
                ovt = np.int64(int(threshold))
            keep &= (rem[ii] >= ovt) & (rem[ji] >= ovt)
        khi, khj = kh[ii], kh[ji]
        keep &= (khi == np.int16(-1)) | (khj == np.int16(-1)) \
            | (khi != khj)
        ii, ji = ii[keep], ji[keep]
        a, b = si[ii], si[ji]
        if same_relation:
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        else:
            fwd = hl[ii] & hr[ji]
            rev = hl[ji] & hr[ii]
            out_a.append(np.concatenate([a[fwd], b[rev]]))
            out_b.append(np.concatenate([b[fwd], a[rev]]))

    # positional eligibility of the size-smaller pair side: rem >= ovt(sz, sz)
    if count_mode:
        # counting mode: every shared token must be enumerated (each
        # emission IS one unit of the exact overlap count) — no pruning
        elig = np.ones(n, dtype=bool)
    elif not set_measure:         # EDIT_DISTANCE: no positional gate
        elig = np.ones(n, dtype=bool)
    elif ovt_sum is not None:     # JACCARD / DICE
        elig = rem >= ovt_sum[2 * sz.astype(np.int64)]
    elif ovt_min is not None:     # OVERLAP_COEFFICIENT
        elig = rem >= ovt_min[sz]
    elif sim_type == 'COSINE':    # sqrt(sz*sz) == sz exactly
        elig = rem >= np.ceil(np.round(threshold * sz.astype(np.float64),
                                       4)).astype(np.int64)
    else:                         # OVERLAP
        elig = rem >= np.int64(int(threshold))

    gfirst = np.concatenate(([True], key[1:] != key[:-1]))
    gstart = np.flatnonzero(gfirst)
    grp = (np.cumsum(gfirst) - 1).astype(np.int64)
    ec = np.cumsum(elig)                       # inclusive eligible count
    start_c = np.zeros(len(gstart), np.int64)
    start_c[1:] = ec[gstart[1:] - 1]           # eligibles before each group
    # eligible rows strictly before each row, within its group
    cnt = ec - elig - start_c[grp]
    e_idx = np.flatnonzero(elig)               # composite order preserved
    e_base = start_c[grp]                      # group's first eligible, in E
    rows = np.flatnonzero(cnt > 0)
    if len(rows):
        cnt_j = cnt[rows]
        csum = np.concatenate(([0], np.cumsum(cnt_j)))
        lo = 0
        while lo < len(rows):
            hi = int(np.searchsorted(csum, csum[lo] + _CAND_SLAB, 'left'))
            hi = min(max(hi, lo + 1), len(rows))
            rj, cj = rows[lo:hi], cnt_j[lo:hi]
            base = csum[lo:hi] - csum[lo]
            lo = hi
            ji = np.repeat(rj, cj)
            off = (np.arange(len(ji), dtype=np.int64)
                   - np.repeat(base, cj))
            ii = e_idx[np.repeat(e_base[rj], cj) + off]
            emit(ii, ji)
    return np.concatenate(out_a), np.concatenate(out_b)


class _TsigBroadcast:
    """Column-oriented signature table + memberships for zero-copy sharing.

    sigs are SORTED; lookup is searchsorted.  All payloads are numpy arrays
    (object dtype only for keys/strings)."""

    __slots__ = ('sigs', 'rank_off', 'rank_flat', 'sz', 'plen',
                 'l_key_off', 'l_key_flat', 'r_key_off', 'r_key_flat',
                 's', 's_len')

    def __init__(self, sigs, rank_off, rank_flat, sz, plen,
                 l_key_off, l_key_flat, r_key_off, r_key_flat, s=None):
        self.sigs = sigs
        self.rank_off = rank_off
        self.rank_flat = rank_flat
        self.sz = sz
        self.plen = plen
        self.l_key_off = l_key_off
        self.l_key_flat = l_key_flat
        self.r_key_off = r_key_off
        self.r_key_flat = r_key_flat
        self.s = s
        self.s_len = (np.fromiter((len(x) for x in s), np.int64, len(s))
                      if s is not None else None)

    def index_of(self, sig_values: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.sigs, sig_values)


def _build_tsig_shard(shard, nshards, same_relation, keep_string, *blocks):
    """Shard builder: fold the block-distinct payloads + memberships whose
    63-bit signature falls in this shard's HIGH-BIT range (so shard order ==
    global signature sort order) into sorted per-shard arrays.  Runs as one
    of ``nshards`` parallel Ray tasks; blocks are zero-copy object-store
    reads.

    Split blocks arrive SIG-SORTED (``_tsig_split_block``), so each block
    contributes a binary-search SLICE — a builder touches only its own
    shard's bytes plus O(log block) per block, not O(block) per block.
    That removes the former O(nshards × data) build cost that motivated
    the low shard-count cap: shard count now scales freely with data size
    (a 100 TB Tsig can use thousands of target-sized shards)."""
    shift = np.uint64(63 - int(nshards).bit_length() + 1)
    lo_sig = np.int64(np.uint64(shard) << shift)
    # top shard: the exclusive bound (shard+1)<<shift is 2^63, past every
    # 63-bit sig — take the block tail instead of a searchsorted bound
    top = bool((np.uint64(shard + 1) << shift) >= np.uint64(1 << 63))
    hi_sig = np.int64(0) if top else np.int64(np.uint64(shard + 1) << shift)
    pay_parts, mem_parts = [], []
    for t in blocks:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if 'kind' not in t.column_names:  # schemaless empty block
            continue
        sig = t['sig'].to_numpy(zero_copy_only=False)
        a = int(np.searchsorted(sig, lo_sig, 'left'))
        b = len(sig) if top else int(np.searchsorted(sig, hi_sig, 'left'))
        if b <= a:
            continue
        sl = t.slice(a, b - a)
        kind = sl['kind'].to_numpy(zero_copy_only=False)
        pay_parts.append(sl.filter(pa.array(kind == 0)))
        mem_parts.append(sl.filter(pa.array(kind == 1))
                           .select(['sig', 'side', 'key']))

    pay = pa.concat_tables(pay_parts).combine_chunks() if pay_parts else None
    mem = pa.concat_tables(mem_parts).combine_chunks() if mem_parts else None
    if pay is None or len(pay) == 0:
        return None, 0

    sigs = pay['sig'].to_numpy()
    order = np.argsort(sigs, kind='stable')
    ss = sigs[order]
    first = np.concatenate(([True], ss[1:] != ss[:-1]))
    take = order[first]
    uniq = ss[first]
    sub = pay.take(pa.array(take))
    ranks = sub['ranks'].combine_chunks()
    rank_off = ranks.offsets.to_numpy().astype(np.int64)
    rank_flat = (ranks.values.to_numpy(zero_copy_only=False)
                 if len(ranks.values) else np.empty(0, np.int32))

    # memberships grouped by (searchsorted sig index, side)
    m_sig = mem['sig'].to_numpy()
    m_side = mem['side'].to_numpy(zero_copy_only=False)
    m_key = mem['key'].to_numpy(zero_copy_only=False)
    m_idx = np.searchsorted(uniq, m_sig)
    n = len(uniq)

    def side_arrays(mask):
        idx = m_idx[mask]
        keys = m_key[mask]
        o = np.argsort(idx, kind='stable')
        idx, keys = idx[o], keys[o]
        counts = np.bincount(idx, minlength=n)
        off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        return off, keys

    l_off, l_flat = side_arrays(m_side == 0)
    if same_relation:
        r_off, r_flat = l_off, l_flat
    else:
        r_off, r_flat = side_arrays(m_side == 1)

    sz = sub['sz'].to_numpy().astype(np.int64)
    plen = sub['plen'].to_numpy().astype(np.int64)
    # per-shard postings-source piece (si is GLOBAL — the stitcher rebases
    # it; everything else is final, so the stitched table is a zero-copy
    # chunked concat)
    piece_tbl = pa.table({
        'sig': pa.array(uniq.astype(np.int64)),
        'si': pa.array(np.arange(n, dtype=np.int32), pa.int32()),
        'sz': pa.array(sz.astype(np.int32), pa.int32()),
        'plen': pa.array(plen.astype(np.int32), pa.int32()),
        'ranks': pa.ListArray.from_arrays(
            pa.array(rank_off, pa.int32()),
            pa.array(rank_flat, pa.int32())),
        'c_l': pa.array(np.diff(l_off)),
        'c_r': pa.array(np.diff(r_off)),
    })
    return (uniq, rank_off, rank_flat, sz, plen,
            l_off, l_flat, r_off, r_flat,
            sub['s'].to_numpy(zero_copy_only=False) if keep_string else None,
            piece_tbl), n


def _stitch_bc(same_relation, keep_string, *pieces):
    """Broadcast-object stitch: concatenate the shard pieces (already in
    global signature sort order — shards partition the HIGH bits) into the
    single verify-side broadcast.  Pure memcpy concatenation; offset arrays
    are rebased by the running totals.  The postings source does NOT pass
    through here — the shard piece tables feed candgen directly (si rebased
    per shard), so this stitch overlaps with postings + candgen."""
    pieces = [p for p in pieces if p is not None]
    if not pieces:
        return None

    def cat(i, dtype=None):
        arrs = [p[i] for p in pieces]
        out = np.concatenate(arrs)
        return out.astype(dtype) if dtype is not None else out

    def cat_off(i):
        # piece offset arrays all start at 0; rebase each by the cumulative
        # flat length of the preceding pieces
        outs, base = [np.zeros(1, np.int64)], 0
        for p in pieces:
            off = p[i]
            outs.append(off[1:].astype(np.int64) + base)
            base += int(off[-1])
        return np.concatenate(outs)

    uniq = cat(0)
    rank_off = cat_off(1)
    rank_flat = cat(2)
    sz = cat(3)
    plen = cat(4)
    l_off, l_flat = cat_off(5), cat(6)
    if same_relation:
        r_off, r_flat = l_off, l_flat
    else:
        r_off, r_flat = cat_off(7), cat(8)
    s_arr = cat(9) if keep_string else None
    return _TsigBroadcast(uniq, rank_off, rank_flat, sz, plen,
                          l_off, l_flat, r_off, r_flat, s_arr)


def _rebase_piece_tbl(base: int, nslices: int, piece):
    """Per-shard postings-source table with the GLOBAL dense si index
    (shard base + local row number), returned as ``nslices`` zero-copy
    slices so the downstream Dataset starts at full block granularity
    WITHOUT a repartition all-to-all (the barrier used to starve the
    postings stage while it waited on the exchange)."""
    tbl = piece[10]
    n = len(tbl)
    tbl = tbl.set_column(
        tbl.schema.get_field_index('si'), 'si',
        pa.array(np.arange(base, base + n, dtype=np.int32), pa.int32()))
    if nslices <= 1:
        return tbl  # num_returns=1: the bare table IS the single return
    cuts = np.linspace(0, n, nslices + 1).astype(np.int64)
    return tuple(tbl.slice(int(a), int(b - a))
                 for a, b in zip(cuts[:-1], cuts[1:]))


def _tsig_split_block(b: pa.Table, keep_string: bool) -> pa.Table:
    """Per-block combiner feeding the shard builders: block-distinct payload
    per sig tagged kind=0, memberships kind=1 — SORTED BY SIG so each
    shard builder takes a binary-search slice of the block instead of
    scanning it (see ``_build_tsig_shard``)."""
    sigs = b['sig'].to_numpy()
    order = np.argsort(sigs, kind='stable')
    ss = sigs[order]
    first = (np.concatenate(([True], ss[1:] != ss[:-1])) if len(ss)
             else np.zeros(0, bool))
    sub = b.take(pa.array(order[first]))
    n0, n1 = len(sub), len(b)
    cols = {
        'kind': pa.array(np.concatenate(
            [np.zeros(n0, np.int8), np.ones(n1, np.int8)])),
        'sig': pa.concat_arrays([sub['sig'].combine_chunks(),
                                 b['sig'].combine_chunks()]),
        'sz': pa.concat_arrays(
            [sub['sz'].combine_chunks(),
             pa.nulls(n1, b['sz'].type)]),
        'plen': pa.concat_arrays(
            [sub['plen'].combine_chunks(),
             pa.nulls(n1, b['plen'].type)]),
        'ranks': pa.concat_arrays(
            [sub['ranks'].combine_chunks(),
             pa.nulls(n1, b['ranks'].type)]),
        'side': pa.concat_arrays(
            [pa.nulls(n0, pa.int8()), b['side'].combine_chunks()]),
        'key': pa.concat_arrays(
            [pa.nulls(n0, b['key'].type), b['key'].combine_chunks()]),
    }
    if keep_string:
        cols['s'] = pa.concat_arrays(
            [sub['s'].combine_chunks(), pa.nulls(n1, pa.string())])
    out = pa.table(cols)
    final = np.concatenate([ss[first], sigs]) if len(b) else sigs
    return out.take(pa.array(np.argsort(final, kind='stable')))


def _wrap_shard(piece):
    """Shard piece tuple → per-shard ``_TsigBroadcast`` (sharded-broadcast
    scale path: the stitch never happens, each shard is its own bounded
    broadcast object)."""
    if piece is None:
        return None
    return _TsigBroadcast(*piece[:10])


def collect_tsig(tagged: ray.data.Dataset, same_relation: bool,
                 keep_string: bool, nshards: int = 8) -> tuple:
    """Fold per-block combiner outputs into the broadcast signature table
    OFF the driver: the distributed split keeps per-block work parallel,
    ``nshards`` parallel shard tasks fold disjoint signature ranges, and a
    stitch task concatenates them — the driver only ever holds object refs.
    Returns (bc_ref, postings_table_ref, num_sigs)."""
    if nshards < 1:
        raise ValueError(f'nshards must be >= 1, got {nshards}')
    # shard ranges partition the signature HIGH bits: shard s holds sigs with
    # (sig >> (64 - bit_length(nshards))) == s.  Sigs are 63-bit, so every
    # signature lands in shard < 2^(bit_length-1) <= nshards — a
    # non-power-of-two count merely leaves the top shards empty (reduced
    # parallelism), never drops data.

    def split(b: pa.Table) -> pa.Table:
        return _tsig_split_block(b, keep_string)
    split.__name__ = 'split'

    import os as _os
    import sys as _sys
    import time as _time
    _prof = _os.environ.get('SSJ_STAGE_PROF')
    _t0 = _time.time()

    def _mark(tag):
        nonlocal _t0
        if _prof:
            print(f'SSJPROF tsig.{tag} {_time.time() - _t0:.2f}',
                  file=_sys.stderr, flush=True)
        _t0 = _time.time()

    split_ds = tagged.map_batches(split, batch_format='pyarrow').materialize()
    _mark('split')
    refs = []
    for bundle in split_ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return None, None, 0
    shard_builder = ray.remote(num_cpus=1, num_returns=2)(_build_tsig_shard)
    out = [shard_builder.remote(s, nshards, same_relation,
                                keep_string, *refs)
           for s in range(nshards)]
    piece_refs = [o[0] for o in out]
    sizes = [int(x) for x in ray.get([o[1] for o in out])]
    _mark('shards')
    n = sum(sizes)
    if n == 0:
        return None, None, 0
    # the broadcast stitch is submitted but NOT waited on: the postings
    # pieces feed candgen directly (si rebased per shard below), so the
    # serial concat overlaps with the postings shuffle + candgen; only the
    # verify stage (downstream) blocks on bc_ref
    stitcher = ray.remote(num_cpus=2)(_stitch_bc)
    bc_ref = stitcher.remote(same_relation, keep_string, *piece_refs)
    # pre-split each shard into enough slices that the postings Dataset is
    # born at target block granularity (cpus*8 blocks total) — no
    # repartition barrier between the shard builders and the postings map
    cpus = int(ray.cluster_resources().get('CPU', 8))
    live = sum(1 for s_ in sizes if s_ > 0)
    nslices = max(1, -(-(cpus * 8) // max(1, live)))
    rebase = ray.remote(num_cpus=1, num_returns=nslices)(_rebase_piece_tbl)
    bases = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    tbl_refs = []
    for b, s_, pr in zip(bases, sizes, piece_refs):
        if s_ > 0:
            out_refs = rebase.remote(int(b), nslices, pr)
            tbl_refs.extend(out_refs if nslices > 1 else [out_refs])
    _mark('rebase_submit')
    return bc_ref, tbl_refs, n


def collect_tsig_shards(tagged: ray.data.Dataset, same_relation: bool,
                        keep_string: bool, nshards: int) -> tuple:
    """Sharded-broadcast Tsig build (the beyond-gate scale path): the same
    parallel shard builders as ``collect_tsig``, but the stitch never runs —
    each shard (a HIGH-BIT signature range, so shard order == global si
    order) becomes its own ``_TsigBroadcast`` ref bounded by the shard size.
    Returns ``(shard_refs, shard_starts, tbl_refs, num_sigs)`` where
    ``shard_starts[s]`` is shard s's first GLOBAL si (dense, ascending) —
    ``sp(si) = searchsorted(shard_starts, si, 'right') - 1``."""
    if nshards < 1:
        raise ValueError(f'nshards must be >= 1, got {nshards}')

    def split(b: pa.Table) -> pa.Table:
        return _tsig_split_block(b, keep_string)
    split.__name__ = 'split'

    split_ds = tagged.map_batches(split, batch_format='pyarrow').materialize()
    refs = []
    for bundle in split_ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return None, None, None, 0
    shard_builder = ray.remote(num_cpus=1, num_returns=2)(_build_tsig_shard)
    out = [shard_builder.remote(s, nshards, same_relation,
                                keep_string, *refs)
           for s in range(nshards)]
    piece_refs = [o[0] for o in out]
    sizes = [int(x) for x in ray.get([o[1] for o in out])]
    n = sum(sizes)
    if n == 0:
        return None, None, None, 0
    wrapper = ray.remote(num_cpus=1)(_wrap_shard)
    shard_refs = [wrapper.remote(pr) if s_ > 0 else None
                  for pr, s_ in zip(piece_refs, sizes)]
    bases = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.int64)
    cpus = int(ray.cluster_resources().get('CPU', 8))
    live = sum(1 for s_ in sizes if s_ > 0)
    nslices = max(1, -(-(cpus * 8) // max(1, live)))
    rebase = ray.remote(num_cpus=1, num_returns=nslices)(_rebase_piece_tbl)
    tbl_refs = []
    for b, s_, pr in zip(bases, sizes, piece_refs):
        if s_ > 0:
            out_refs = rebase.remote(int(b), nslices, pr)
            tbl_refs.extend(out_refs if nslices > 1 else [out_refs])
    return shard_refs, bases, tbl_refs, n


def tsig_postings_input(tbl_refs, num_sigs: int) -> ray.data.Dataset:
    """Dataset view of the per-shard postings-source tables built by the
    remote collect_tsig builders — constructed from REFS, never fetched to
    the driver."""
    # collect_tsig already pre-splits each shard into slices (cpus*8
    # blocks total), so the Dataset is born at the granularity the
    # downstream groupby(bucket).map_groups stage needs — repartition only
    # in the degenerate under-split case
    cpus = int(ray.cluster_resources().get('CPU', 8))
    nblocks = int(min(cpus * 8, max(cpus, num_sigs // 128, 1)))
    ds = ray.data.from_arrow_refs(list(tbl_refs))
    if len(tbl_refs) >= nblocks:
        return ds
    return ds.repartition(nblocks) if nblocks > 1 else ds


class BroadcastCandGen:
    """Per-partition candidate generation over slim postings (broadcast
    path): the shared numpy triangle kernel (``_np_candidates``) emits one
    int64 ``pair64`` = ``(si_a << 32) | si_b`` per distinct in-partition
    candidate, keyed by its verify-shuffle bucket
    ``vb = hash(pair64) % num_vbuckets``.

    Exact-once semantics live downstream: the global ``np.unique`` in
    ``BroadcastVerify`` (a pair hashes to exactly one vb group) replaces
    the round-2 per-bucket min-common-token ownership pass.  Union-over-
    buckets emission is sound: the bucket of a pair's global-min shared
    prefix token always applies a sound positional gate, and verification
    is exact."""

    def __init__(self, sim_type: str, threshold, qval=None,
                 same_relation: bool = False, num_vbuckets: int = 512,
                 bc_ref=None, heavy=None, shard_bases=None,
                 shard_sub: int = 8, skew_name: str | None = None,
                 count_mode: bool = False):
        self.__name__ = 'BroadcastCandGen'
        self.skew_name = skew_name
        self._skew_cache: dict = {}
        # count_mode (OVERLAP counting join): enumerate EVERY shared-token
        # pair occurrence (no eligibility/size pruning, no identity) and
        # emit per-partition partial counts; the verify groups sum them —
        # the sum IS the exact set overlap (routed only for corpora with
        # no heavy tokens, so the enumeration volume is provably
        # <= salt_df_threshold x total token occurrences)
        self.count_mode = count_mode
        self.sim_type = sim_type
        self.threshold = threshold
        self.qval = qval
        self.same_relation = same_relation
        self.num_vbuckets = num_vbuckets
        # sharded-broadcast routing: vb = (shard(si_a)*K + shard(si_b)) *
        # shard_sub + hash(pair64) % shard_sub, so every pair of one verify
        # group reads the SAME two shard broadcasts (bounded task memory)
        # while shard_sub keeps group sizes executor-friendly
        self.shard_bases = shard_bases
        self.shard_sub = shard_sub
        # slim-wire inputs: the broadcast signature table supplies sz/kh
        # (fetched once per worker, zero-copy) and the heavy map supplies
        # the per-token grid size g
        self.bc_ref = bc_ref
        heavy = heavy or {}
        self._hr = np.array(sorted(heavy), dtype=np.int64)
        self._hg = np.array([heavy[r][1] for r in sorted(heavy)],
                            dtype=np.int64)
        self._bc = None

    def __call__(self, tbl) -> pa.Table:
        import os as _os
        import time as _time
        prof = _os.environ.get('SSJ_KERNEL_PROF')
        _t0 = _time.perf_counter() if prof else 0.0
        if isinstance(tbl, pd.DataFrame):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        sharded = self.shard_bases is not None
        if sharded:  # (spa*K + spb)*S keyspace needs the full 64 bits
            vb_np, vb_pa = np.int64, pa.int64()
        elif self.num_vbuckets < 2 ** 15:
            vb_np, vb_pa = np.int16, pa.int16()
        else:
            vb_np, vb_pa = np.int32, pa.int32()
        empty_cols = {'vb': pa.array([], vb_pa),
                      'pair64': pa.array([], pa.int64())}
        if self.count_mode:
            empty_cols['cnt'] = pa.array([], pa.int32())
        empty = pa.table(empty_cols)
        if len(tbl) == 0:
            return empty
        if self._bc is None and self.bc_ref is not None:
            self._bc = ray.get(self.bc_ref)
        sa, sb = _np_candidates(tbl, self.sim_type, self.threshold,
                                self.same_relation, bc=self._bc,
                                heavy_arrays=(self._hr, self._hg),
                                count_mode=self.count_mode)
        if self.count_mode:
            raw = (sa << np.int64(32)) | sb if len(sa) else                 np.empty(0, np.int64)
            pair64, cnts = (np.unique(raw, return_counts=True)
                            if len(raw) else
                            (np.empty(0, np.int64), np.empty(0, np.int64)))
            # identity markers: one per signature whose min-token posting
            # lives in this partition (counts filled closed-form in the
            # verify group — cnt 0 here)
            pos = tbl['pos'].to_numpy(zero_copy_only=False)
            sig = tbl['sig'].to_numpy(zero_copy_only=False).astype(np.int64)
            idm = pos == 0
            if not self.same_relation:
                idm = idm & (tbl['hl'].to_numpy(zero_copy_only=False) > 0)                     & (tbl['hr'].to_numpy(zero_copy_only=False) > 0)
            idd = sig[idm]
            pair64 = np.concatenate(
                [pair64, (idd << np.int64(32)) | idd])
            cnts = np.concatenate([cnts, np.zeros(len(idd), np.int64)])
            if len(pair64) == 0:
                return empty
        else:
            if len(sa) == 0:
                return empty
            pair64 = np.unique((sa << np.int64(32)) | sb)
        if self.skew_name:
            from ..state.skewstats import report as _skew_report
            _skew_report(self.skew_name, 'candgen', len(pair64),
                         self._skew_cache)
        if sharded:
            kk = np.int64(len(self.shard_bases))
            ss = np.int64(self.shard_sub)
            spa = np.searchsorted(self.shard_bases,
                                  pair64 >> np.int64(32), 'right') - 1
            spb = np.searchsorted(self.shard_bases,
                                  pair64 & np.int64(0xFFFFFFFF),
                                  'right') - 1
            sub = (((pair64.view(np.uint64) * KNUTH) >> np.uint64(17))
                   % np.uint64(ss)).astype(np.int64)
            vb = (spa * kk + spb) * ss + sub
        else:
            vb = ((pair64.view(np.uint64) * KNUTH) >> np.uint64(17)) \
                % np.uint64(self.num_vbuckets)
        if prof:
            import json as _json
            _os.makedirs('/tmp/ssj_prof_cg', exist_ok=True)
            with open(f'/tmp/ssj_prof_cg/{_os.getpid()}.jsonl', 'a') as f:
                f.write(_json.dumps(
                    {'n_post': len(tbl), 'n_cand': len(pair64),
                     'sec': round(_time.perf_counter() - _t0, 4)}) + '\n')
        out_cols = {'vb': pa.array(vb.astype(vb_np), vb_pa),
                    'pair64': pa.array(pair64, pa.int64())}
        if self.count_mode:
            out_cols['cnt'] = pa.array(cnts.astype(np.int32), pa.int32())
        return pa.table(out_cols)


class BroadcastVerify:
    """Per-verify-bucket exact-once verification: ``np.unique`` over the
    incoming pair64s (a pair hashes to exactly one vb group, so this dedup
    is global), ONE prefix intersection per unique pair (pov/pamax/pbmax),
    the position-filter upper bound, exact tail-overlap (or Levenshtein)
    verification, and membership expansion to final
    (l_key, r_key, _sim_score) record pairs."""

    def __init__(self, bc_ref, sim_type: str, threshold, comp_op: str,
                 qval=None, same_relation: bool = False,
                 self_join: bool = False, round_score: bool = True,
                 counter_name=None, shard_refs=None, shard_bases=None,
                 skew_name: str | None = None):
        self.__name__ = 'BroadcastVerify'
        self.skew_name = skew_name
        self._skew_cache: dict = {}
        self.bc_ref = bc_ref
        self.sim_type = sim_type
        self.threshold = threshold
        self.comp_op = comp_op
        self.comp_fn = COMP_OP_MAP[comp_op]
        self.qval = qval
        self.same_relation = same_relation
        self.self_join = self_join
        self.round_score = round_score
        self.counter_name = counter_name
        # sharded-broadcast mode: every pair of a group lives in ONE
        # (shard_a, shard_b) cell (BroadcastCandGen routed it there), so the
        # task fetches at most two bounded shard broadcasts instead of the
        # stitched table
        self.shard_refs = shard_refs
        self.shard_bases = shard_bases
        self._bc = None
        self._shards: dict = {}
        self._counter = None  # actor handle cached once per task

    def _shard(self, sp: int):
        if sp not in self._shards:
            self._shards[sp] = ray.get(self.shard_refs[sp])
        return self._shards[sp]

    def _sides(self, ia: np.ndarray, ib: np.ndarray):
        """(bcA, la, bcB, lb): per-side broadcast + LOCAL indices.  In
        stitched mode both sides are the one global table."""
        if self.shard_bases is None:
            if self._bc is None:
                self._bc = ray.get(self.bc_ref)
            return self._bc, ia, self._bc, ib
        spa = int(np.searchsorted(self.shard_bases, ia[0], 'right') - 1)
        spb = int(np.searchsorted(self.shard_bases, ib[0], 'right') - 1)
        return (self._shard(spa), ia - self.shard_bases[spa],
                self._shard(spb), ib - self.shard_bases[spb])

    def _empty(self) -> pd.DataFrame:
        return pd.DataFrame({'l_key': np.array([], object),
                             'r_key': np.array([], object),
                             '_sim_score': np.array([], np.float64)})

    def __call__(self, tbl) -> pd.DataFrame:
        import os as _os
        import time as _time
        prof = _os.environ.get('SSJ_KERNEL_PROF')
        _t = _time.perf_counter() if prof else 0.0
        _ph: dict = {}

        def _mark(name):
            nonlocal _t
            if prof:
                now = _time.perf_counter()
                _ph[name] = _ph.get(name, 0.0) + (now - _t)
                _t = now

        if isinstance(tbl, pd.DataFrame):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if len(tbl) == 0:
            return self._empty()
        cand = np.unique(tbl['pair64'].to_numpy(zero_copy_only=False))
        if len(cand) == 0:
            return self._empty()
        ia = (cand >> np.int64(32)).astype(np.int64)
        ib = (cand & np.int64(0xFFFFFFFF)).astype(np.int64)
        bcA, la, bcB, lb = self._sides(ia, ib)
        is_ed = self.sim_type == 'EDIT_DISTANCE'
        _mark('setup')

        # ---- one prefix-intersection join computes, per UNIQUE pair:
        #   pov    = |prefix_A ∩ prefix_B|,
        #   pamax/pbmax = positions of the LAST shared prefix token in each
        #            full sorted rank array.
        # Sound position-filter bound (reference semantics generalized to
        # the whole prefix, filter/position_filter.py:340-344): every shared
        # token ranked below the last shared prefix token is itself in both
        # prefixes, so  overlap <= pov + min(szA-1-pamax, szB-1-pbmax).
        # EDIT_DISTANCE never reads pov/pamax/pbmax (its verify is the exact
        # Levenshtein on the strings) — skip the whole pass.
        n_pairs = len(ia)
        pov = pamax = pbmax = None
        if not is_ed:
            plA = np.minimum(bcA.rank_off[la + 1] - bcA.rank_off[la],
                             bcA.plen[la])
            plB = np.minimum(bcB.rank_off[lb + 1] - bcB.rank_off[lb],
                             bcB.plen[lb])

            def pref_keys(bcS, idx, pl):
                # (pid << 32 | tok) keys over each pair's prefix slice; pid
                # ascends block-wise and tok ascends within each block (rank
                # arrays are sorted), so the keys come out GLOBALLY sorted —
                # the whole intersection is sort-free
                tot = int(pl.sum())
                seg = np.concatenate(([0], np.cumsum(pl))).astype(np.int64)
                if tot == 0:
                    return (np.empty(0, np.uint64), np.empty(0, np.int64),
                            np.empty(0, np.int64), seg)
                pid = np.repeat(np.arange(n_pairs, dtype=np.int64), pl)
                off = np.arange(tot, dtype=np.int64) - np.repeat(seg[:-1], pl)
                tok = bcS.rank_flat[np.repeat(bcS.rank_off[idx], pl) + off]
                key = ((pid.astype(np.uint64) << np.uint64(32))
                       | tok.astype(np.uint64))
                return key, pid, off, seg

            keyA, pidA, offA, segA = pref_keys(bcA, la, plA)
            keyB, pidB, offB, segB = pref_keys(bcB, lb, plB)
            pov = np.zeros(n_pairs, dtype=np.int64)
            pamax = np.zeros(n_pairs, dtype=np.int64)
            pbmax = np.zeros(n_pairs, dtype=np.int64)
            if len(keyA) and len(keyB):
                loc = np.searchsorted(keyA, keyB)
                loc = np.minimum(loc, len(keyA) - 1)
                hit = keyA[loc] == keyB
                if hit.any():
                    # hits stay sorted by (pid, tok): min/max per pid are
                    # the first/last element of each pid run
                    hpid = pidB[hit]
                    brk = np.flatnonzero(hpid[1:] != hpid[:-1])
                    ifirst = np.concatenate(([0], brk + 1))
                    ilast = np.concatenate((brk, [len(hpid) - 1]))
                    pu = hpid[ifirst]
                    pov = np.bincount(hpid, minlength=n_pairs)
                    pamax[pu] = (loc[hit] - segA[hpid])[ilast]
                    pbmax[pu] = offB[hit][ilast]

        cntA = bcA.l_key_off[la + 1] - bcA.l_key_off[la]
        cntB = bcB.r_key_off[lb + 1] - bcB.r_key_off[lb]
        # counter semantics: unique candidate pairs entering verification
        # (== round 2's ownership survivors), record-pair weighted
        checked = int((cntA * cntB).sum())
        if self.skew_name:
            from ..state.skewstats import report as _skew_report
            _skew_report(self.skew_name, 'verify', checked,
                         self._skew_cache)
        if self.counter_name and checked:
            try:
                if self._counter is None:
                    self._counter = ray.get_actor(self.counter_name)
                self._counter.add.remote(checked)
            except ValueError:
                pass

        if not is_ed:
            szA = bcA.sz[la]
            szB = bcB.sz[lb]
            ovt = bounds.overlap_threshold_many(szA, szB, self.sim_type,
                                                self.threshold)
            ub = pov + np.minimum(szA - 1 - pamax, szB - 1 - pbmax)
            keep = ub >= ovt
            ia, ib, la, lb = ia[keep], ib[keep], la[keep], lb[keep]
            cntA, cntB = cntA[keep], cntB[keep]
            pov, pamax, pbmax = pov[keep], pamax[keep], pbmax[keep]
        _mark('intersect')
        if len(ia) == 0:
            return self._empty()

        # ---- exact verification --------------------------------------
        if is_ed:
            keep = np.abs(bcA.s_len[la] - bcB.s_len[lb]) <= self.threshold
            ia, ib, la, lb = ia[keep], ib[keep], la[keep], lb[keep]
            cntA, cntB = cntA[keep], cntB[keep]
            if len(ia) == 0:
                return self._empty()
            scores = _lev_many(bcA.s[la].tolist(),
                               bcB.s[lb].tolist()).astype(np.float64)
        else:
            # overlap = pov + |tail_A ∩ tail_B| where the tails start just
            # after the last shared prefix position (all earlier shared
            # tokens are already in pov — see bound derivation above).
            # Tails are tiny for pruned survivors; a numpy sort-merge over
            # (pid, token) keys replaces round 2's full-array explode join.
            o = pov + self._tail_overlap(bcA, la, bcB, lb, pamax, pbmax)
            n1 = bcA.sz[la].astype(np.float64)
            n2 = bcB.sz[lb].astype(np.float64)
            of = o.astype(np.float64)
            st = self.sim_type
            if st == 'OVERLAP':
                scores = of
            elif st == 'OVERLAP_COEFFICIENT':
                scores = of / np.minimum(n1, n2)
            elif st == 'JACCARD':
                scores = of / (n1 + n2 - of)
            elif st == 'COSINE':
                scores = of / np.sqrt(n1 * n2)
            elif st == 'DICE':
                scores = 2.0 * of / (n1 + n2)
            else:  # pragma: no cover
                raise ValueError(st)
            if self.round_score and st in ('JACCARD', 'COSINE', 'DICE'):
                scores = np.round(scores, 4)
        keep = self.comp_fn(scores, self.threshold)
        ia, ib, la, lb = ia[keep], ib[keep], la[keep], lb[keep]
        cntA, cntB, scores = cntA[keep], cntB[keep], scores[keep]
        _mark('verify')
        if len(ia) == 0:
            return self._empty()

        out_l, out_r, out_s = self._expand_members(
            bcA, la, bcB, lb, ia, ib, cntA, cntB, scores)
        _mark('expand')
        if prof:
            import json as _json
            _os.makedirs('/tmp/ssj_prof', exist_ok=True)
            with open(f'/tmp/ssj_prof/{_os.getpid()}.jsonl', 'a') as f:
                f.write(_json.dumps({'n_in': len(tbl),
                                     'n_uniq': len(cand),
                                     'n_out': len(out_l), **_ph}) + '\n')
        return pd.DataFrame({'l_key': out_l, 'r_key': out_r,
                             '_sim_score': out_s})

    @staticmethod
    def _tail_overlap(bcA: _TsigBroadcast, la: np.ndarray,
                      bcB: _TsigBroadcast, lb: np.ndarray,
                      pamax: np.ndarray, pbmax: np.ndarray) -> np.ndarray:
        """|A[pamax+1:] ∩ B[pbmax+1:]| per pair, via a sort-merge over
        (pair, token) keys.  Set tokenizers make per-side tokens unique, so
        the match count is the exact intersection size."""
        m = len(la)
        startsA = bcA.rank_off[la] + pamax + 1
        lensA = np.maximum(bcA.rank_off[la + 1] - startsA, 0)
        startsB = bcB.rank_off[lb] + pbmax + 1
        lensB = np.maximum(bcB.rank_off[lb + 1] - startsB, 0)

        def keys(bcS, starts, lens):
            tot = int(lens.sum())
            if tot == 0:
                return np.empty(0, np.uint64), np.empty(0, np.int64)
            pid = np.repeat(np.arange(m, dtype=np.int64), lens)
            off = (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                               lens))
            tok = bcS.rank_flat[np.repeat(starts, lens) + off]
            return ((pid.astype(np.uint64) << np.uint64(32))
                    | tok.astype(np.uint64)), pid

        keyA, _ = keys(bcA, startsA, lensA)
        keyB, pidB = keys(bcB, startsB, lensB)
        out = np.zeros(m, dtype=np.int64)
        if len(keyA) == 0 or len(keyB) == 0:
            return out
        keyA.sort()
        pos = np.searchsorted(keyA, keyB)
        pos = np.minimum(pos, len(keyA) - 1)
        hit = keyA[pos] == keyB
        if hit.any():
            np.add.at(out, pidB[hit], 1)
        return out

    def _expand_members(self, bcA, la, bcB, lb, ia, ib, cntA, cntB,
                        scores):
        """Membership expansion of surviving sig pairs, slabbed over the
        FLAT expansion space (like _CAND_SLAB in candgen): a single giant
        duplicate class (m identical records → one sig pair with tot = m²
        expanded rows) must not drive one unbounded np.repeat/np.arange
        allocation — each slab's transient arrays are bounded regardless
        of per-pair tot."""
        nl, nr = cntA, cntB
        tot = (nl * nr).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(tot)))
        total = int(cum[-1])
        offA_k = bcA.l_key_off[la]
        offB_k = bcB.r_key_off[lb]
        parts_l, parts_r, parts_s = [], [], []
        for s in range(0, total, _EXPAND_SLAB):
            e = min(s + _EXPAND_SLAB, total)
            flat = np.arange(s, e, dtype=np.int64)
            pair_idx = np.searchsorted(cum, flat, 'right') - 1
            off = flat - cum[pair_idx]
            nr_p = nr[pair_idx]
            out_l = bcA.l_key_flat[offA_k[pair_idx] + off // nr_p]
            out_r = bcB.r_key_flat[offB_k[pair_idx] + off % nr_p]
            out_s = scores[pair_idx]
            if self.self_join:
                # candidates are canonical (ia <= ib): orient each expanded
                # record pair (min, max).  Identity sig pairs (ia == ib)
                # expand to the full A x A cross — keep only the upper
                # triangle or min/max would double-count each unordered pair
                ident = (ia == ib)[pair_idx]
                lo = np.minimum(out_l, out_r)
                hi = np.maximum(out_l, out_r)
                keep = (lo < hi) & (~ident | (out_l < out_r))
                out_l, out_r, out_s = lo[keep], hi[keep], out_s[keep]
            elif self.same_relation:
                # full pair-matrix semantics (jaccard_join(A, A)):
                # canonical sig pairs carry both record-pair orientations;
                # identity sig pairs already expand to the full A x A cross
                mirror = (ia != ib)[pair_idx]
                ml, mr, ms = out_r[mirror], out_l[mirror], out_s[mirror]
                out_l = np.concatenate([out_l, ml])
                out_r = np.concatenate([out_r, mr])
                out_s = np.concatenate([out_s, ms])
            parts_l.append(out_l)
            parts_r.append(out_r)
            parts_s.append(out_s)
        return (np.concatenate(parts_l) if parts_l else np.empty(0, np.int64),
                np.concatenate(parts_r) if parts_r else np.empty(0, np.int64),
                np.concatenate(parts_s) if parts_s else
                np.empty(0, np.float64))


def _distinct_counts(bc: _TsigBroadcast, idx: np.ndarray) -> np.ndarray:
    """Per-signature DISTINCT token counts over the (sorted, possibly
    bag) rank slices — one consecutive-dedup pass, vectorized."""
    lens = (bc.rank_off[idx + 1] - bc.rank_off[idx]).astype(np.int64)
    tot = int(lens.sum())
    if tot == 0:
        return np.zeros(len(idx), np.int64)
    seg = np.concatenate(([0], np.cumsum(lens)))
    pos = np.arange(tot, dtype=np.int64) - np.repeat(seg[:-1], lens)
    v = bc.rank_flat[np.repeat(bc.rank_off[idx], lens) + pos]
    first = pos == 0
    ne = np.empty(tot, bool)
    ne[0] = True
    ne[1:] = v[1:] != v[:-1]
    keep = first | ne
    row = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
    return np.bincount(row[keep], minlength=len(idx))


class CountVerify(BroadcastVerify):
    """OVERLAP counting reduce (the distributed twin of the local
    counting kernel, reference anchor
    ``/root/reference/py_stringsimjoin/join/overlap_join_py.py`` full-
    index counting): sums the per-partition partial counts per unique
    pair — the sum IS the exact set overlap, so there is NO intersection
    pass — fills identity pairs' counts in closed form from the
    signature table, applies comp_op, and expands memberships."""

    def __call__(self, tbl) -> pd.DataFrame:
        if isinstance(tbl, pd.DataFrame):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if len(tbl) == 0:
            return self._empty()
        p64 = tbl['pair64'].to_numpy(zero_copy_only=False)
        cnt = tbl['cnt'].to_numpy(zero_copy_only=False).astype(np.int64)
        cand, inv = np.unique(p64, return_inverse=True)
        counts = np.bincount(inv, weights=cnt).astype(np.int64)
        ia = (cand >> np.int64(32)).astype(np.int64)
        ib = (cand & np.int64(0xFFFFFFFF)).astype(np.int64)
        bcA, la, bcB, lb = self._sides(ia, ib)
        ident = ia == ib
        if ident.any():
            sel = np.flatnonzero(ident)
            counts[sel] = _distinct_counts(bcA, la[sel])
        cntA = bcA.l_key_off[la + 1] - bcA.l_key_off[la]
        cntB = bcB.r_key_off[lb + 1] - bcB.r_key_off[lb]
        checked = int((cntA * cntB).sum())
        if self.skew_name:
            from ..state.skewstats import report as _skew_report
            _skew_report(self.skew_name, 'verify', checked,
                         self._skew_cache)
        if self.counter_name and checked:
            try:
                if self._counter is None:
                    self._counter = ray.get_actor(self.counter_name)
                self._counter.add.remote(checked)
            except ValueError:
                pass
        scores = counts.astype(np.float64)
        keep = self.comp_fn(scores, self.threshold)
        ia, ib, la, lb = ia[keep], ib[keep], la[keep], lb[keep]
        cntA, cntB, scores = cntA[keep], cntB[keep], scores[keep]
        if len(ia) == 0:
            return self._empty()
        out_l, out_r, out_s = self._expand_members(
            bcA, la, bcB, lb, ia, ib, cntA, cntB, scores)
        return pd.DataFrame({'l_key': out_l, 'r_key': out_r,
                             '_sim_score': out_s})


# Above this estimated signature-table size the broadcast regime gives way
# to the distributed attach passes (no single node should hold the table).
# The floor is 2 GiB; when the per-node object store is large the gate
# scales to 15% of it (the broadcast is ONE mmapped copy per node, so the
# budget that matters is per-node plasma capacity, not cluster total).
_BROADCAST_GATE_FLOOR = 2 * 1024 ** 3


def broadcast_gate_bytes() -> int:
    import os
    env = os.environ.get('SSJ_BROADCAST_GATE_BYTES')
    if env:
        return int(env)
    try:
        total = ray.cluster_resources().get('object_store_memory', 0)
        nodes = max(1, len([n for n in ray.nodes() if n.get('Alive', True)]))
        return max(_BROADCAST_GATE_FLOOR, int(0.15 * total / nodes))
    except Exception:  # pragma: no cover - ray not initialised
        return _BROADCAST_GATE_FLOOR


BROADCAST_GATE_BYTES = _BROADCAST_GATE_FLOOR  # back-compat alias


def slim_match_pairs(ranked_l, ranked_r, cfg, heavy_ref,
                     same_relation: bool,
                     size_bytes_hint: int | None = None) -> ray.data.Dataset:
    """ranked datasets (key, sz, ranks, plen[, s]) → Dataset of
    (l_key, r_key, _sim_score)."""
    import os
    keep_string = cfg.keep_string
    nb = cfg.num_buckets
    sig_stage = SigStage(hash_string=keep_string)

    def tag(ds, side):
        def f(b: pa.Table) -> pa.Table:
            b = sig_stage(b)
            return b.append_column(
                'side', pa.array(np.full(len(b), side, np.int8)))
        f.__name__ = f'sig_side{side}'
        return ds.map_batches(f, batch_format='pyarrow')

    if same_relation:
        tagged = tag(ranked_l, 0)
    else:
        tagged = tag(ranked_l, 0).union(tag(ranked_r, 1))

    force_dist = (getattr(cfg, 'force_distributed', False)
                  or os.environ.get('SSJ_FORCE_DISTRIBUTED') == '1')
    use_broadcast = (not force_dist) and (
        size_bytes_hint is None or size_bytes_hint < broadcast_gate_bytes())

    if use_broadcast:
        # the one candidate-generation shuffle is a sort by bucket —
        # push-based shuffle pipelines the merge with the map side
        # (measured 1.6x on the flagship's 29M-posting exchange).  Each
        # Dataset snapshots the DataContext at creation, so the ambient
        # strategy is restored for the CALLER's unrelated pipelines while
        # this join's datasets keep push-based.
        from ray.data.context import ShuffleStrategy
        ctx = ray.data.DataContext.get_current()
        prev_strategy = ctx.shuffle_strategy
        _strat = os.environ.get('SSJ_SHUFFLE_STRATEGY',
                                'SORT_SHUFFLE_PUSH_BASED')
        ctx.shuffle_strategy = getattr(ShuffleStrategy, _strat)
        # the executor's per-operator resource reservation splits the CPU
        # budget among ALL operators of this 5-op plan, so each barrier-
        # separated stage runs at ~1/5 of the cluster while the others sit
        # idle behind the sort barriers (measured: join window 25.0 s ->
        # 13.0 s at 8 CPUs with reservation off, identical output).  The
        # sorts serialize the stages anyway, so whichever stage has
        # runnable tasks should own the whole cluster.
        prev_reserve = ctx.op_resource_reservation_enabled
        if os.environ.get('SSJ_OP_RESERVATION') != '1':
            ctx.op_resource_reservation_enabled = False
        prev_nagg = ctx.max_hash_shuffle_aggregators
        prev_ppc = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
        if _strat == 'HASH_SHUFFLE':
            # aggregator actors reserve num_partitions x per-partition CPU
            # PER shuffle operator; the defaults (200 x 0.0625 = 12.5 CPUs
            # per op) oversubscribe small clusters and stall the plan behind
            # min_hash_shuffle_aggregator_wait_time_in_s
            ncpu = int(ray.cluster_resources().get('CPU', 8))
            ctx.max_hash_shuffle_aggregators = int(os.environ.get(
                'SSJ_HASH_AGGREGATORS', str(max(2, ncpu // 2))))
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
                float(os.environ.get('SSJ_HASH_CPU_PER_PART',
                                     str(max(1.0, ncpu / 8.0) / 200.0)))
        try:
            from ..pipelines.join import _prof_mark
            prof = _prof_mark()
            bc_ref, tbl_refs, nsig = collect_tsig(tagged, same_relation,
                                                  keep_string)
            prof('collect_tsig')
            if bc_ref is None:
                return ray.data.from_pandas(pd.DataFrame({
                    'l_key': np.array([], object),
                    'r_key': np.array([], object),
                    '_sim_score': np.array([], np.float64)}))
            # data-dependent, CLUSTER-independent: the kernel-call count
            # (and so the total candgen work) must not depend on cluster
            # size, only the packing does — but a fixed count would make
            # each partition group unboundedly large at corpus scale, so
            # it grows with the signature count (256 up to ~25M sigs,
            # ~100k sigs per partition beyond)
            nparts = _candgen_parts(nsig)
            heavy = {}
            if heavy_ref is not None:
                heavy = (ray.get(heavy_ref)
                         if isinstance(heavy_ref, ray.ObjectRef)
                         else heavy_ref)
            postings = tsig_postings_input(tbl_refs, nsig).map_batches(
                SlimPostingsStage(nb, heavy_ref,
                                  emit_sides=not same_relation,
                                  num_parts=nparts, slim_wire=True),
                batch_format='pyarrow')
            # profiling aid: SSJ_JOIN_STAGE_BARRIERS=1 splits the 5-op plan
            # at the two shuffle seams so per-stage walls are attributable
            # (measured within noise of the fused plan at bench scale)
            if os.environ.get('SSJ_JOIN_STAGE_BARRIERS') == '1':
                postings = postings.materialize()
            count_join = getattr(cfg, 'count_join', False)
            cand = postings.groupby('part').map_groups(
                BroadcastCandGen(cfg.sim_type, cfg.threshold, cfg.qval,
                                 same_relation=same_relation,
                                 num_vbuckets=nb, bc_ref=bc_ref,
                                 heavy=heavy,
                                 skew_name=getattr(cfg, 'skew_name', None),
                                 count_mode=count_join),
                batch_format='pyarrow')
            if os.environ.get('SSJ_JOIN_STAGE_BARRIERS') == '1':
                cand = cand.materialize()
            vcls = CountVerify if count_join else BroadcastVerify
            fn = vcls(
                bc_ref, cfg.sim_type, cfg.threshold, cfg.comp_op, cfg.qval,
                same_relation=same_relation, self_join=cfg.self_join,
                round_score=True, counter_name=cfg.counter_name,
                skew_name=getattr(cfg, 'skew_name', None))
            return cand.groupby('vb').map_groups(fn, batch_format='pyarrow')
        finally:
            ctx.shuffle_strategy = prev_strategy
            ctx.max_hash_shuffle_aggregators = prev_nagg
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override \
                = prev_ppc
            ctx.op_resource_reservation_enabled = prev_reserve


    # ---- sharded-broadcast scale path ------------------------------------
    # Tsig is built by the SAME parallel shard builders as the broadcast
    # path, but never stitched: each shard (a HIGH-BIT signature range) is
    # its own bounded _TsigBroadcast ref.  Candidate pairs route by shard
    # PAIR (BroadcastCandGen.shard_bases), so a verify task reads at most
    # TWO shards (~SSJ_SHARD_TARGET_BYTES each, zero-copy per node) and the
    # rank arrays never ride a pair exchange — the pair streams carry 8-B
    # pair64s end to end.  Replaces the former five-barrier attach/expand
    # pipeline (measured on the 3x/4.46M-file corpus at 32 CPUs: 247 s);
    # the only full-payload exchanges left are the split combiner and the
    # shard builders' object reads.
    from ray.data.context import ShuffleStrategy
    ctx = ray.data.DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = getattr(
        ShuffleStrategy,
        os.environ.get('SSJ_SHUFFLE_STRATEGY', 'SORT_SHUFFLE_PUSH_BASED'))
    prev_reserve = ctx.op_resource_reservation_enabled
    if os.environ.get('SSJ_OP_RESERVATION') != '1':
        ctx.op_resource_reservation_enabled = False
    try:
        target = int(os.environ.get('SSJ_SHARD_TARGET_BYTES',
                                    str(256 * 1024 ** 2)))
        est = size_bytes_hint or (2 * _BROADCAST_GATE_FLOOR)
        # shard builders take binary-search SLICES of the sig-sorted split
        # blocks (round 5), so per-shard build cost is its own bytes plus
        # O(blocks · log) — shard count scales freely with data size and
        # the cap is only a task-count sanity bound (it previously had to
        # be 64 because each builder scanned ALL blocks)
        max_sh = int(os.environ.get('SSJ_MAX_SHARDS', '1024'))
        nsh = min(max(8, -(-int(est) // target)), max_sh)
        nsh = 1 << (int(nsh) - 1).bit_length()  # pow2: no empty top shards
        shard_refs, bases, tbl_refs, nsig = collect_tsig_shards(
            tagged, same_relation, keep_string, nsh)
        if nsig == 0:
            return ray.data.from_pandas(pd.DataFrame({
                'l_key': np.array([], object),
                'r_key': np.array([], object),
                '_sim_score': np.array([], np.float64)}))
        heavy = {}
        if heavy_ref is not None:
            heavy = (ray.get(heavy_ref)
                     if isinstance(heavy_ref, ray.ObjectRef) else heavy_ref)
        postings = tsig_postings_input(tbl_refs, nsig).map_batches(
            SlimPostingsStage(nb, heavy_ref, emit_sides=not same_relation,
                              num_parts=_candgen_parts(nsig)),
            batch_format='pyarrow')
        count_join = getattr(cfg, 'count_join', False)
        cand = postings.groupby('part').map_groups(
            BroadcastCandGen(cfg.sim_type, cfg.threshold, cfg.qval,
                             same_relation=same_relation,
                             heavy=heavy, shard_bases=bases,
                             shard_sub=int(os.environ.get(
                                 'SSJ_SHARD_SUB', '8')),
                             skew_name=getattr(cfg, 'skew_name', None),
                             count_mode=count_join),
            batch_format='pyarrow')
        vcls = CountVerify if count_join else BroadcastVerify
        fn = vcls(
            None, cfg.sim_type, cfg.threshold, cfg.comp_op, cfg.qval,
            same_relation=same_relation, self_join=cfg.self_join,
            round_score=True, counter_name=cfg.counter_name,
            skew_name=getattr(cfg, 'skew_name', None),
            shard_refs=shard_refs, shard_bases=bases)
        return cand.groupby('vb').map_groups(fn, batch_format='pyarrow')
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.op_resource_reservation_enabled = prev_reserve
