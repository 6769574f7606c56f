"""Size-gated local fast path for ``mode='join'``.

A Ray Data pipeline pays ~8 stage barriers (tokenize, vocabulary,
signature fold, postings shuffle, candgen, verify, expand) at 0.3-0.6 s
of fixed scheduling/exchange latency each — irrelevant at 100 TB, but it
makes a 10k x 10k join ~30x slower than the reference's single-process
loop (measured: 4.6 s warm vs 0.39 s).  This module runs the SAME stage
kernels (``TokenizeStage`` -> rank lookup -> ``RankPrefixStage`` ->
``SigStage`` -> Tsig fold -> ``SlimPostingsStage`` -> ``_np_candidates``
-> ``BroadcastVerify``) synchronously on in-memory Arrow tables, fanning
candidate generation and verification out to plain Ray tasks when the
work is large enough to parallelize — no Dataset machinery, so the whole
join is kernel-bound.

Gate: both inputs at most ``SSJ_LOCAL_MAX_ROWS`` (default 200k) total
rows, probed at bounded cost (``len(df)`` for pandas;
``ds.limit(cap).count()`` for Datasets — the limit early-terminates
streaming execution, so the probe never scans more than the cap even on
a 100 TB input).  Beyond the gate the distributed slim-postings pipeline
(stages/slimjoin.py) runs unchanged.  ``SSJ_LOCAL_JOIN=0`` disables the
fast path, ``=force`` takes it regardless of size (tests use both to
pin path equivalence).

Output parity: candidate recall is guaranteed for ANY consistent global
token order by prefix-filter theory (verification is exact), and
EDIT_DISTANCE — whose approximate recall DOES depend on the order —
uses the same (count asc, token asc) ordering as the distributed path's
``make_rank_lookup(tie='token')``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..core.comp_ops import COMP_OP_MAP
from .postings import RankPrefixStage, heavy_token_table, make_rank_lookup
from .slimjoin import (BroadcastVerify, SigStage, SlimPostingsStage,
                       _np_candidates, _TsigBroadcast)
from .tokenize import TokenizeStage, partial_token_counts

DEFAULT_LOCAL_MAX_ROWS = 1_000_000
# the row cap alone routes by CARDINALITY; the byte cap routes by PAYLOAD —
# a 600k-row corpus of 5-token strings (a few MB) joins fastest in-process,
# while 600k long documents (hundreds of MB of text) amortize the
# distributed pipeline's stage barriers and must go there.  Measured on the
# asv synthetic shape at 150k x 150k rows: local 1.8 s vs distributed 8.8 s
# (the distributed prep is ~4 s of fixed barrier latency at any size).
DEFAULT_LOCAL_MAX_BYTES = 128 * 1024 ** 2
# above these, candgen / verify fan out to plain Ray tasks (ms-latency)
_FANOUT_POSTINGS = 300_000
_FANOUT_PAIRS = 250_000
# candgen cost tracks per-bucket pair tests (sum of squared bucket sizes),
# not posting count: a 5-token prefix over 15k records is only 75k postings
# but can mean 10^8 pair tests concentrated in a few dense buckets
_FANOUT_WORK = 5_000_000


def local_join_eligible(ltable, rtable, cfg, same_relation: bool) -> bool:
    """Flag/mode gate only — the size gate lives in ``_fetch_local``, which
    probes and materializes in the same bounded pass."""
    if cfg.mode != 'join':
        return False
    flag = os.environ.get('SSJ_LOCAL_JOIN', '1')
    if flag == '0':
        return False
    if getattr(cfg, 'force_distributed', False) \
            or os.environ.get('SSJ_FORCE_DISTRIBUTED') == '1' \
            or os.environ.get('SSJ_DISTRIBUTED_ORDERING') == '1' \
            or getattr(cfg, 'distributed_ordering', False):
        return False
    return True


def _local_row_cap() -> int:
    if os.environ.get('SSJ_LOCAL_JOIN') == 'force':
        return 2 ** 62  # tests pin path parity regardless of size
    return int(os.environ.get('SSJ_LOCAL_MAX_ROWS', DEFAULT_LOCAL_MAX_ROWS))


def _local_byte_cap() -> int:
    if os.environ.get('SSJ_LOCAL_JOIN') == 'force':
        return 2 ** 62
    return int(os.environ.get('SSJ_LOCAL_MAX_BYTES',
                              DEFAULT_LOCAL_MAX_BYTES))


def _cheap_size_bytes(table) -> int | None:
    """Metadata-only size estimate, or None when computing it would
    execute the plan: available for materialized datasets and bare reads
    (parquet metadata).  Private-API access is fully guarded — any shape
    change in Ray just disables the shortcut."""
    try:
        plan = table._plan
        if plan.has_computed_output():
            return table.size_bytes()
        dag = plan._logical_plan.dag
        if type(dag).__name__ == 'Read' and not dag.input_dependencies:
            # read the estimate off the Read op's metadata DIRECTLY:
            # Dataset.size_bytes() on a non-computed plan falls back to
            # plan.execute() when the datasource reports no size — the
            # exact full read this shortcut exists to avoid.  size_bytes
            # is None for such sources, disabling the shortcut.
            return dag.infer_metadata().size_bytes
    except Exception:  # pragma: no cover - internal API drift
        return None
    return None


def _fetch_local(table, cols: list, cap: int,
                 byte_cap: int) -> pa.Table | None:
    """Probe-and-fetch in ONE bounded pass: materialize at most ``cap + 1``
    rows (and stop early past ``byte_cap`` bytes) of the needed columns;
    None means the input exceeds a gate and the caller must take the
    distributed pipeline.  ``limit()`` pushes into the streaming executor
    (and into parquet reads), so a 100 TB input pays O(cap) rows here —
    and a small input pays a single Dataset execution instead of a
    count() probe plus a separate to_pandas()."""
    cols = list(dict.fromkeys(cols))
    if isinstance(table, pd.DataFrame):
        if len(table) > cap:
            return None
        t = pa.Table.from_pandas(table[cols].reset_index(drop=True),
                                 preserve_index=False)
        return None if t.nbytes > byte_cap else t
    # metadata shortcut: when a free full-table size estimate says the
    # input is so large that even a small column fraction must exceed the
    # byte gate, reject without reading anything — a 100 TB read must not
    # pay the O(byte_cap) probe below.  64x margin: size_bytes covers ALL
    # columns while we fetch only key+join, so only reject when the
    # projection could not plausibly fit.
    est = _cheap_size_bytes(table)
    if est is not None and byte_cap < 2 ** 61 and est > 64 * byte_cap:
        return None
    try:
        limited = table.select_columns(cols) if cap >= 2 ** 62 \
            else table.select_columns(cols).limit(cap + 1)
        parts, got = [], 0
        for b in limited.iter_batches(batch_size=None,
                                      batch_format='pyarrow'):
            t = pa.table(b)
            parts.append(t)
            got += t.nbytes
            if got > byte_cap:  # stop consuming the stream early
                return None
    except Exception:  # pragma: no cover - unreadable input → distributed
        return None
    if not parts:  # empty input: let the distributed path shape the schema
        return None
    t = pa.concat_tables(parts).combine_chunks()
    if len(t) > cap:
        return None
    return t


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({'l_key': np.array([], object),
                         'r_key': np.array([], object),
                         '_sim_score': np.array([], np.float64)})


def _local_empties(cfg, tok_l: pa.Table, tok_r: pa.Table) -> dict:
    """allow_empty inputs, mirroring join._empty_key_lists semantics."""
    empties: dict = {}
    if cfg.allow_empty and cfg.sim_type not in ('OVERLAP', 'EDIT_DISTANCE') \
            and cfg.mode != 'overlap_candidates':
        for name, t in (('l', tok_l), ('r', tok_r)):
            m = pc.equal(pc.list_value_length(t['tokens']), 0)
            empties[name] = t['key'].filter(m).to_pylist()
    return empties


def _local_lut(tok_tables: list, cfg):
    """Vocabulary + ordering artifact, built in-process.  Set measures use
    the hash tie-break (any consistent order is exact under verification);
    EDIT_DISTANCE keeps the reference's (count, token) order, which its
    approximate recall depends on."""
    parts = [partial_token_counts(t) for t in tok_tables if len(t)]
    parts = [p for p in parts if len(p)]
    if not parts:
        return ({'hashes': np.empty(0, np.uint64),
                 'ranks': np.empty(0, np.int32)}, {}, 0)
    merged = pa.concat_tables(parts)
    agg = merged.group_by('token').aggregate([('partial', 'sum')])
    freq = pa.table({'token': agg['token'], 'count': agg['partial_sum']})
    tie = 'token' if cfg.sim_type == 'EDIT_DISTANCE' else 'hash'
    lut = make_rank_lookup(freq, tie=tie)
    heavy = heavy_token_table(freq, lut, cfg.salt_df_threshold)
    tot = int(pc.sum(freq['count']).as_py() or 0)
    return lut, heavy, tot


def _local_tsig(tagged: pa.Table, same_relation: bool, keep_string: bool):
    """Single-shard equivalent of slimjoin._build_tsig_shard: fold the
    tagged records into the in-process signature table + memberships."""
    sigs = tagged['sig'].to_numpy()
    if len(sigs) == 0:
        return None, None
    order = np.argsort(sigs, kind='stable')
    ss = sigs[order]
    first = np.concatenate(([True], ss[1:] != ss[:-1]))
    take = order[first]
    uniq = ss[first]
    sub = tagged.take(pa.array(take))
    ranks = sub['ranks'].combine_chunks()
    rank_off = ranks.offsets.to_numpy().astype(np.int64)
    rank_flat = (ranks.values.to_numpy(zero_copy_only=False)
                 if len(ranks.values) else np.empty(0, np.int32))

    side = tagged['side'].to_numpy(zero_copy_only=False)
    keys = tagged['key'].to_numpy(zero_copy_only=False)
    m_idx = np.searchsorted(uniq, sigs)
    n = len(uniq)

    def side_arrays(mask):
        idx, kk = m_idx[mask], keys[mask]
        o = np.argsort(idx, kind='stable')
        idx, kk = idx[o], kk[o]
        counts = np.bincount(idx, minlength=n)
        off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        return off, kk

    l_off, l_flat = side_arrays(side == 0)
    if same_relation:
        r_off, r_flat = l_off, l_flat
    else:
        r_off, r_flat = side_arrays(side == 1)

    sz = sub['sz'].to_numpy().astype(np.int64)
    plen = sub['plen'].to_numpy().astype(np.int64)
    bc = _TsigBroadcast(
        uniq.astype(np.int64), rank_off, rank_flat, sz, plen,
        l_off, l_flat, r_off, r_flat,
        sub['s'].to_numpy(zero_copy_only=False) if keep_string else None)
    tsig_tbl = pa.table({
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
    return bc, tsig_tbl


def _candgen_chunk(tbl: pa.Table, sim_type: str, threshold, same_relation,
                   skew_name=None):
    """Candidate pair64s for one postings slice (whole buckets only)."""
    sa, sb = _np_candidates(tbl, sim_type, threshold, same_relation)
    if len(sa) == 0:
        return np.empty(0, np.int64)
    out = np.unique((sa << np.int64(32)) | sb)
    if skew_name:
        from ..state.skewstats import report as _skew_report
        _skew_report(skew_name, 'candgen', len(out))
    return out


# ---------------------------------------------------------------------------
# absolute-threshold OVERLAP counting kernel (VERDICT r4 #3)

# enumeration / expansion slab for the counting kernel (~60 B/pair of
# transient arrays live at once)
_COUNT_SLAB = 8_000_000


def _overlap_count_route(cfg, bc) -> bool:
    """Route OVERLAP joins with a LOW relative threshold to the counting
    kernel: prefix filtering prunes a fraction ≈ (t-1)/n of each record's
    postings, so at t/n below ~0.5 candidate generation enumerates nearly
    the full token-incidence volume anyway — counting shared tokens
    directly (the reference's full-inverted-index scan,
    ``/root/reference/py_stringsimjoin/join/overlap_join_py.py`` →
    ``index/inverted_index.py`` probe loop, in batched numpy form) skips
    the per-pair verify re-intersection entirely."""
    if cfg.sim_type != 'OVERLAP' or cfg.mode != 'join':
        return False
    rel = float(os.environ.get('SSJ_OVERLAP_COUNT_REL', '0.8'))
    if rel <= 0:
        return False
    w = (np.diff(bc.l_key_off) + np.diff(bc.r_key_off)).astype(np.float64)
    tot = float(w.sum())
    if tot == 0:
        return False
    mean_sz = float((bc.sz * w).sum()) / tot
    if mean_sz <= 0 or float(cfg.threshold) / mean_sz > rel:
        return False
    # incidence cap: the counting kernel enumerates Σ_tok df_L·df_R pairs
    # with NO heavy-token mitigation — a stopword-like token (df ≈ n)
    # makes that quadratic, where the candgen path grid-salts it.  One
    # cheap pass estimates the volume and falls back past the cap.
    cap = float(os.environ.get('SSJ_OVERLAP_COUNT_MAX_INC', 2e8))
    toks, sis, _nd = _sig_token_postings(bc)
    hl = np.diff(bc.l_key_off) > 0
    hr = np.diff(bc.r_key_off) > 0
    tl = np.sort(toks[hl[sis]])
    tr = toks[hr[sis]]
    inc = float((np.searchsorted(tl, tr, 'right')
                 - np.searchsorted(tl, tr, 'left')).sum())
    return inc <= cap


def _sig_token_postings(bc) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(tok, si) incidence over each signature's DISTINCT tokens (OVERLAP
    join verifies |uniq ∩ uniq| — set semantics even for bag inputs),
    plus the per-signature distinct-token count."""
    nsig = len(bc.sigs)
    ro, rf = bc.rank_off, bc.rank_flat
    lens = np.diff(ro)
    pos_in = (np.arange(len(rf), dtype=np.int64)
              - np.repeat(ro[:-1], lens))
    first = pos_in == 0
    ne = np.empty(len(rf), bool)
    if len(rf):
        ne[0] = True
        ne[1:] = rf[1:] != rf[:-1]
    keep = first | ne
    toks = rf[keep]
    sis = np.repeat(np.arange(nsig, dtype=np.int64), lens)[keep]
    return toks, sis, np.bincount(sis, minlength=nsig)


def _overlap_count_task(bc_or_ref, lpost_or_ref, toksR, sisR,
                        idc, id_cnt, same_rel, threshold, comp_op,
                        canonical: bool) -> pd.DataFrame:
    """Count-and-expand one probe slice: emit a pair64 per (R-incidence,
    matching L-posting), one np.unique turns occurrences into exact
    overlap counts (the count IS the score — no verify pass), filter by
    comp_op, expand memberships.  Each (L, R) signature pair lives in
    exactly ONE task (the one owning R), so tasks need no cross merge —
    the same probe-side split the reference's joblib path uses."""
    bc = ray.get(bc_or_ref) if isinstance(bc_or_ref, ray.ObjectRef) \
        else bc_or_ref
    tokL, siL = (ray.get(lpost_or_ref)
                 if isinstance(lpost_or_ref, ray.ObjectRef)
                 else lpost_or_ref)
    lstart = np.searchsorted(tokL, toksR, 'left')
    cnt = np.searchsorted(tokL, toksR, 'right') - lstart
    rows = np.flatnonzero(cnt > 0)
    parts = []
    if len(rows):
        cnt_j = cnt[rows]
        csum = np.concatenate(([0], np.cumsum(cnt_j)))
        lo = 0
        while lo < len(rows):
            hi = int(np.searchsorted(csum, csum[lo] + _COUNT_SLAB, 'left'))
            hi = min(max(hi, lo + 1), len(rows))
            rj, cj = rows[lo:hi], cnt_j[lo:hi]
            seg = csum[lo:hi] - csum[lo]
            lo = hi
            ji = np.repeat(rj, cj)
            d = np.arange(len(ji), dtype=np.int64) - np.repeat(seg, cj)
            a = siL[lstart[ji] + d]           # oriented (L, R)
            b = sisR[ji]
            parts.append((a << np.int64(32)) | b)
    if parts:
        pair64, counts = np.unique(np.concatenate(parts),
                                   return_counts=True)
        counts = counts.astype(np.int64)
        ia = pair64 >> np.int64(32)
        ib = pair64 & np.int64(0xFFFFFFFF)
    else:
        ia = ib = counts = np.empty(0, np.int64)
    if same_rel:
        # same-relation enumeration emits self pairs too (each signature
        # is in both posting streams); identity is added in closed form
        # below, so drop the enumerated ones
        keep = ia != ib
        ia, ib, counts = ia[keep], ib[keep], counts[keep]
    if canonical:
        # self-join output: keep one orientation per unordered pair (the
        # mirror lives in the task owning the other signature)
        keep = ia < ib
        ia, ib, counts = ia[keep], ib[keep], counts[keep]
    if len(idc):
        # identity pairs in closed form: overlap(sig, sig) = n_distinct
        ia = np.concatenate([ia, idc])
        ib = np.concatenate([ib, idc])
        counts = np.concatenate([counts, id_cnt])
    scores = counts.astype(np.float64)
    keep = COMP_OP_MAP[comp_op](scores, threshold)
    ia, ib, scores = ia[keep], ib[keep], scores[keep]
    return _expand_sig_pairs(bc, ia, ib, scores, canonical)


def _expand_sig_pairs(bc, ia, ib, scores, canonical: bool) -> pd.DataFrame:
    """CSR membership expansion of matched signature pairs — the same
    slabbed expansion as ``BroadcastVerify.__call__``'s tail.  Oriented
    pairs expand plainly (both orientations are present in the pair
    stream); ``canonical`` applies the self-join upper-triangle rule."""
    if len(ia) == 0:
        return _empty_pairs()
    nl = (bc.l_key_off[ia + 1] - bc.l_key_off[ia]).astype(np.int64)
    nr = (bc.r_key_off[ib + 1] - bc.r_key_off[ib]).astype(np.int64)
    tot = nl * nr
    cum = np.concatenate(([0], np.cumsum(tot)))
    total = int(cum[-1])
    offA = bc.l_key_off[ia]
    offB = bc.r_key_off[ib]
    parts_l, parts_r, parts_s = [], [], []
    for s in range(0, total, _COUNT_SLAB):
        e = min(s + _COUNT_SLAB, total)
        flat = np.arange(s, e, dtype=np.int64)
        pair_idx = np.searchsorted(cum, flat, 'right') - 1
        off = flat - cum[pair_idx]
        nr_p = nr[pair_idx]
        out_l = bc.l_key_flat[offA[pair_idx] + off // nr_p]
        out_r = bc.r_key_flat[offB[pair_idx] + off % nr_p]
        out_s = scores[pair_idx]
        if canonical:
            ident = (ia == ib)[pair_idx]
            lo = np.minimum(out_l, out_r)
            hi = np.maximum(out_l, out_r)
            keep = (lo < hi) & (~ident | (out_l < out_r))
            out_l, out_r, out_s = lo[keep], hi[keep], out_s[keep]
        parts_l.append(out_l)
        parts_r.append(out_r)
        parts_s.append(out_s)
    return pd.DataFrame({
        'l_key': np.concatenate(parts_l) if parts_l else
        np.empty(0, object),
        'r_key': np.concatenate(parts_r) if parts_r else
        np.empty(0, object),
        '_sim_score': np.concatenate(parts_s) if parts_s else
        np.empty(0, np.float64)})


def _overlap_count_pairs(bc, cfg, same_relation: bool) -> pd.DataFrame:
    """Exact OVERLAP join via token-incidence counting (the reference's
    full-inverted-index scan, ``join/overlap_join_py.py`` →
    ``index/inverted_index.py``, in batched numpy form at SIGNATURE
    granularity): work = Σ_tok df_L·df_R pair emissions + one grouped
    count.  The probe side splits into cost-balanced signature slices
    fanned out as plain Ray tasks — a pair lives in exactly one slice,
    so results concatenate with no merge."""
    toks, sis, n_dist = _sig_token_postings(bc)
    hl = np.diff(bc.l_key_off) > 0
    hr = np.diff(bc.r_key_off) > 0
    canonical = bool(same_relation and cfg.self_join)

    if same_relation:
        tokL, siL = toks, sis            # all signatures are both sides
        rmask = np.ones(len(toks), bool)
    else:
        lm = hl[sis]
        tokL, siL = toks[lm], sis[lm]
        rmask = hr[sis]
    oL = np.argsort(tokL, kind='stable')
    tokL, siL = tokL[oL], siL[oL]
    toksR, sisR = toks[rmask], sis[rmask]
    if same_relation:
        idc_all = np.arange(len(bc.sigs), dtype=np.int64)
        idcnt_all = n_dist
    else:
        idc_all = idcnt_all = np.empty(0, np.int64)
        # two-table identity (same signature on both sides) arises from
        # the enumeration itself — no closed form needed

    # per-R-incidence cost = df_L of its token; per-signature probe cost
    lstart = np.searchsorted(tokL, toksR, 'left')
    inc_cost = np.searchsorted(tokL, toksR, 'right') - lstart
    nsig = len(bc.sigs)
    sig_cost = np.bincount(sisR, weights=inc_cost.astype(np.float64),
                           minlength=nsig)
    total_cost = float(sig_cost.sum())

    cpus = int(ray.cluster_resources().get('CPU', 8)) \
        if ray.is_initialized() else 1
    nchunks = int(min(max(1, cpus), max(1, total_cost // 2_000_000))) \
        if cpus > 1 else 1

    if nchunks <= 1:
        df = _overlap_count_task(bc, (tokL, siL), toksR, sisR,
                                 idc_all, idcnt_all, same_relation,
                                 cfg.threshold, cfg.comp_op, canonical)
    else:
        # contiguous signature ranges balanced by cumulative probe cost
        csum = np.cumsum(sig_cost)
        bounds = [int(np.searchsorted(csum, total_cost * k / nchunks))
                  for k in range(1, nchunks)]
        edges = [0] + bounds + [nsig]
        bc_ref = ray.put(bc)
        lp_ref = ray.put((tokL, siL))
        rem = ray.remote(num_cpus=1)(_overlap_count_task)
        refs = []
        for a, b in zip(edges[:-1], edges[1:]):
            if a >= b:
                continue
            m = (sisR >= a) & (sisR < b)
            im = (idc_all >= a) & (idc_all < b)
            if not m.any() and not im.any():
                continue
            refs.append(rem.remote(bc_ref, lp_ref, toksR[m], sisR[m],
                                   idc_all[im], idcnt_all[im],
                                   same_relation,
                                   cfg.threshold, cfg.comp_op, canonical))
        dfs = ray.get(refs)
        df = (pd.concat(dfs, ignore_index=True) if dfs
              else _empty_pairs())

    if cfg.counter_name:
        # best-effort telemetry: signature-level token-incidence volume
        # (the counting kernel has no separate verify stage to count)
        try:
            ray.get_actor(cfg.counter_name).add.remote(int(inc_cost.sum()))
        except ValueError:
            pass
    return df


def _verify_chunk(bc_or_ref, pair64: np.ndarray, sim_type, threshold,
                  comp_op, qval, same_relation, self_join,
                  counter_name, skew_name=None) -> pd.DataFrame:
    vf = BroadcastVerify(bc_or_ref, sim_type, threshold, comp_op, qval,
                         same_relation=same_relation, self_join=self_join,
                         round_score=True, counter_name=counter_name,
                         skew_name=skew_name)
    if not isinstance(bc_or_ref, ray.ObjectRef):
        vf._bc = bc_or_ref
    return vf(pa.table({'vb': pa.array(np.zeros(len(pair64), np.int32)),
                        'pair64': pa.array(pair64, pa.int64())}))


def local_match_pairs(ltable, rtable, l_key_attr, r_key_attr,
                      l_join_attr, r_join_attr, cfg,
                      same_relation: bool):
    """In-process join body → (pairs DataFrame, empties dict), or None when
    either input exceeds the size gate (caller falls through to the
    distributed pipeline).  Exact-same kernels and therefore exact-same
    output as the distributed pipeline (pinned by tests/test_local_join.py
    against SSJ_LOCAL_JOIN=0 runs)."""
    cap = _local_row_cap()
    byte_cap = _local_byte_cap()
    arr_l = _fetch_local(ltable, [l_key_attr, l_join_attr], cap, byte_cap)
    if arr_l is None:
        return None
    if same_relation:
        arr_r = arr_l
    else:
        arr_r = _fetch_local(rtable, [r_key_attr, r_join_attr],
                             cap - len(arr_l), byte_cap - arr_l.nbytes)
        if arr_r is None:
            return None
    keep_string = cfg.keep_string
    tok_l = TokenizeStage(l_key_attr, l_join_attr, cfg.tokenizer,
                          keep_string=keep_string)(arr_l)
    if same_relation:
        tok_r = tok_l
    else:
        tok_r = TokenizeStage(r_key_attr, r_join_attr, cfg.tokenizer,
                              keep_string=keep_string)(arr_r)
    empties = _local_empties(cfg, tok_l, tok_r)

    lut, heavy, _tot = _local_lut([tok_l] if same_relation else
                                  [tok_l, tok_r], cfg)
    rp = RankPrefixStage(lut, cfg.sim_type, cfg.threshold, cfg.qval,
                         keep_string=keep_string)
    sig = SigStage(hash_string=keep_string)

    def tag(t: pa.Table, side: int) -> pa.Table:
        t = sig(rp(t))
        return t.append_column(
            'side', pa.array(np.full(len(t), side, np.int8)))

    tagged = (tag(tok_l, 0) if same_relation else
              pa.concat_tables([tag(tok_l, 0), tag(tok_r, 1)]))
    bc, tsig_tbl = _local_tsig(tagged, same_relation, keep_string)
    if bc is None:
        return _empty_pairs(), empties

    if _overlap_count_route(cfg, bc):
        return _overlap_count_pairs(bc, cfg, same_relation), empties

    nb = int(min(cfg.num_buckets, max(32, len(tsig_tbl) // 4 + 16)))
    postings = SlimPostingsStage(nb, heavy or None,
                                 emit_sides=not same_relation)(tsig_tbl)

    cpus = int(ray.cluster_resources().get('CPU', 8)) \
        if ray.is_initialized() else 0
    buckets = postings['bucket'].to_numpy()
    uniq, counts = np.unique(buckets, return_counts=True)
    work = counts.astype(np.int64) ** 2  # per-bucket pair-test upper bound
    if cpus > 1 and (len(postings) > _FANOUT_POSTINGS
                     or int(work.sum()) > _FANOUT_WORK):
        # greedy LPT: heaviest buckets first into the lightest task bin, so
        # one dense bucket can't serialize the whole fan-out
        ntasks = min(cpus, len(uniq))
        bins = np.zeros(ntasks, np.int64)
        assign = np.empty(len(uniq), np.int32)
        for i in np.argsort(work)[::-1]:
            j = int(np.argmin(bins))
            bins[j] += work[i]
            assign[i] = j
        chunk_of = assign[np.searchsorted(uniq, buckets)]
        rem = ray.remote(num_cpus=1)(_candgen_chunk)
        refs = [rem.remote(postings.filter(pa.array(chunk_of == i)),
                           cfg.sim_type, cfg.threshold, same_relation,
                           getattr(cfg, 'skew_name', None))
                for i in range(ntasks)]
        parts = [p for p in ray.get(refs) if len(p)]
        pair64 = (np.unique(np.concatenate(parts))
                  if parts else np.empty(0, np.int64))
    else:
        pair64 = _candgen_chunk(postings, cfg.sim_type, cfg.threshold,
                                same_relation,
                                getattr(cfg, 'skew_name', None))
    if len(pair64) == 0:
        return _empty_pairs(), empties

    if len(pair64) > _FANOUT_PAIRS and cpus > 1:
        bc_ref = ray.put(bc)
        rem = ray.remote(num_cpus=1)(_verify_chunk)
        chunks = [c for c in np.array_split(pair64, cpus) if len(c)]
        dfs = ray.get([rem.remote(bc_ref, c, cfg.sim_type, cfg.threshold,
                                  cfg.comp_op, cfg.qval, same_relation,
                                  cfg.self_join, cfg.counter_name,
                                  getattr(cfg, 'skew_name', None))
                       for c in chunks])
        df = pd.concat(dfs, ignore_index=True) if dfs else _empty_pairs()
    else:
        df = _verify_chunk(bc, pair64, cfg.sim_type, cfg.threshold,
                           cfg.comp_op, cfg.qval, same_relation,
                           cfg.self_join, cfg.counter_name,
                           getattr(cfg, 'skew_name', None))
    return df, empties
