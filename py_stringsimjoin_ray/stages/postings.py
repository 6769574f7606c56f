"""Rank/prefix stage and prefix-token postings generation.

This is the Ray-Data re-expression of the reference's broadcast in-process
indexes (``index/position_index.py``, ``index/prefix_index.py``,
``index/inverted_index.py``): instead of copying an index over L into every
worker, each record emits one posting per PREFIX token (rarest ``plen``
tokens), postings are hash-bucketed on the token, and candidate generation
happens inside per-bucket groups (VernicaJoin-style; the full rank array
rides along on the posting so verification is local to the group — one
shuffle end to end).

Skew handling ("license headers, boilerplate" per the north star): tokens
whose document frequency exceeds ``salt_df_threshold`` get a g×g grid of
dedicated cells — L-side postings are salted by ``hash(key) % g`` into a
grid row and replicated across the g columns, R-side postings into a grid
column and replicated across rows, so any (L,R) pair meets in exactly one
cell and no single group sees df_L × df_R pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import bounds

KNUTH = np.uint64(2654435761)
# hard cap on heavy-token grid size (every heavy builder clamps g to this);
# per-token cell ranges stride by its AREA so ranges never overlap
MAX_GRID = 16
MAX_GRID_AREA = MAX_GRID * MAX_GRID

def _token_hashes(values: pa.Array) -> np.ndarray:
    """Deterministic vectorized 64-bit string hashes via DuckDB's C kernel
    (no per-token Python boxing)."""
    from .pairgen import _duck
    con = _duck()
    tbl = pa.table({'t': values})
    con.register('t_hash_in', tbl)
    out = con.execute('SELECT hash(t) AS h FROM t_hash_in').arrow()
    con.unregister('t_hash_in')
    return out['h'].to_numpy().astype(np.uint64)


def make_rank_lookup(freq_table: pa.Table, tie: str = 'token') -> dict:
    """Token→rank lookup built ONCE on the driver as two numpy arrays
    (sorted token hashes + the rank at each hash) — numpy payloads live
    zero-copy in the object store, so every worker on a node shares one
    mmapped copy and per-batch mapping is hash + binary search, with no
    per-worker index build or per-worker vocabulary memory.  Rank semantics:
    1 = rarest, ties by token (``utils/token_ordering.py:24-42``).

    A 64-bit hash collision inside the vocabulary (p ≈ |V|²/2⁶⁴) would merge
    two tokens' ranks; it is detected here and falls back to carrying the
    rank-ordered token array itself (exact per-worker pandas Index)."""
    n = len(freq_table)
    if n == 0:
        return {'hashes': np.empty(0, np.uint64), 'ranks': np.empty(0, np.int32)}
    # driver-side build over the whole vocabulary: unlike the per-worker
    # kernel connections (pinned to 1 thread), this one may use multiple
    # cores — the rank sort over multi-million-token vocabularies is a
    # serial-floor component of every join otherwise.  Thread count is
    # capped at the RAY CPU budget so a num_cpus=8 session doesn't borrow
    # the whole box (keeps the two-level scaling measurement honest).
    import duckdb
    con = duckdb.connect()
    try:
        import ray
        if ray.is_initialized():
            con.execute(f"SET threads TO "
                        f"{max(1, int(ray.cluster_resources().get('CPU', 8)))}")
    except Exception:  # pragma: no cover
        pass
    con.register('t_vocab', freq_table)
    # plain ORDER BY (parallel radix sort) + arange ranks — ~6x faster than
    # the row_number() window over multi-million-token vocabularies.
    # tie='hash' breaks count ties by token HASH instead of the token string
    # (radix sort over fixed-width ints, no string comparisons): any
    # consistent total order yields identical SET-MEASURE join output
    # because verification is exact (SURVEY.md §2.9 licenses this); filter
    # modes and EDIT_DISTANCE (whose approximate recall depends on the
    # reference's (count, token) order) keep tie='token'.
    if tie == 'hash':
        # both sorts are DuckDB parallel radix sorts over fixed-width ints;
        # rowid of the temp table IS the rank (insertion order = rank order)
        con.execute('CREATE TEMP TABLE t_o1 AS SELECT hash(token) AS h '
                    'FROM t_vocab ORDER BY count, hash(token)')
        res = con.execute('SELECT h, CAST(rowid + 1 AS INTEGER) AS rnk '
                          'FROM t_o1 ORDER BY h').arrow()
        con.close()
        sh = res['h'].to_numpy().astype(np.uint64)
        rnk = res['rnk'].to_numpy().astype(np.int32)
        if n > 1 and bool((sh[1:] == sh[:-1]).any()):  # pragma: no cover
            from .tokenize import build_ordering_table
            return {'tokens': build_ordering_table(freq_table)}
        return {'hashes': sh, 'ranks': rnk}
    res = con.execute(
        'SELECT hash(token) AS h FROM t_vocab ORDER BY count, token').arrow()
    con.close()
    h = res['h'].to_numpy().astype(np.uint64)
    rnk = np.arange(1, n + 1, dtype=np.int32)
    order = np.argsort(h, kind='stable')
    sh = h[order]
    if n > 1 and bool((sh[1:] == sh[:-1]).any()):  # pragma: no cover
        from .tokenize import build_ordering_table
        return {'tokens': build_ordering_table(freq_table)}
    return {'hashes': sh, 'ranks': rnk[order]}


def _fused_rank_build(salt_df_threshold, max_grid, threads, *blocks):
    """Remote body for ``fused_rank_lookup``: concat the combiner partial
    blocks (zero-copy object-store reads) and run one DuckDB hash aggregate
    + radix sort.  Returns (lut, heavy, collision_flag); the lut never
    touches the driver — callers pass the returned object REF to the rank
    stage."""
    import duckdb
    parts = []
    for t in blocks:
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if len(t) and 'token' in t.column_names:
            parts.append(t)
    if not parts:
        return ({'hashes': np.empty(0, np.uint64),
                 'ranks': np.empty(0, np.int32)}, {}, False, 0)
    merged = pa.concat_tables(parts)
    con = duckdb.connect()
    con.execute(f'SET threads TO {max(1, int(threads))}')
    con.register('t_partials', merged)
    con.execute('CREATE TEMP TABLE t_o1 AS '
                'SELECT hash(token) AS h, sum(partial) AS c '
                'FROM t_partials GROUP BY token '
                'ORDER BY c, hash(token)')
    res = con.execute('SELECT h, CAST(rowid + 1 AS INTEGER) AS rnk '
                      'FROM t_o1 ORDER BY h').arrow()
    hot = con.execute(
        'SELECT CAST(rowid + 1 AS BIGINT) AS rnk, CAST(c AS BIGINT) AS c '
        f'FROM t_o1 WHERE c >= {int(salt_df_threshold)}').arrow()
    # total token OCCURRENCES across the corpus = exact length of the
    # broadcast signature table's int32 rank_flat payload — the gate
    # between the broadcast and distributed join regimes keys on this,
    # not on the (much larger) tokenized string bytes
    tot = con.execute('SELECT CAST(sum(c) AS BIGINT) FROM t_o1').fetchone()[0]
    con.close()
    sh = res['h'].to_numpy().astype(np.uint64)
    rnk = res['rnk'].to_numpy().astype(np.int32)
    n = len(sh)
    if n > 1 and bool((sh[1:] == sh[:-1]).any()):  # pragma: no cover
        return None, None, True, 0
    heavy: dict = {}
    for hidx, (rk, c) in enumerate(zip(hot['rnk'].to_pylist(),
                                       hot['c'].to_pylist())):
        g = int(min(max_grid,
                    max(2, round((c / salt_df_threshold) ** 0.5) + 1)))
        heavy[int(rk)] = (hidx, g)
    return {'hashes': sh, 'ranks': rnk}, heavy, False, int(tot or 0)


def _vocab_shard(shard: int, nshards: int, *blocks):
    """Sharded vocabulary build, phase A: aggregate the token-hash range
    ``hash >> shift == shard`` of the combiner partials.  Returns, ordered
    by hash within the shard: (hashes, counts, li) where li is the token's
    index within its count group in (count, hash) order — plus the shard's
    count-value histogram (cv, cf), a collision flag, and the occurrence
    total.  Hash-range sharding makes the within-count cross-shard order
    equal the global hash order, so stitching preserves the exact
    (count asc, token-hash asc) rank semantics of the single-task build."""
    import os as _os
    import time as _time
    _prof = _os.environ.get('SSJ_KERNEL_PROF')
    _t0 = _time.perf_counter() if _prof else 0.0
    import duckdb
    shift = 64 - max(1, (int(nshards) - 1).bit_length())
    lo = np.uint64(int(shard) << shift)
    hi = np.uint64((int(shard) + 1) << shift) if shard + 1 < nshards else None
    parts = []
    for t in blocks:
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if len(t) == 0 or 'token' not in t.column_names:
            continue
        # blocks are hash-sorted by the combiner: the shard's range is a
        # zero-copy binary-search slice, not a scan
        hcol = t['h'].to_numpy(zero_copy_only=False)
        a = int(np.searchsorted(hcol, lo, 'left'))
        b = int(np.searchsorted(hcol, hi, 'left')) if hi is not None \
            else len(hcol)
        if b > a:
            parts.append(t.slice(a, b - a))
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
             np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.int64), False, 0)
    if not parts:
        return empty
    merged = pa.concat_tables(parts)
    _t1 = _time.perf_counter() if _prof else 0.0
    con = duckdb.connect()
    con.execute('SET threads TO 1')  # matches the task's num_cpus=1
    con.register('t_partials', merged)
    res = con.execute("""
        SELECT any_value(h) AS h, sum(partial) AS c
        FROM t_partials GROUP BY token""").arrow()
    con.close()
    _t2 = _time.perf_counter() if _prof else 0.0
    if _prof:
        import json as _json
        _os.makedirs('/tmp/ssj_prof_vs', exist_ok=True)
        with open(f'/tmp/ssj_prof_vs/{_os.getpid()}.jsonl', 'a') as f:
            f.write(_json.dumps({'shard': int(shard), 'rows': len(merged),
                                 'slice': round(_t1 - _t0, 3),
                                 'group': round(_t2 - _t1, 3)}) + '\n')
    if len(res) == 0:
        return empty
    h = res['h'].to_numpy().astype(np.uint64)
    c = res['c'].to_numpy().astype(np.int64)
    order = np.lexsort((h, c))
    h_s, c_s = h[order], c[order]
    # duplicate hash across DISTINCT tokens (counts were grouped by token,
    # so equal adjacent hashes after the sort mean a real collision)
    hh = np.sort(h)
    coll = bool(len(hh) > 1 and (hh[1:] == hh[:-1]).any())
    firstc = np.concatenate(([True], c_s[1:] != c_s[:-1]))
    starts = np.where(firstc, np.arange(len(c_s)), 0)
    li = np.arange(len(c_s)) - np.maximum.accumulate(starts)
    cv, cf64 = np.unique(c_s, return_counts=True)
    oh = np.argsort(h_s, kind='stable')
    return (h_s[oh], c_s[oh], li[oh], cv, cf64.astype(np.int64),
            coll, int(c.sum()))


def _vocab_offsets(pieces):
    """Global rank offsets from the per-shard count-value histograms.
    rank(token) = 1 + base(count) + prefix(shard, count) + li, where base
    is the exclusive total below the count value and prefix the same-count
    mass in lower hash ranges (hash-contiguous shards, so within-count
    cross-shard order == global hash order)."""
    K = len(pieces)
    all_cv = np.unique(np.concatenate([p[3] for p in pieces])) \
        if pieces else np.empty(0, np.int64)
    ncv = len(all_cv)
    f = np.zeros((K, ncv), dtype=np.int64)
    for s, p in enumerate(pieces):
        if len(p[3]):
            f[s, np.searchsorted(all_cv, p[3])] = p[4]
    base = np.concatenate(([0], np.cumsum(f.sum(axis=0))[:-1]))
    prefix = np.vstack([np.zeros(ncv, np.int64),
                        np.cumsum(f, axis=0)[:-1]]) if K else f
    return all_cv, base, prefix


def _vocab_rank_piece(all_cv, base, prefix_row, salt_df_threshold, piece):
    """Round-2 shard task: assign this piece's global ranks (parallel)."""
    h_s, c_s, li = piece[0], piece[1], piece[2]
    if len(h_s) == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int32),
                np.zeros((2, 0), np.int64))
    idx = np.searchsorted(all_cv, c_s)
    rk = (base[idx] + prefix_row[idx] + li + 1).astype(np.int32)
    hot = c_s >= salt_df_threshold
    heavy_rc = (np.stack([rk[hot].astype(np.int64), c_s[hot]])
                if hot.any() else np.zeros((2, 0), np.int64))
    return h_s, rk, heavy_rc


def _heavy_from_rc(rc: np.ndarray, salt_df_threshold, max_grid) -> dict:
    heavy: dict = {}
    order = np.argsort(rc[0], kind='stable')
    for hidx, (rk, c) in enumerate(zip(rc[0][order], rc[1][order])):
        g = int(min(max_grid,
                    max(2, round((c / salt_df_threshold) ** 0.5) + 1)))
        heavy[int(rk)] = (hidx, g)
    return heavy


def _vocab_concat(salt_df_threshold, max_grid, *ranked):
    """Final stitch: pure concatenation of the hash-ordered ranked pieces
    (shards partition the hash high bits, so the concat is globally
    hash-sorted) + the heavy-token table."""
    ranked = [r for r in ranked if len(r[0])]
    if not ranked:
        return ({'hashes': np.empty(0, np.uint64),
                 'ranks': np.empty(0, np.int32)}, {})
    lut = {'hashes': np.concatenate([r[0] for r in ranked]),
           'ranks': np.concatenate([r[1] for r in ranked])}
    rc = np.concatenate([r[2] for r in ranked], axis=1)
    heavy = _heavy_from_rc(rc, salt_df_threshold, max_grid) if rc.size else {}
    return lut, heavy


def _vocab_stitch(salt_df_threshold, max_grid, *pieces):
    """In-process composition of offsets -> rank pieces -> concat; the
    reference semantics of the distributed three-round flow in
    ``fused_rank_lookup`` (and the form the unit test pins)."""
    all_cv, base, prefix = _vocab_offsets(pieces)
    ranked = [_vocab_rank_piece(all_cv, base, prefix[s], salt_df_threshold, p)
              for s, p in enumerate(pieces)]
    lut, heavy = _vocab_concat(salt_df_threshold, max_grid, *ranked)
    coll = any(bool(p[5]) for p in pieces)
    tot = sum(int(p[6]) for p in pieces)
    return lut, heavy, coll, int(tot)


# sharded vocabulary build kicks in above this partial-row total; below it
# a single merge task is faster than K-task scheduling
_VOCAB_SHARD_MIN_ROWS = 2_000_000


def fused_rank_lookup(tokenized, salt_df_threshold: int,
                      max_grid: int = 16) -> tuple:
    """One-pass ordering artifact for the hash-tie join path: per-block
    combiner partials feed a single DuckDB parallel hash aggregate +
    radix sort (count asc, token-hash tie) that yields the rank lookup AND
    the heavy-token table — replaces the
    token_frequencies → make_rank_lookup → heavy_token_table chain
    (three serial vocabulary passes) with one.  The merge runs in a Ray
    task over the partial-block REFS (the driver never streams the
    partials).  Returns (lut_ref: ObjectRef, heavy: dict,
    total_token_occurrences: int — the broadcast-gate size driver)."""
    import ray

    import os as _os
    import sys as _sys
    import time as _time
    _prof = _os.environ.get('SSJ_STAGE_PROF')
    _t0 = _time.time()

    def _mark(tag):
        nonlocal _t0
        if _prof:
            print(f'SSJPROF vocab.{tag} {_time.time() - _t0:.2f}',
                  file=_sys.stderr, flush=True)
        _t0 = _time.time()

    from .tokenize import partial_token_counts_hashed
    partial = tokenized.map_batches(partial_token_counts_hashed,
                                    batch_format='pyarrow',
                                    batch_size=None).materialize()
    _mark('partials')
    refs = []
    for bundle in partial.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return (ray.put({'hashes': np.empty(0, np.uint64),
                         'ranks': np.empty(0, np.int32)}), {}, 0)
    cpus = int(ray.cluster_resources().get('CPU', 8))
    if partial.count() >= _VOCAB_SHARD_MIN_ROWS:
        # three-round sharded build (the single merge task was 57% of the
        # flagship matches stage at 1.5M records): K parallel hash-range
        # slice+aggregate tasks; a tiny driver-side histogram exchange; K
        # parallel rank-assignment tasks; one pure-concat stitch.  The
        # driver reads only the small histogram fields of each piece
        # (numpy payloads resolve as zero-copy plasma views).
        nshards = 1 << max(2, min(5, cpus.bit_length() - 1))
        shard_task = ray.remote(num_cpus=1)(_vocab_shard)
        piece_refs = [shard_task.remote(s, nshards, *refs)
                      for s in range(nshards)]
        pieces = ray.get(piece_refs)
        _mark('shards')
        coll = any(bool(p[5]) for p in pieces)
        tot = sum(int(p[6]) for p in pieces)
        all_cv, base, prefix = _vocab_offsets(pieces)
        rank_task = ray.remote(num_cpus=1)(_vocab_rank_piece)
        ranked_refs = [rank_task.remote(all_cv, base, prefix[s],
                                        salt_df_threshold, piece_refs[s])
                       for s in range(nshards)]
        concat_task = ray.remote(num_cpus=2, num_returns=2)(_vocab_concat)
        lut_ref, heavy_ref = concat_task.remote(salt_df_threshold, max_grid,
                                                *ranked_refs)
        heavy = ray.get(heavy_ref)
        _mark('rank_concat')
    else:
        ncpu = max(2, min(8, cpus // 2))
        builder = ray.remote(num_cpus=ncpu, num_returns=4)(_fused_rank_build)
        lut_ref, heavy_ref, coll_ref, tot_ref = builder.remote(
            salt_df_threshold, max_grid, ncpu, *refs)
        heavy = ray.get(heavy_ref)
        tot = int(ray.get(tot_ref))
        coll = bool(ray.get(coll_ref))
        _mark('build_get')
    if coll:  # pragma: no cover
        # vocabulary hash collision: rebuild exactly via the slow chain
        from .tokenize import token_frequencies as _tf
        freq = _tf(tokenized)
        lut = make_rank_lookup(freq)
        return (ray.put(lut),
                heavy_token_table(freq, lut, salt_df_threshold, max_grid),
                tot)
    return lut_ref, heavy, tot


# Per-worker-process cache for the exact-fallback pandas Index (collision
# case only; the hash path needs no per-worker state).
_ORD_INDEX_CACHE: dict = {}


def _fallback_index(ref_key, tokens_arr):  # pragma: no cover
    idx = _ORD_INDEX_CACHE.get(ref_key)
    if idx is None:
        import pandas as pd
        idx = pd.Index(tokens_arr.to_pandas())
        _ORD_INDEX_CACHE.clear()
        _ORD_INDEX_CACHE[ref_key] = idx
    return idx


def map_tokens_to_ranks(lut: dict, token_values: pa.Array,
                        ref_key='') -> np.ndarray:
    """Vectorized token→rank (0 = absent) for a flat Arrow string array."""
    if 'hashes' in lut:
        sh, ranks = lut['hashes'], lut['ranks']
        if len(sh) == 0 or len(token_values) == 0:
            return np.zeros(len(token_values), dtype=np.int64)
        th = _token_hashes(token_values)
        # dedup + sort the probes first: token batches repeat heavily, and
        # sorted probes walk the (DRAM-resident, multi-million-entry) LUT
        # monotonically instead of issuing a random ~24-miss binary search
        # per occurrence
        uh, inv = np.unique(th, return_inverse=True)
        pos = np.minimum(np.searchsorted(sh, uh), len(sh) - 1)
        ranks_u = np.where(sh[pos] == uh, ranks[pos], 0).astype(np.int64)
        return ranks_u[inv]
    idx = _fallback_index(ref_key, lut['tokens'])  # pragma: no cover
    return (idx.get_indexer(token_values.to_pandas()) + 1).astype(np.int64)


def bucket_of(tok_ranks: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((tok_ranks.astype(np.uint64) * KNUTH) >> np.uint64(7)) % np.uint64(num_buckets)


def _stable_key_hash(keys) -> np.ndarray:
    """Deterministic vectorized per-key hash for grid salting (independent of
    Python hash randomization).  Integer keys get a Knuth multiplicative mix;
    everything else goes through the DuckDB string-hash kernel."""
    arr = keys if isinstance(keys, pa.Array) else pa.array(list(keys))
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        v = (v ^ (v >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)
        return v ^ (v >> np.uint64(29))
    return _token_hashes(pa.compute.cast(arr, pa.string()))


class RankPrefixStage:
    """(key, tokens[, s]) → (key, sz, ranks, plen[, s]).

    The ordering artifact (rank-ordered token array, see
    ``build_ordering_table``) is resolved from the object store ZERO-COPY;
    token→rank mapping is one vectorized ``pc.index_in`` per batch and the
    per-row ascending rank sort is a single ``np.lexsort`` over the flattened
    values — the applied-ordering representation of
    ``utils/token_ordering.py:45-55`` with no per-token Python work.
    ``sz`` is the token count under the tokenizer's set/bag semantics.
    """

    def __init__(self, ordering_ref, sim_type: str, threshold, qval=None,
                 keep_string: bool = False):
        self.ordering_ref = ordering_ref  # make_rank_lookup payload (or ref)
        self.sim_type = sim_type
        self.threshold = threshold
        self.qval = qval
        self.keep_string = keep_string

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        lut = self.ordering_ref
        ref_key = ''
        if isinstance(lut, ray.ObjectRef):
            ref_key = lut.hex()
            lut = ray.get(lut)
        toks = batch['tokens'].combine_chunks()
        nrows = len(batch)
        offsets = toks.offsets.to_numpy()
        sizes = np.diff(offsets).astype(np.int32)
        ranks_flat = map_tokens_to_ranks(lut, toks.values, ref_key)
        # 0 = absent from the ordering
        row_id = np.repeat(np.arange(nrows), sizes)
        keep = ranks_flat > 0
        if not keep.all():
            ranks_flat, row_id = ranks_flat[keep], row_id[keep]
        order = np.lexsort((ranks_flat, row_id))
        sorted_ranks = ranks_flat[order]
        sorted_rows = row_id[order]
        cnt = np.bincount(sorted_rows, minlength=nrows)
        new_off = np.concatenate(([0], np.cumsum(cnt))).astype(np.int32)
        # int32 ranks halve the postings shuffle volume; vocabularies beyond
        # 2^31 distinct tokens are out of scope (documented scale assumption —
        # qgram vocabs are charset^q-bounded, word vocabs ≪ corpus size)
        ranks_col = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()),
            pa.array(sorted_ranks.astype(np.int32), pa.int32()))
        plens = bounds.prefix_length_many(sizes, self.sim_type,
                                          self.threshold, self.qval)
        cols = {'key': batch['key'],
                'sz': pa.array(sizes, type=pa.int32()),
                'ranks': ranks_col,
                'plen': pa.array(plens.astype(np.int32), type=pa.int32())}
        if self.keep_string:
            cols['s'] = batch['s']
        return pa.table(cols)


class PostingsStage:
    """Explode each record into one posting per prefix token and assign
    shuffle buckets (with grid salting for heavy tokens).

    Output columns: bucket:int64, tok:int64, side:int8,
    key, sz:int32, ranks:list<int64>, plen:int32 [, s:string].
    (Token positions are NOT carried: the verify/position-filter kernels
    recompute them by binary search on the sorted rank arrays.)

    SCALE NOTE: this stage serves ONLY the reference-parity FILTER
    blockers (``mode='overlap_candidates' / 'prefix_candidates' /
    'position_candidates'`` — ``Filter.filter_tables``), whose contract is
    the exact reference pair set of one named filter, and whose kernels
    need both rank arrays per pair.  It carries each record's rank array
    on every posting (O(n·p) payload per record).  The JOIN core — the
    100-TB path — does NOT use it: ``mode='join'`` routes through
    ``stages/slimjoin.py`` (16–26 B rank-free postings, signature dedup,
    broadcast/sharded verify-time attach).  Pipelines that must block at
    corpus scale should use the joins, not ``filter_tables``.
    """

    def __init__(self, side: int, num_buckets: int,
                 heavy_ref=None, keep_string: bool = False,
                 same_relation: bool = False):
        import ray
        self.side = side
        self.num_buckets = num_buckets
        heavy = None
        if heavy_ref is not None:
            heavy = ray.get(heavy_ref) if isinstance(heavy_ref, ray.ObjectRef) else heavy_ref
        # heavy: dict rank -> (heavy_index, grid_size)
        self.heavy = heavy or {}
        self.keep_string = keep_string
        # same_relation: records are emitted once (side 0) and act as both
        # join sides; heavy tokens use the unordered-grid scheme — record
        # with hash h covers cells {(min(h,c), max(h,c)) : c < g}, so any
        # record pair meets in exactly one cell (i=min, j=max)
        self.same_relation = same_relation

    def __call__(self, batch: pa.Table) -> pa.Table:
        ranks_col = batch['ranks'].combine_chunks()
        plen = batch['plen'].to_numpy()
        nrows = len(batch)
        offsets = ranks_col.offsets.to_numpy()
        flat = ranks_col.values.to_numpy() if len(ranks_col.values) else np.empty(0, np.int64)

        # indices of prefix elements: for row i, offsets[i] .. offsets[i]+plen[i]-1
        reps = np.minimum(plen, (offsets[1:] - offsets[:-1])).astype(np.int64)
        row_idx = np.repeat(np.arange(nrows), reps)
        starts = np.repeat(offsets[:-1], reps)
        pos = (np.arange(len(row_idx)) -
               np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps)).astype(np.int32)
        tok = flat[starts + pos]

        bucket = bucket_of(tok, self.num_buckets).astype(np.int64)
        out_row_idx, out_tok, out_pos, out_bucket = row_idx, tok, pos, bucket
        out_kh = np.full(len(row_idx), -1, dtype=np.int16)

        if self.heavy:
            hr, hidx_arr, hg_arr = self._heavy_arrays()
            p = np.searchsorted(hr, tok)
            p = np.minimum(p, len(hr) - 1)
            hmask = hr[p] == tok
            if hmask.any():
                key_hash = _stable_key_hash(batch['key'].combine_chunks())
                sel = np.nonzero(hmask)[0]
                g = hg_arr[p[sel]].astype(np.int64)
                # disjoint per-token cell ranges: stride by the GLOBAL max
                # grid area, not this token's g² — per-token strides overlap
                # when g varies (token A's range [hidx_A·g_A², +g_A²) can
                # intersect token B's), merging cells of DIFFERENT tokens
                # into one shuffle bucket.  The join path survives that
                # (global memberships + downstream pair dedup); the
                # candidates path builds CELL-LOCAL memberships and emitted
                # duplicate pairs from the polluted cells.
                base = self.num_buckets + hidx_arr[p[sel]] * MAX_GRID_AREA
                kh = (key_hash[row_idx[sel]] % g.astype(np.uint64)).astype(np.int64)
                # expand: each salted posting replicates across its g cells
                rep = np.repeat(np.arange(len(sel)), g)
                c = (np.arange(len(rep))
                     - np.repeat(np.concatenate(([0], np.cumsum(g)[:-1])), g))
                khr, gr, baser = kh[rep], g[rep], base[rep]
                if self.same_relation:
                    # unordered grid: record with hash kh covers cells
                    # {(min(kh,c), max(kh,c))}; any pair of distinct hashes
                    # meets in exactly one off-diagonal cell, same-hash pairs
                    # only in the diagonal cell (kh,kh).  kh = -1 marks the
                    # diagonal visit ("pair freely"); off-diagonal visits
                    # carry kh so the kernel pairs only ACROSS the two hash
                    # groups (fixes the duplicate-pair bug: same-hash records
                    # previously met in every cell of their row/column).
                    cells = (baser + np.minimum(khr, c) * gr
                             + np.maximum(khr, c))
                    khcol = np.where(c == khr, -1, khr).astype(np.int16)
                elif self.side == 0:    # L: grid row kh, all columns
                    cells = baser + khr * gr + c
                    khcol = np.full(len(rep), -1, np.int16)
                else:                   # R: grid column kh, all rows
                    cells = baser + c * gr + khr
                    khcol = np.full(len(rep), -1, np.int16)
                keep = ~hmask
                out_row_idx = np.concatenate([row_idx[keep], row_idx[sel][rep]])
                out_tok = np.concatenate([tok[keep], tok[sel][rep]])
                out_pos = np.concatenate([pos[keep], pos[sel][rep]])
                out_bucket = np.concatenate([bucket[keep], cells])
                out_kh = np.concatenate([out_kh[keep], khcol])

        take_idx = pa.array(out_row_idx)
        cols = {
            'bucket': pa.array(out_bucket, type=pa.int64()),
            'tok': pa.array(out_tok.astype(np.int32), type=pa.int32()),
            'side': pa.array(np.full(len(out_row_idx), self.side, dtype=np.int8)),
            'kh': pa.array(out_kh, type=pa.int16()),
            'key': batch['key'].take(take_idx),
            'sz': batch['sz'].take(take_idx),
            'ranks': ranks_col.take(take_idx),
            'plen': batch['plen'].take(take_idx),
        }
        if self.keep_string:
            cols['s'] = batch['s'].take(take_idx)
        return pa.table(cols)

    def _heavy_arrays(self):
        """(sorted rank array, heavy_index array, grid array) view of the
        heavy dict — built once per stage instance for vectorized lookup."""
        cached = getattr(self, '_heavy_cache', None)
        if cached is None:
            ranks = np.array(sorted(self.heavy), dtype=np.int64)
            hidx = np.array([self.heavy[r][0] for r in ranks], dtype=np.int64)
            g = np.array([self.heavy[r][1] for r in ranks], dtype=np.int64)
            cached = self._heavy_cache = (ranks, hidx, g)
        return cached


def heavy_token_table(freq_table: pa.Table, lut: dict,
                      salt_df_threshold: int, max_grid: int = 16) -> dict:
    """rank → (heavy_index, grid_size) for tokens with df above threshold.
    ``lut`` is the ``make_rank_lookup`` artifact."""
    heavy: dict = {}
    mask = pa.compute.greater_equal(freq_table['count'], salt_df_threshold)
    hot = freq_table.filter(mask)
    if len(hot) == 0:
        return heavy
    ranks = map_tokens_to_ranks(lut, hot['token'].combine_chunks()
                                if isinstance(hot['token'], pa.ChunkedArray)
                                else hot['token'])
    for hidx, (rk, c) in enumerate(zip(ranks, hot['count'].to_pylist())):
        g = int(min(max_grid, max(2, round((c / salt_df_threshold) ** 0.5) + 1)))
        heavy[int(rk)] = (hidx, g)
    return heavy
