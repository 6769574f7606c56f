"""Per-bucket candidate generation + verification.

Runs inside ``postings.groupby("bucket").map_groups(...)`` — the single
all-to-all exchange of the join.  Re-expresses the probe loops of
``/root/reference/py_stringsimjoin/filter/position_filter.py:307-366``
(position filter), ``filter/prefix_filter.py:293-309`` (prefix filter) and
``filter/overlap_filter.py:256-267`` (full inverted index) in group-parallel
form.

Cross-bucket pair dedup uses the min-common-token rule: a pair sharing
several (prefix) tokens is processed ONLY in the group of its smallest-rank
shared token, so no second shuffle is needed for distinct-pairs.  (The
reference dedups per probe with an in-memory dict; any dedup rule yields the
same pair set because verification is exact — SURVEY.md §7.1 step 4.)

Records with identical token-rank signatures are collapsed into signature
CLASSES: filtering + verification run once per class pair, and the
(vectorized) emission expands class pairs into record pairs.  This turns
workloads dominated by exact duplicates (the common case in dedup corpora)
from O(|pairs|) python work into O(|distinct signatures|²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core import bounds
from ..core.comp_ops import COMP_OP_MAP
from ..core.measures import bag_product_overlap_sorted

_SET_MEASURES = ('JACCARD', 'COSINE', 'DICE')


def _sorted_unique(a: np.ndarray) -> np.ndarray:
    """unique() for an ALREADY-SORTED array — O(n), no re-sort."""
    if len(a) < 2:
        return a
    return a[np.concatenate(([True], a[1:] != a[:-1]))]


def _d(x) -> str:
    """Float literal rendered with an explicit DOUBLE cast — a bare long
    decimal like 0.37499999999999994 parses as DECIMAL(18,17) in DuckDB and
    can overflow when multiplied by an integer column."""
    return f'CAST({x!r} AS DOUBLE)'


def _size_bound_sql(sim_type: str, t, l: str, r: str) -> str:
    """SQL predicate for size_lower_bound(r.sz) <= l.sz <= size_upper_bound
    (bounds.py formulas, incl. the reference's round(·,4))."""
    if sim_type == 'JACCARD':
        return (f'{l}.sz >= ceil(round({_d(t)} * {r}.sz, 4)) AND '
                f'{l}.sz <= floor(round({r}.sz / {_d(t)}, 4))')
    if sim_type == 'COSINE':
        tt = t * t
        return (f'{l}.sz >= ceil(round({_d(tt)} * {r}.sz, 4)) AND '
                f'{l}.sz <= floor(round({r}.sz / {_d(tt)}, 4))')
    if sim_type == 'DICE':
        lo, hi = t / (2 - t), (2 - t) / t
        return (f'{l}.sz >= ceil(round({_d(lo)} * {r}.sz, 4)) AND '
                f'{l}.sz <= floor(round({_d(hi)} * {r}.sz, 4))')
    if sim_type == 'OVERLAP':
        return f'{l}.sz >= {t!r}'
    raise ValueError(sim_type)


def _overlap_threshold_sql(sim_type: str, t, n1: str, n2: str) -> str:
    """SQL expression for bounds.overlap_threshold(n1, n2)."""
    if sim_type == 'JACCARD':
        c = t / (1 + t)
        return f'ceil(round({_d(c)} * ({n1} + {n2}), 4))'
    if sim_type == 'COSINE':
        return f'ceil(round({_d(t)} * sqrt({n1} * {n2}), 4))'
    if sim_type == 'DICE':
        c = t / 2
        return f'ceil(round({_d(c)} * ({n1} + {n2}), 4))'
    if sim_type == 'OVERLAP':
        return f'{t!r}'
    raise ValueError(sim_type)


def _duck():
    """One cached in-process DuckDB connection per worker (None if duckdb is
    unavailable)."""
    global _DUCK
    try:
        return _DUCK
    except NameError:
        pass
    try:
        import duckdb
        _DUCK = duckdb.connect()
        # each map_groups task is one CPU slot; don't oversubscribe, and cap
        # the buffer manager so N concurrent per-worker connections don't
        # each assume they own the node's RAM
        _DUCK.execute('SET threads TO 1')
        _DUCK.execute("SET memory_limit='2GB'")
        _DUCK.execute('SET preserve_insertion_order=false')
    except ImportError:  # pragma: no cover
        _DUCK = None
    return _DUCK


def _lev_many(l_strings, r_strings):
    """Vectorized Levenshtein over pair lists via DuckDB's C++ kernel, with a
    numpy-DP fallback.

    DuckDB's ``levenshtein`` is BYTE-based ('café' vs 'cafe' = 2), while the
    reference (and ``core.measures.levenshtein``) is CHARACTER-based (= 1) —
    pairs where either string contains non-ASCII go through the exact
    character DP instead."""
    con = _duck()
    if con is None:  # pragma: no cover
        from ..core.measures import levenshtein
        return np.array([levenshtein(a, b)
                         for a, b in zip(l_strings, r_strings)],
                        dtype=np.int64)
    import pyarrow as pa
    a_arr = pa.array(l_strings, type=pa.string())
    b_arr = pa.array(r_strings, type=pa.string())
    n = len(a_arr)
    # byte length == char length ⟺ pure ASCII (for valid UTF-8)
    ascii_pair = (
        pa.compute.equal(pa.compute.binary_length(a_arr),
                         pa.compute.utf8_length(a_arr)).to_numpy(
                             zero_copy_only=False)
        & pa.compute.equal(pa.compute.binary_length(b_arr),
                           pa.compute.utf8_length(b_arr)).to_numpy(
                               zero_copy_only=False))
    tbl = pa.table({'a': a_arr, 'b': b_arr})
    res = con.execute('SELECT levenshtein(a, b) FROM tbl').fetchnumpy()
    out = next(iter(res.values())).astype(np.int64)
    if not ascii_pair.all():
        from ..core.measures import levenshtein
        for i in np.nonzero(~ascii_pair)[0]:
            out[i] = levenshtein(l_strings[i], r_strings[i])
    return out


class _Class:
    __slots__ = ('ranks', 'uniq', 'sz', 'plen', 'prefix_uniq', 'prefix_list',
                 'prefix_set', 's', 'l_keys', 'r_keys', 'kh')

    def __init__(self, ranks, sz, plen, s, kh=-1):
        self.ranks = ranks
        self.uniq = None      # unique'd ranks (bag measures); == ranks for sets
        self.sz = int(sz)
        self.plen = int(plen)
        self.prefix_uniq = _sorted_unique(ranks[:plen]) if plen > 0 else ranks[:0]
        # python-native views for the row-wise min-common-token scan — built
        # lazily (prepare_scan); the vectorized path never needs them
        self.prefix_list = None
        self.prefix_set = None
        self.s = s
        # grid-salting role: -1 = pair freely; >= 0 = pair only with classes
        # of a DIFFERENT kh (off-diagonal salted cell, see PostingsStage)
        self.kh = int(kh)
        self.l_keys = []
        self.r_keys = []

    def prepare_scan(self):
        self.prefix_list = self.prefix_uniq.tolist()
        self.prefix_set = frozenset(self.prefix_list)


class PairGenVerify:
    """Group function for one shuffle bucket.

    mode:
      'join'                — filter + exact verify, emit (l, r, score)
      'prefix_candidates'   — pairs sharing ≥1 prefix token
      'position_candidates' — reference PositionFilter.filter_tables survivors
      'overlap_candidates'  — full-token postings, overlap count vs comp_op
                              (bag-product counting, OverlapFilter semantics)
    """

    def __init__(self, sim_type: str, threshold, comp_op: str = '>=',
                 qval=None, mode: str = 'join', out_sim_score: bool = True,
                 self_join: bool = False, round_score: bool = True,
                 counter_name: str | None = None,
                 same_relation: bool = False):
        self.__name__ = 'PairGenVerify'  # map_groups wraps plain functions
        self.counter_name = counter_name
        # same_relation: postings carry ONE copy of each record (side 0);
        # every class doubles as both sides (halves the shuffle for
        # self-relation joins)
        self.same_relation = same_relation
        self.sim_type = sim_type
        self.threshold = threshold
        self.comp_op = comp_op
        self.comp_fn = COMP_OP_MAP[comp_op]
        self.qval = qval
        self.mode = mode
        self.out_sim_score = out_sim_score
        self.self_join = self_join
        self.round_score = round_score
        self._apply_size_bounds = (
            mode == 'join' and sim_type in ('JACCARD', 'COSINE', 'DICE',
                                            'OVERLAP'))
        self._apply_position = self._apply_size_bounds

    # -------------------------------------------------------------- helpers

    def _build_classes(self, df):
        """Collapse postings into signature classes + per-token run lists.
        Signature identity = (rank-array bytes, sz, string payload);
        factorized in C via pandas instead of a per-row dict walk.  Accepts a
        pyarrow Table (zero-copy rank slices, the map_groups path) or a
        pandas DataFrame (direct calls)."""
        import pyarrow as pa
        if isinstance(df, pa.Table):
            keys = df['key'].to_numpy(zero_copy_only=False)
            sides = df['side'].to_numpy(zero_copy_only=False)
            toks = df['tok'].to_numpy(zero_copy_only=False)
            szs = df['sz'].to_numpy(zero_copy_only=False)
            plens = df['plen'].to_numpy(zero_copy_only=False)
            ranks_arr = df['ranks'].combine_chunks()
            off = ranks_arr.offsets.to_numpy()
            flat = ranks_arr.values.to_numpy(zero_copy_only=False)
            itemsize = flat.dtype.itemsize
            flat_bytes = flat.tobytes()
            n = len(df)
            ranks_col = np.empty(n, dtype=object)
            rb = [flat_bytes[off[i] * itemsize: off[i + 1] * itemsize]
                  for i in range(n)]
            for i in range(n):
                ranks_col[i] = flat[off[i]:off[i + 1]]
            s_col = (df['s'].to_numpy(zero_copy_only=False)
                     if 's' in df.column_names else None)
            khs = (df['kh'].to_numpy(zero_copy_only=False)
                   if 'kh' in df.column_names
                   else np.full(n, -1, dtype=np.int16))
        else:
            keys = df['key'].to_numpy()
            sides = df['side'].to_numpy()
            toks = df['tok'].to_numpy()
            szs = df['sz'].to_numpy()
            plens = df['plen'].to_numpy()
            ranks_col = df['ranks'].to_numpy()
            s_col = df['s'].to_numpy() if 's' in df.columns else None
            khs = (df['kh'].to_numpy() if 'kh' in df.columns
                   else np.full(len(df), -1, dtype=np.int16))
            rb = [np.asarray(r).tobytes() for r in ranks_col]
        # kh is part of the class signature: classes must be kh-homogeneous
        # so the off-diagonal pairing rule (kh_a != kh_b) can act at class
        # level.  A record visiting a collided bucket under several grids
        # (different kh per heavy token) fragments into several classes —
        # membership below is therefore per (side, key, CLASS), and the
        # min-common-token ownership rule dedups the record pairs that
        # fragmented class pairs would otherwise emit twice.
        if s_col is not None:
            sig = pd.Series(list(zip(rb, szs.tolist(), khs.tolist(), s_col)))
        else:
            sig = pd.Series(list(zip(rb, szs.tolist(), khs.tolist())))
        row_class, _ = pd.factorize(sig, sort=False)
        # factorize codes are first-appearance-ordered, so np.unique's sorted
        # codes map back to first occurrence rows positionally
        _, first_idx = np.unique(row_class, return_index=True)
        classes = [
            _Class(np.asarray(ranks_col[i], dtype=np.int64), szs[i], plens[i],
                   s_col[i] if s_col is not None else None, khs[i])
            for i in first_idx
        ]
        mem = pd.DataFrame({'side': sides, 'key': keys, 'cls': row_class}) \
            .drop_duplicates(['side', 'key', 'cls'])
        for s_, k_, c_ in zip(mem['side'].to_numpy(), mem['key'].to_numpy(),
                              mem['cls'].to_numpy()):
            (classes[c_].l_keys if s_ == 0 else classes[c_].r_keys).append(k_)
        if self.same_relation:
            for c in classes:
                c.r_keys = c.l_keys

        # token runs: distinct (tok, class, side, kh).  kh is a RUN property,
        # not a class property: in a bucket hosting several salted grids a
        # record carries a different grid role per heavy token (and -1 for
        # unsalted/diagonal visits), so folding kh into the class signature
        # would fragment key membership.
        run_df = pd.DataFrame({'tok': toks, 'cls': row_class, 'side': sides,
                               'kh': khs.astype(np.int64)})
        run_df = run_df.drop_duplicates()
        return classes, run_df

    @staticmethod
    def _common(L: _Class, R: _Class) -> np.ndarray:
        """Shared prefix tokens in ascending rank order (only computed for
        pairs that already passed the min-common dedup + size bounds)."""
        return np.fromiter((x for x in L.prefix_list if x in R.prefix_set),
                           dtype=np.int64)

    def _size_ok(self, l_sz: int, r_sz: int) -> bool:
        st, t = self.sim_type, self.threshold
        return (bounds.size_lower_bound(r_sz, st, t) <= l_sz
                <= bounds.size_upper_bound(r_sz, st, t))

    def _position_ok(self, L: _Class, R: _Class, shared: np.ndarray) -> bool:
        """Reference find_candidates accumulation: for the i-th shared prefix
        token (rank order), require
        i + min(r_sz - r_pos_i, l_sz - l_pos_i) >= overlap_threshold
        (``filter/position_filter.py:340-362``)."""
        T = bounds.overlap_threshold(L.sz, R.sz, self.sim_type, self.threshold,
                                     self.qval)
        l_pos = np.searchsorted(L.ranks, shared)
        r_pos = np.searchsorted(R.ranks, shared)
        bound = np.minimum(R.sz - r_pos, L.sz - l_pos)
        return bool(np.all(np.arange(len(shared)) + bound >= T))

    def _verify_score(self, L: _Class, R: _Class):
        st = self.sim_type
        if st == 'EDIT_DISTANCE':
            raise RuntimeError('ED handled separately')
        if st in _SET_MEASURES or st == 'OVERLAP_COEFFICIENT' or (
                st == 'OVERLAP' and self.mode == 'join'):
            o = np.intersect1d(L.uniq, R.uniq, assume_unique=True).size
            n1 = len(L.uniq)
            n2 = len(R.uniq)
            if st == 'JACCARD':
                score = 1.0 if (n1 == 0 and n2 == 0) else (
                    0.0 if (n1 == 0 or n2 == 0) else o / (n1 + n2 - o))
            elif st == 'COSINE':
                score = 1.0 if (n1 == 0 and n2 == 0) else (
                    0.0 if (n1 == 0 or n2 == 0) else o / float(np.sqrt(n1 * n2)))
            elif st == 'DICE':
                score = 1.0 if (n1 == 0 and n2 == 0) else (
                    0.0 if (n1 == 0 or n2 == 0) else 2.0 * o / (n1 + n2))
            elif st == 'OVERLAP_COEFFICIENT':
                # reference divides by min of the RAW token counts
                # (``join/overlap_coefficient_join_py.py:299-303``)
                o = bag_product_overlap_sorted(L.ranks, R.ranks)
                score = float(o) / float(min(L.sz, R.sz))
            else:  # OVERLAP join: set semantics forced by the join wrapper
                score = float(o)
            if self.round_score and st in _SET_MEASURES:
                score = round(score, 4)
            return score
        if st == 'OVERLAP':  # overlap_candidates mode: bag-product counting
            return float(bag_product_overlap_sorted(L.ranks, R.ranks))
        raise ValueError(st)

    # ---------------------------------------------------------------- main

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # The position-candidates mode reproduces the reference
        # PositionFilter.filter_tables survivor set, whose per-pair
        # accumulation stays on the row-wise path; everything else goes
        # through the vectorized kernel (DuckDB hash joins + numpy).
        if self.mode != 'position_candidates' and _duck() is not None:
            return self._call_vectorized(df)
        return self._call_rowwise(df)

    def _call_vectorized(self, df: pd.DataFrame) -> pd.DataFrame:
        """Same semantics as ``_call_rowwise`` for modes 'join',
        'prefix_candidates' and 'overlap_candidates', but set up as three
        relational steps executed by DuckDB's C++ hash joins per bucket:

        1. candidates: distinct (L-class, R-class) pairs sharing a group
           token, with the MIN shared group token ``gmin``;
        2. dedup: the global min shared (prefix) token ``mintok`` of the
           pair must equal ``gmin`` — i.e. this bucket owns the pair
           (min-common-token responsibility rule, see module docstring);
        3. verify: exact overlap by joining the exploded rank arrays
           (count(*) = set intersection for unique ranks, bag-product for
           bags), then vectorized numpy scoring / threshold / emission.

        Size/position bounds are skipped here: they only prune verify work,
        and verification is exact + vectorized, so the surviving pair set is
        identical (SURVEY.md §2.5 PositionFilter note).
        """
        import pyarrow as pa

        ed = self.sim_type == 'EDIT_DISTANCE'
        classes, run_df = self._build_classes(df)
        full_postings = self.mode == 'overlap_candidates' or \
            self.sim_type == 'OVERLAP_COEFFICIENT'
        ncls = len(classes)
        for c in classes:
            c.uniq = _sorted_unique(c.ranks)

        empty = self._empty_frame()
        if ncls == 0:
            return empty

        con = _duck()
        sz_arr = np.array([c.sz for c in classes], dtype=np.int64)
        run_cls = run_df['cls'].to_numpy()
        run_tok = run_df['tok'].to_numpy().astype(np.int64)
        # position of each run token within its class's sorted rank array —
        # feeds the first-shared-token positional bound
        # (position_filter.py:340-344, the i=0 accumulation step)
        run_pos = np.empty(len(run_cls), dtype=np.int64)
        order = np.argsort(run_cls, kind='stable')
        start = 0
        while start < len(order):
            ci = run_cls[order[start]]
            end = start
            while end < len(order) and run_cls[order[end]] == ci:
                end += 1
            idx = order[start:end]
            run_pos[idx] = np.searchsorted(classes[ci].ranks, run_tok[idx])
            start = end
        runs = pa.table({
            'tok': run_tok,
            'cls': run_cls.astype(np.int64),
            'side': run_df['side'].to_numpy().astype(np.int8),
            'kh': run_df['kh'].to_numpy().astype(np.int64),
            'sz': sz_arr[run_cls],
            'pos': run_pos,
        })
        pref_src = [(c.uniq if full_postings else c.prefix_uniq)
                    for c in classes]
        pref = pa.table({
            'cls': np.repeat(np.arange(ncls, dtype=np.int64),
                             [len(p) for p in pref_src]),
            'tok': (np.concatenate(pref_src) if pref_src
                    else np.empty(0, np.int64)).astype(np.int64),
        })
        con.register('t_runs', runs)
        con.register('t_pref', pref)

        # Each statement has at most ONE join: with no reorder freedom the
        # planner cannot pick a blow-up order (it otherwise mis-estimates the
        # tiny registered tables and may join the two exploded token tables
        # with each other BEFORE the pair semi-filter — observed 100×
        # regressions on clustered corpora).
        #
        # 1. candidates per group token, with size bounds in the join and the
        #    first-shared-token positional bound as a HAVING gate — both
        #    computed from posting-local columns, no prefix explode;
        # 2. ownership: a pair belongs to this bucket iff no shared prefix
        #    token ranks below gmin (anti-join over the tokens < gmin only);
        # 3. exact overlap on the owned survivors.
        size_pred = (' AND ' + _size_bound_sql(self.sim_type, self.threshold,
                                               'r1', 'r2')
                     if self._apply_size_bounds else '')
        gate = ''
        if self._apply_position:
            ovt = _overlap_threshold_sql(self.sim_type, self.threshold,
                                         'any_value(r1.sz)',
                                         'any_value(r2.sz)')
            gate = (' HAVING least(any_value(r1.sz) - min_by(r1.pos, r1.tok),'
                    f' any_value(r2.sz) - min_by(r2.pos, r1.tok)) >= {ovt}')
        # off-diagonal salted cells only pair ACROSS their two hash groups
        # (diagonal/unsalted postings carry kh = -1 and pair freely) — the
        # grid guarantees any record pair meets with compatible roles in
        # exactly one cell, so no duplicates and no losses
        salt_pred = ' AND (r1.kh = -1 OR r2.kh = -1 OR r1.kh <> r2.kh)'
        side_pred = ('1 = 1' if self.same_relation
                     else 'r1.side = 0 AND r2.side = 1') + salt_pred
        con.execute(f"""
            CREATE OR REPLACE TEMP TABLE t_cand AS
            SELECT r1.cls AS la, r2.cls AS rb, min(r1.tok) AS gmin
            FROM t_runs r1 JOIN t_runs r2 ON r1.tok = r2.tok
            WHERE {side_pred}{size_pred}
            GROUP BY 1, 2{gate}""")
        con.execute("""
            CREATE OR REPLACE TEMP TABLE t_lt AS
            SELECT c.la, c.rb, p1.tok
            FROM t_cand c JOIN t_pref p1 ON p1.cls = c.la
                                        AND p1.tok < c.gmin""")
        con.execute("""
            CREATE OR REPLACE TEMP TABLE t_bad AS
            SELECT DISTINCT e.la, e.rb
            FROM t_lt e JOIN t_pref p2 ON p2.cls = e.rb AND p2.tok = e.tok""")
        con.execute("""
            CREATE OR REPLACE TEMP TABLE t_resp AS
            SELECT c.la, c.rb
            FROM t_cand c ANTI JOIN t_bad b ON c.la = b.la AND c.rb = b.rb""")

        if ed or self.mode == 'prefix_candidates':
            res = con.execute('SELECT la, rb FROM t_resp').arrow()
            la = res['la'].to_numpy().astype(np.int64)
            rb = res['rb'].to_numpy().astype(np.int64)
            o = None
        else:
            toks = pa.table({
                'cls': np.repeat(np.arange(ncls, dtype=np.int64),
                                 [len(c.ranks) for c in classes]),
                'tok': (np.concatenate([c.ranks for c in classes])
                        if classes else np.empty(0, np.int64)).astype(np.int64),
            })
            con.register('t_toks', toks)
            con.execute("""
                CREATE OR REPLACE TEMP TABLE t_oexp AS
                SELECT r.la, r.rb, t1.tok
                FROM t_resp r JOIN t_toks t1 ON t1.cls = r.la""")
            res = con.execute("""
                SELECT e.la, e.rb, count(*) AS o
                FROM t_oexp e JOIN t_toks t2 ON t2.cls = e.rb
                                            AND t2.tok = e.tok
                GROUP BY 1, 2""").arrow()
            con.unregister('t_toks')
            la = res['la'].to_numpy().astype(np.int64)
            rb = res['rb'].to_numpy().astype(np.int64)
            o = res['o'].to_numpy().astype(np.int64)
        con.unregister('t_runs')
        con.unregister('t_pref')

        # drop class pairs with no member on the needed side
        l_cnt = np.array([len(c.l_keys) for c in classes], dtype=np.int64)
        r_cnt = np.array([len(c.r_keys) for c in classes], dtype=np.int64)
        keep = (l_cnt[la] > 0) & (r_cnt[rb] > 0)
        if not keep.all():
            la, rb = la[keep], rb[keep]
            o = o[keep] if o is not None else None
        if len(la) == 0:
            return empty

        checked = int(np.sum(l_cnt[la] * r_cnt[rb]))

        scores = None
        # mode gate FIRST (matching _call_rowwise): prefix_candidates emits
        # every responsible pair unverified even for EDIT_DISTANCE
        if ed and self.mode != 'prefix_candidates':
            s_len = np.array([len(c.s) for c in classes], dtype=np.int64)
            keep = np.abs(s_len[la] - s_len[rb]) <= self.threshold
            la, rb = la[keep], rb[keep]
            if len(la):
                dists = _lev_many([classes[a].s for a in la],
                                  [classes[b].s for b in rb]).astype(np.float64)
                keep = self.comp_fn(dists, self.threshold)
                la, rb, scores = la[keep], rb[keep], dists[keep]
        elif self.mode == 'join' or self.mode == 'overlap_candidates':
            st = self.sim_type
            of = o.astype(np.float64)
            if st == 'OVERLAP':
                scores = of
            elif st == 'OVERLAP_COEFFICIENT':
                # reference divides by min of the RAW token counts
                # (``join/overlap_coefficient_join_py.py:299-303``), unrounded
                sz = np.array([c.sz for c in classes], dtype=np.float64)
                scores = of / np.minimum(sz[la], sz[rb])
            else:
                n = np.array([len(c.uniq) for c in classes], dtype=np.float64)
                n1, n2 = n[la], n[rb]
                if st == 'JACCARD':
                    scores = of / (n1 + n2 - of)
                elif st == 'COSINE':
                    scores = of / np.sqrt(n1 * n2)
                else:  # DICE
                    scores = 2.0 * of / (n1 + n2)
                if self.round_score:
                    scores = np.round(scores, 4)
            keep = self.comp_fn(scores, self.threshold)
            la, rb, scores = la[keep], rb[keep], scores[keep]
        # prefix_candidates: all responsible pairs pass, no score column

        if self.counter_name and checked:
            try:
                import ray as _ray
                _ray.get_actor(self.counter_name).add.remote(checked)
            except ValueError:
                pass

        if len(la) == 0:
            return empty
        return self._emit_many(classes, la, rb, scores, l_cnt, r_cnt)

    def _empty_frame(self) -> pd.DataFrame:
        cols = {'l_key': np.array([], dtype=object),
                'r_key': np.array([], dtype=object)}
        if self.out_sim_score and self.mode not in ('prefix_candidates',
                                                    'position_candidates'):
            cols['_sim_score'] = np.array([], dtype=np.float64)
        return pd.DataFrame(cols)

    def _emit_many(self, classes, la, rb, scores, l_cnt, r_cnt) -> pd.DataFrame:
        """Expand surviving class pairs into record pairs, fully vectorized:
        each pair (a,b) contributes the cross product of a's l_keys with b's
        r_keys."""
        l_flat = np.array([k for c in classes for k in c.l_keys], dtype=object)
        r_flat = np.array([k for c in classes for k in c.r_keys], dtype=object)
        l_off = np.concatenate(([0], np.cumsum(l_cnt)))[:-1]
        r_off = np.concatenate(([0], np.cumsum(r_cnt)))[:-1]
        nl, nr = l_cnt[la], r_cnt[rb]
        tot = nl * nr
        total = int(tot.sum())
        pair_idx = np.repeat(np.arange(len(la)), tot)
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(tot)))[:-1], tot)
        nr_p = nr[pair_idx]
        out_l = l_flat[l_off[la][pair_idx] + off // nr_p]
        out_r = r_flat[r_off[rb][pair_idx] + off % nr_p]
        out_s = scores[pair_idx] if scores is not None else None
        if self.self_join:
            keep = out_l < out_r
            out_l, out_r = out_l[keep], out_r[keep]
            if out_s is not None:
                out_s = out_s[keep]
        cols = {'l_key': out_l, 'r_key': out_r}
        if self.out_sim_score and self.mode not in ('prefix_candidates',
                                                    'position_candidates'):
            cols['_sim_score'] = (out_s if out_s is not None
                                  else np.full(len(out_l), np.nan))
        return pd.DataFrame(cols)

    def _call_rowwise(self, df: pd.DataFrame) -> pd.DataFrame:
        ed = self.sim_type == 'EDIT_DISTANCE'
        checked_record_pairs = 0
        classes, run_df = self._build_classes(df)
        full_postings = self.mode == 'overlap_candidates' or \
            self.sim_type == 'OVERLAP_COEFFICIENT'
        for c in classes:
            c.uniq = _sorted_unique(c.ranks)
            if full_postings:
                # full-token postings: the dedup scan runs over ALL tokens
                c.prefix_list = c.uniq.tolist()
                c.prefix_set = frozenset(c.prefix_list)
            else:
                c.prepare_scan()

        # class pair -> score bookkeeping
        out_l, out_r, out_s = [], [], []
        ed_pending = []  # (L, R) class pairs awaiting batched levenshtein

        grouped = run_df.groupby('tok', sort=False)
        for tok, sub in grouped:
            lmask = sub['side'].to_numpy() == 0
            lcls = sub['cls'].to_numpy()[lmask]
            lkh = sub['kh'].to_numpy()[lmask]
            if self.same_relation:
                # single-side postings: every class acts as both join sides
                rcls, rkh = lcls, lkh
            else:
                rcls = sub['cls'].to_numpy()[~lmask]
                rkh = sub['kh'].to_numpy()[~lmask]
            if len(lcls) == 0 or len(rcls) == 0:
                continue
            for a, kha in zip(lcls, lkh):
                L = classes[a]
                if not L.l_keys:
                    continue
                for b, khb in zip(rcls, rkh):
                    R = classes[b]
                    if not R.r_keys:
                        continue
                    if kha >= 0 and khb >= 0 and kha == khb:
                        continue  # off-diagonal salted cell, same hash group
                    # min-common-token dedup: walk the (ascending) smaller
                    # prefix; the first element present in the other side's
                    # set is the minimum shared token — early-exits long
                    # before an intersect would finish
                    if len(L.prefix_list) <= len(R.prefix_list):
                        walk, member = L.prefix_list, R.prefix_set
                    else:
                        walk, member = R.prefix_list, L.prefix_set
                    first = -1
                    for x in walk:
                        if x in member:
                            first = x
                            break
                    if first != tok:
                        continue
                    checked_record_pairs += len(L.l_keys) * len(R.r_keys)
                    if self.mode == 'prefix_candidates':
                        self._emit(L, R, None, out_l, out_r, out_s)
                        continue
                    if self.mode == 'position_candidates':
                        if not self._size_ok(L.sz, R.sz):
                            continue
                        if not self._position_ok(L, R, self._common(L, R)):
                            continue
                        self._emit(L, R, None, out_l, out_r, out_s)
                        continue
                    if ed:
                        if abs(len(L.s) - len(R.s)) > self.threshold:
                            continue
                        ed_pending.append((L, R))
                        continue
                    if self._apply_size_bounds and not self._size_ok(L.sz, R.sz):
                        continue
                    if self._apply_position and not self._position_ok(
                            L, R, self._common(L, R)):
                        continue
                    score = self._verify_score(L, R)
                    if self.comp_fn(score, self.threshold):
                        self._emit(L, R, score, out_l, out_r, out_s)

        if ed_pending:
            dists = _lev_many([p[0].s for p in ed_pending],
                              [p[1].s for p in ed_pending])
            for (L, R), d in zip(ed_pending, dists):
                if self.comp_fn(d, self.threshold):
                    self._emit(L, R, float(d), out_l, out_r, out_s)

        if self.counter_name and checked_record_pairs:
            try:
                import ray as _ray
                _ray.get_actor(self.counter_name).add.remote(checked_record_pairs)
            except ValueError:
                pass  # counter actor gone; counting is best-effort telemetry

        cols = {
            'l_key': np.concatenate(out_l) if out_l else np.array([], dtype=object),
            'r_key': np.concatenate(out_r) if out_r else np.array([], dtype=object),
        }
        if self.out_sim_score and self.mode not in ('prefix_candidates',
                                                    'position_candidates'):
            cols['_sim_score'] = (np.concatenate(out_s) if out_s
                                  else np.array([], dtype=np.float64))
        return pd.DataFrame(cols)

    def _emit(self, L: _Class, R: _Class, score, out_l, out_r, out_s):
        lk = np.asarray(L.l_keys, dtype=object)
        rk = np.asarray(R.r_keys, dtype=object)
        ll = np.repeat(lk, len(rk))
        rr = np.tile(rk, len(lk))
        if self.self_join:
            keep = ll < rr
            ll, rr = ll[keep], rr[keep]
            if len(ll) == 0:
                return
        out_l.append(ll)
        out_r.append(rr)
        if score is not None:
            out_s.append(np.full(len(ll), score, dtype=np.float64))
