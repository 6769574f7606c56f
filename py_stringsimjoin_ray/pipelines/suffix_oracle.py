"""Generated SQL oracle for SuffixFilter.filter_tables survivors.

The reference's suffix filter (``filter/suffix_filter.py:321-409``) prunes a
pair when a recursive (max_depth=2) Hamming-distance lower bound on the
ordered suffixes exceeds ``l_n + r_n - 2·T``.  Because depth-3 calls return
plain length differences, the depth-2 estimate collapses to a closed form,
and the whole decision tree becomes one (large) SQL expression over DuckDB
list kernels — generated here stage by stage so the driver's DuckDB gate
can check the distributed survivors exactly.

Binary-search/partition note: for UNIQUE sorted rank arrays (set
tokenizers) the reference's windowed binary search lands on the global
lower bound of the probe token, so ``partition`` reduces to
``len(list_filter(tokens, x -> x < probe))`` plus the window admission
checks — no recursion needed in SQL.
"""

from __future__ import annotations


def _d(x) -> str:
    return f'CAST({x!r} AS DOUBLE)'


def _partition_flags(pref, tt, pp, ll, rr):
    right_c = f"least({rr}, len({tt}) - 1)"
    flag = (f"CASE WHEN {right_c} < ({ll}) THEN 0 "
            f"WHEN ({tt})[CAST(({ll}) + 1 AS INT)] > ({pp}) OR "
            f"({tt})[CAST({right_c} + 1 AS INT)] < ({pp}) THEN 0 ELSE 1 END")
    pos = f"len(list_filter({tt}, x -> x < ({pp})))"
    return {f'{pref}_flag': flag, f'{pref}_pos': pos}


def _partition_lists(pref, tt, pp):
    pos = f"{pref}_pos"
    hit = f"(({pos}) < len({tt}) AND ({tt})[CAST({pos} + 1 AS INT)] = ({pp}))"
    return {
        f'{pref}_ll': f"({tt})[1:CAST({pos} AS INT)]",
        f'{pref}_lr': (f"CASE WHEN {hit} THEN ({tt})[CAST({pos} + 2 AS INT):]"
                       f" ELSE ({tt})[CAST({pos} + 1 AS INT):] END"),
        f'{pref}_diff': f"CASE WHEN {hit} THEN 0 ELSE 1 END",
    }


def _estimate_stages(pref, left, right, hm):
    """Column stages + value expression for one Hamming-bound estimate call
    whose own recursion bottoms out in length differences (depth >= 2)."""
    ad, rmid = f"{pref}_ad", f"{pref}_rmid"
    tokc, lo, hi = f"{pref}_tok", f"{pref}_lo", f"{pref}_hi"
    a = {ad: f"abs(len({left}) - len({right}))",
         rmid: f"CAST(floor(len({right}) / 2) AS INT)"}
    b = {tokc: f"CASE WHEN len({right}) > 0 THEN ({right})[{rmid} + 1] "
               f"ELSE 0 END",
         lo: (f"greatest(0, CAST(trunc({rmid} - (({hm}) - {ad}) / 2.0 - "
              f"{ad} * (CASE WHEN len({left}) < len({right}) "
              f"THEN 1 ELSE 0 END)) AS INT))"),
         hi: (f"least(len({left}) - 1, CAST(trunc({rmid} + (({hm}) - {ad})"
              f" / 2.0 + {ad} * (CASE WHEN len({left}) >= len({right}) "
              f"THEN 1 ELSE 0 END)) AS INT))")}
    c = _partition_flags(f'{pref}_p', left, tokc, lo, hi)
    d = _partition_lists(f'{pref}_p', left, tokc)
    rl_len = f"{rmid}"
    rr_len = f"(len({right}) - {rmid} - 1)"
    hd0 = (f"(abs(len({pref}_p_ll) - {rl_len}) + "
           f"abs(len({pref}_p_lr) - {rr_len}) + {pref}_p_diff)")
    value = (f"CASE WHEN len({left}) = 0 OR len({right}) = 0 THEN {ad} "
             f"WHEN len({left}) = 1 AND len({right}) = 1 THEN "
             f"(CASE WHEN ({left})[1] = ({right})[1] THEN 0 ELSE 1 END) "
             f"WHEN {pref}_p_flag = 0 THEN ({hm}) + 1 "
             f"ELSE {hd0} END")
    return a, b, c, d, value


def _sel(cols, src):
    return ("SELECT *, "
            + ", ".join(f"{v} AS {k}" for k, v in cols.items())
            + f" FROM {src}")


def suffix_filter_oracle_sql(table='part', key='p_partkey', attr='p_name',
                             threshold=0.6) -> str:
    """Survivor pairs of ``SuffixFilter(ws, 'JACCARD', threshold)
    .filter_tables(t, t, key, key, attr, attr)`` (allow_empty=True)."""
    t = threshold
    c = t / (1 + t)
    out_l, out_r = f'l_{key}', f'r_{key}'
    t_expr = f"CAST(ceil(round({_d(c)} * (ln + rn), 4)) AS BIGINT)"
    s0 = f"""
WITH tokx AS (SELECT {key} AS id,
                     unnest(list_distinct(list_filter(
                         string_split_regex({attr}, '\\s+'),
                         x -> x <> ''))) AS w
              FROM {table}),
freq AS (SELECT w, count(*) AS cnt FROM tokx GROUP BY w),
rk AS (SELECT w, row_number() OVER (ORDER BY cnt, w) AS r FROM freq),
rankedx AS (SELECT id, array_agg(r ORDER BY r) AS ranks, count(*) AS n
            FROM tokx JOIN rk USING (w) GROUP BY id),
allrec AS (SELECT p.{key} AS id, coalesce(r.ranks, []) AS ranks,
                  coalesce(r.n, 0) AS n
           FROM {table} p LEFT JOIN rankedx r ON p.{key} = r.id),
pairs AS (SELECT a.id AS l_id, b.id AS r_id, a.ranks AS la, b.ranks AS ra,
                 a.n AS ln, b.n AS rn
          FROM allrec a, allrec b)"""
    base = f"""s_base AS (
  SELECT *,
    CAST(ln - ceil(round({_d(t)} * ln, 4)) + 1 AS BIGINT) AS lp,
    CAST(rn - ceil(round({_d(t)} * rn, 4)) + 1 AS BIGINT) AS rp,
    {t_expr} AS t_req
  FROM pairs)"""
    s1 = """s1 AS (
  SELECT l_id, r_id, ln, rn, lp, rp, t_req,
         (ln + rn - 2 * t_req) AS hmax,
         la[CAST(lp + 1 AS INT):] AS ls,
         ra[CAST(rp + 1 AS INT):] AS rs,
         (ln - lp) AS lm, (rn - rp) AS rm
  FROM s_base
  WHERE ln > 0 AND rn > 0 AND lp > 0 AND rp > 0
    AND NOT (lp >= t_req AND rp >= t_req))"""
    a1, b1, c1, d1, _ = _estimate_stages('x', 'ls', 'rs', 'hmax')
    src = 's1'
    for cols in (a1, b1, c1, d1,
                 {'rl': "rs[1:CAST(x_rmid AS INT)]",
                  'rr2': "rs[CAST(x_rmid + 2 AS INT):]"},
                 {'hd0': "(abs(len(x_p_ll) - len(rl)) + "
                         "abs(len(x_p_lr) - len(rr2)) + x_p_diff)",
                  'lrdiff': "abs(len(x_p_lr) - len(rr2))"},
                 {'hmL': "(hmax - lrdiff - x_p_diff)"}):
        src = '(' + _sel(cols, src) + ')'
    a2, b2, c2, d2, v2 = _estimate_stages('y', 'x_p_ll', 'rl', 'hmL')
    for cols in (a2, b2, c2, d2, {'e2l': v2},
                 {'hmR': "(hmax - e2l - x_p_diff)"}):
        src = '(' + _sel(cols, src) + ')'
    a3, b3, c3, d3, v3 = _estimate_stages('z', 'x_p_lr', 'rr2', 'hmR')
    for cols in (a3, b3, c3, d3, {'e2r': v3}):
        src = '(' + _sel(cols, src) + ')'
    e1 = ("CASE WHEN lm = 0 OR rm = 0 THEN abs(lm - rm) "
          "WHEN lm = 1 AND rm = 1 THEN "
          "(CASE WHEN ls[1] = rs[1] THEN 0 ELSE 1 END) "
          "WHEN x_p_flag = 0 THEN hmax + 1 "
          "WHEN hd0 > hmax THEN hd0 "
          "WHEN e2l + lrdiff + x_p_diff <= hmax THEN e2l + e2r + x_p_diff "
          "ELSE e2l + lrdiff + x_p_diff END")
    return f"""{s0},
{base},
{s1},
nontrivial AS ({_sel({'dummy': '1'}, src)}),
nt_keep AS (SELECT l_id, r_id FROM nontrivial WHERE {e1} <= hmax),
trivial AS (
  SELECT l_id, r_id FROM s_base
  WHERE (ln = 0 AND rn = 0)
     OR (ln > 0 AND rn > 0 AND lp > 0 AND rp > 0
         AND lp >= t_req AND rp >= t_req))
SELECT l_id AS {out_l}, r_id AS {out_r} FROM nt_keep
UNION ALL
SELECT l_id, r_id FROM trivial
"""
