"""Differential tests against the REFERENCE implementation itself.

The property suites (test_property_joins.py) compare our joins to a
brute-force oracle written from the reference's documented semantics; this
module closes the remaining gap by running the reference's own pure-Python
join path (``/root/reference/py_stringsimjoin/join/*_join_py.py``, loaded
read-only via the dependency shims in ``benchmarks/ref_shims/``) on the
SAME random tables and asserting identical (l_id, r_id, score) triples —
any divergence between our engine and the actual reference code, including
quirks the hand-written oracle might mis-transcribe, fails here.

n_jobs=1 keeps the reference single-process (the joblib shim's pool is
exercised by benchmarks/reference_baseline.py, not needed for parity).
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference'

sys.path.insert(0, os.path.join(REPO, 'benchmarks', 'ref_shims'))
sys.path.insert(0, REFERENCE)

ref_join = pytest.importorskip('py_stringsimjoin.join.jaccard_join_py')

from py_stringmatching.tokenizer.qgram_tokenizer import \
    QgramTokenizer as RefQgram  # noqa: E402
from py_stringmatching.tokenizer.whitespace_tokenizer import \
    WhitespaceTokenizer as RefWs  # noqa: E402
from py_stringsimjoin.join.cosine_join_py import cosine_join_py  # noqa: E402
from py_stringsimjoin.join.dice_join_py import dice_join_py  # noqa: E402
from py_stringsimjoin.join.edit_distance_join_py import \
    edit_distance_join_py  # noqa: E402
from py_stringsimjoin.join.jaccard_join_py import \
    jaccard_join_py  # noqa: E402
from py_stringsimjoin.join.overlap_coefficient_join_py import \
    overlap_coefficient_join_py  # noqa: E402

from py_stringsimjoin_ray.core.tokenizers import (QgramTokenizer,  # noqa: E402
                                                  WhitespaceTokenizer)
from py_stringsimjoin_ray.pipelines import join  # noqa: E402

# non-trivial overlap structure: small vocabulary, duplicates, empties
WORDS = ['aa', 'ab', 'abc', 'bc', 'ca', 'dab', 'e']


def _text():
    return st.lists(st.sampled_from(WORDS), min_size=1, max_size=5) \
        .map(' '.join)


def _table(max_rows=10):
    return st.lists(_text(), min_size=1, max_size=max_rows).map(
        lambda ss: pd.DataFrame({'id': range(len(ss)), 's': ss}))


def _triples(df):
    return set(zip(df['l_id'].astype(np.int64), df['r_id'].astype(np.int64),
                   [round(float(s), 4) for s in df['_sim_score']]))


_CASES = {
    'JACCARD': (jaccard_join_py, join.jaccard_join),
    'COSINE': (cosine_join_py, join.cosine_join),
    'DICE': (dice_join_py, join.dice_join),
    'OVERLAP_COEFFICIENT': (overlap_coefficient_join_py,
                            join.overlap_coefficient_join),
}


@pytest.mark.parametrize('sim_type', list(_CASES))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([0.3, 0.6, 0.9]))
def test_set_sim_joins_match_reference(sim_type, l, r, t):
    ref_fn, our_fn = _CASES[sim_type]
    expect = ref_fn(l, r, 'id', 'id', 's', 's', RefWs(return_set=True), t,
                    show_progress=False)
    got = our_fn(l, r, 'id', 'id', 's', 's',
                 WhitespaceTokenizer(return_set=True), t)
    assert _triples(got) == _triples(expect)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(max_rows=8), t=st.sampled_from([0.4, 0.8]))
def test_qgram_jaccard_matches_reference(l, t):
    expect = jaccard_join_py(l, l, 'id', 'id', 's', 's',
                             RefQgram(qval=2, return_set=True), t,
                             show_progress=False)
    got = join.jaccard_join(l, l, 'id', 'id', 's', 's',
                            QgramTokenizer(qval=2, return_set=True), t)
    assert _triples(got) == _triples(expect)


_LONG = ['abcdef', 'abcdeg', 'abcdff', 'zbcdef', 'abzdef', 'qrstuv',
         'qrstuw', 'abcdefgh']


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ls=st.lists(st.sampled_from(_LONG), min_size=1, max_size=8),
       rs=st.lists(st.sampled_from(_LONG), min_size=1, max_size=8),
       d=st.sampled_from([1, 2]))
def test_edit_distance_matches_reference(ls, rs, d):
    l = pd.DataFrame({'id': range(len(ls)), 's': ls})
    r = pd.DataFrame({'id': range(len(rs)), 's': rs})
    expect = edit_distance_join_py(l, r, 'id', 'id', 's', 's', d,
                                   show_progress=False)
    got = join.edit_distance_join(l, r, 'id', 'id', 's', 's', d)
    assert _triples(got) == _triples(expect)


def test_allow_missing_matches_reference():
    l = pd.DataFrame({'id': [0, 1, 2], 's': ['aa ab', None, 'bc ca']})
    r = pd.DataFrame({'id': [0, 1], 's': [None, 'aa ab']})
    expect = jaccard_join_py(l, r, 'id', 'id', 's', 's',
                             RefWs(return_set=True), 0.5,
                             allow_missing=True, show_progress=False)
    got = join.jaccard_join(l, r, 'id', 'id', 's', 's',
                            WhitespaceTokenizer(return_set=True), 0.5,
                            allow_missing=True)
    # missing-pair rows carry NaN scores: compare key pairs + non-NaN scores
    def pairs(df):
        out = set()
        for _, row in df.iterrows():
            s = row['_sim_score']
            out.add((int(row['l_id']), int(row['r_id']),
                     None if pd.isna(s) else round(float(s), 4)))
        return out
    assert pairs(got) == pairs(expect)


from py_stringsimjoin.join.overlap_join_py import overlap_join_py  # noqa: E402


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([1, 2, 3]),
       op=st.sampled_from(['>=', '>']))
def test_overlap_join_matches_reference(l, r, t, op):
    expect = overlap_join_py(l, r, 'id', 'id', 's', 's',
                             RefWs(return_set=True), t, comp_op=op,
                             show_progress=False)
    got = join.overlap_join(l, r, 'id', 'id', 's', 's',
                            WhitespaceTokenizer(return_set=True), t,
                            comp_op=op)
    assert _triples(got) == _triples(expect)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([1, 2]))
def test_overlap_filter_candset_matches_reference(l, r, t):
    from py_stringsimjoin.filter.overlap_filter import \
        OverlapFilter as RefOverlapFilter

    from py_stringsimjoin_ray.pipelines.filters import OverlapFilter
    # candset = full cross product, so the filter decides everything
    cand = l[['id']].rename(columns={'id': 'l_id'}).merge(
        r[['id']].rename(columns={'id': 'r_id'}), how='cross')
    cand.insert(0, '_id', range(len(cand)))
    expect = RefOverlapFilter(RefWs(return_set=True), t).filter_candset(
        cand, 'l_id', 'r_id', l, r, 'id', 'id', 's', 's',
        show_progress=False)
    got = OverlapFilter(WhitespaceTokenizer(return_set=True), t) \
        .filter_candset(cand, 'l_id', 'r_id', l, r, 'id', 'id', 's', 's')
    keyset = lambda df: set(zip(df['l_id'].astype(np.int64),
                                df['r_id'].astype(np.int64)))
    assert keyset(got) == keyset(expect)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([0.3, 0.6]))
def test_apply_matcher_matches_reference(l, r, t):
    from py_stringsimjoin.matcher.apply_matcher import \
        apply_matcher as ref_apply

    from py_stringsimjoin_ray.core.measures import jaccard
    from py_stringsimjoin_ray.pipelines.matcher import apply_matcher
    cand = l[['id']].rename(columns={'id': 'l_id'}).merge(
        r[['id']].rename(columns={'id': 'r_id'}), how='cross')
    cand.insert(0, '_id', range(len(cand)))

    def ref_sim(t1, t2):
        s1, s2 = set(t1), set(t2)
        return len(s1 & s2) / len(s1 | s2) if s1 | s2 else 0.0
    expect = ref_apply(cand, 'l_id', 'r_id', l, r, 'id', 'id', 's', 's',
                       RefWs(return_set=True), ref_sim, t,
                       show_progress=False)
    got = apply_matcher(cand, 'l_id', 'r_id', l, r, 'id', 'id', 's', 's',
                        WhitespaceTokenizer(return_set=True), jaccard, t)
    assert _triples(got) == _triples(expect)


@pytest.mark.parametrize('fname', ['PrefixFilter', 'PositionFilter',
                                   'SizeFilter', 'SuffixFilter'])
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([0.4, 0.7]))
def test_blocking_filter_candset_matches_reference(fname, l, r, t):
    import importlib
    refmod = importlib.import_module(
        'py_stringsimjoin.filter.' +
        {'PrefixFilter': 'prefix_filter', 'PositionFilter': 'position_filter',
         'SizeFilter': 'size_filter',
         'SuffixFilter': 'suffix_filter'}[fname])
    from py_stringsimjoin_ray.pipelines import filters as ours_mod
    RefF = getattr(refmod, fname)
    OurF = getattr(ours_mod, fname)
    cand = l[['id']].rename(columns={'id': 'l_id'}).merge(
        r[['id']].rename(columns={'id': 'r_id'}), how='cross')
    cand.insert(0, '_id', range(len(cand)))
    expect = RefF(RefWs(return_set=True), 'JACCARD', t).filter_candset(
        cand, 'l_id', 'r_id', l, r, 'id', 'id', 's', 's',
        show_progress=False)
    got = OurF(WhitespaceTokenizer(return_set=True), 'JACCARD', t) \
        .filter_candset(cand, 'l_id', 'r_id', l, r, 'id', 'id', 's', 's')
    keyset = lambda df: set(zip(df['l_id'].astype(np.int64),
                                df['r_id'].astype(np.int64)))
    assert keyset(got) == keyset(expect)


@pytest.mark.parametrize('fname', ['PrefixFilter', 'PositionFilter',
                                   'SizeFilter'])
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([0.4, 0.7]))
def test_blocking_filter_tables_matches_reference(fname, l, r, t):
    """filter_tables (the candidate-pair GENERATOR path) vs the
    reference's own inverted-index probe, complementing the candset
    differential above."""
    import importlib
    refmod = importlib.import_module(
        'py_stringsimjoin.filter.' +
        {'PrefixFilter': 'prefix_filter', 'PositionFilter':
         'position_filter', 'SizeFilter': 'size_filter'}[fname])
    from py_stringsimjoin_ray.pipelines import filters as ours_mod
    RefF = getattr(refmod, fname)
    OurF = getattr(ours_mod, fname)
    expect = RefF(RefWs(return_set=True), 'JACCARD', t).filter_tables(
        l, r, 'id', 'id', 's', 's', show_progress=False)
    got = OurF(WhitespaceTokenizer(return_set=True), 'JACCARD', t) \
        .filter_tables(l, r, 'id', 'id', 's', 's')
    keyset = lambda df: set(zip(df['l_id'].astype(np.int64),
                                df['r_id'].astype(np.int64)))
    assert keyset(got) == keyset(expect)
