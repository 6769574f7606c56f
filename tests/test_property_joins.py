"""Property-based tests: every join pipeline vs naive all-pairs brute force.

The generators aim tokens at a tiny vocabulary so candidate structures
(shared tokens, duplicate rows, empty strings) occur constantly; the
pipelines' candidate generation + filtering + verification must reproduce
the brute-force pair set and scores exactly (reference semantics:
allow_empty (∅,∅) pairs score 1.0 for the set measures, see
``join/set_sim_join.py:81-96``).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_stringsimjoin_ray.core.measures import levenshtein
from py_stringsimjoin_ray.core.tokenizers import (QgramTokenizer,
                                                  WhitespaceTokenizer)
from py_stringsimjoin_ray.pipelines import join

WORDS = ['aa', 'ab', 'abc', 'bc', 'ca', 'dab', 'e', 'aa']  # dup → collisions


def _text():
    return st.lists(st.sampled_from(WORDS), min_size=0, max_size=6) \
        .map(' '.join)


def _table(max_rows=12):
    return st.lists(_text(), min_size=1, max_size=max_rows).map(
        lambda ss: pd.DataFrame({'id': range(len(ss)), 's': ss}))


def _sims(tokens_l, tokens_r, sim_type):
    a, b = set(tokens_l), set(tokens_r)
    inter = len(a & b)
    if sim_type == 'OVERLAP':
        return float(inter)
    if not a and not b:
        return None  # allow_empty territory — handled by the caller
    if not a or not b:
        return 0.0
    if sim_type == 'JACCARD':
        return inter / len(a | b)
    if sim_type == 'COSINE':
        return inter / np.sqrt(len(a) * len(b))
    if sim_type == 'DICE':
        return 2.0 * inter / (len(a) + len(b))
    if sim_type == 'OVERLAP_COEFFICIENT':
        return inter / min(len(a), len(b))
    raise AssertionError(sim_type)


def _brute(l_pd, r_pd, tok, sim_type, t):
    """(l_id, r_id, score) triples the reference semantics require."""
    out = set()
    for _, lr in l_pd.iterrows():
        ltok = tok.tokenize(lr['s'])
        for _, rr in r_pd.iterrows():
            rtok = tok.tokenize(rr['s'])
            s = _sims(ltok, rtok, sim_type)
            if s is None:  # both empty: allow_empty pair, score 1.0
                out.add((lr['id'], rr['id'], 1.0))
            elif s >= t:
                out.add((lr['id'], rr['id'], round(s, 4)))
    return out


_JOINS = {
    'JACCARD': join.jaccard_join,
    'COSINE': join.cosine_join,
    'DICE': join.dice_join,
    'OVERLAP_COEFFICIENT': join.overlap_coefficient_join,
}


def _got_pairs(df):
    return set(zip(df['l_id'], df['r_id'],
                   [round(s, 4) for s in df['_sim_score']]))


@pytest.mark.parametrize('sim_type', list(_JOINS))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(),
       t=st.sampled_from([0.2, 0.45, 0.7, 0.95]))
def test_set_sim_joins_match_brute_force(sim_type, l, r, t):
    tok = WhitespaceTokenizer(return_set=True)
    got = _JOINS[sim_type](l, r, 'id', 'id', 's', 's', tok, t)
    assert _got_pairs(got) == _brute(l, r, tok, sim_type, t)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([1, 2, 4]))
def test_overlap_join_matches_brute_force(l, r, t):
    tok = WhitespaceTokenizer(return_set=True)
    got = join.overlap_join(l, r, 'id', 'id', 's', 's', tok, t)
    # OVERLAP has no allow_empty pairs: _sims returns 0.0 for (∅,∅), which
    # never reaches an integer threshold ≥ 1
    assert _got_pairs(got) == _brute(l, r, tok, 'OVERLAP', t)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(max_rows=10),
       t=st.sampled_from([0.3, 0.6]))
def test_self_join_matches_brute_force(l, t):
    """jaccard_join(A, A): full ordered pair matrix incl. (x, x)."""
    tok = WhitespaceTokenizer(return_set=True)
    got = join.jaccard_join(l, l, 'id', 'id', 's', 's', tok, t)
    assert _got_pairs(got) == _brute(l, l, tok, 'JACCARD', t)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(l=_table(), r=_table(), t=st.sampled_from([0.4, 0.8]))
def test_qgram_jaccard_matches_brute_force(l, r, t):
    tok = QgramTokenizer(qval=2, return_set=True)
    got = join.jaccard_join(l, r, 'id', 'id', 's', 's', tok, t)
    assert _got_pairs(got) == _brute(l, r, tok, 'JACCARD', t)


# edit distance: words long enough that the qgram count bound is positive
# (len >= q + q*d with q=2, d<=2 → len >= 6), where the prefix-filter join
# is exact and brute-force comparable
_LONG = ['abcdef', 'abcdeg', 'abcdff', 'zbcdef', 'abzdef', 'qrstuv',
         'qrstuw', 'abcdefgh']


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ls=st.lists(st.sampled_from(_LONG), min_size=1, max_size=10),
       rs=st.lists(st.sampled_from(_LONG), min_size=1, max_size=10),
       d=st.sampled_from([1, 2]))
def test_edit_distance_join_matches_brute_force(ls, rs, d):
    l = pd.DataFrame({'id': range(len(ls)), 's': ls})
    r = pd.DataFrame({'id': range(len(rs)), 's': rs})
    got = join.edit_distance_join(l, r, 'id', 'id', 's', 's', d)
    expect = set()
    for _, lr in l.iterrows():
        for _, rr in r.iterrows():
            ed = levenshtein(lr['s'], rr['s'])
            if ed <= d:
                expect.add((lr['id'], rr['id'], float(ed)))
    assert set(zip(got['l_id'], got['r_id'],
                   [float(s) for s in got['_sim_score']])) == expect


class TestBulkSetScoresProperty:
    """Property: the apply_matcher fast-path kernel (_bulk_set_scores)
    equals the scalar measures on arbitrary pair lists — empties, dups,
    repeated value pairs and bag tokenizers included."""

    @given(st.lists(st.tuples(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=6)
        .map(' '.join),
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=6)
        .map(' '.join)), min_size=1, max_size=40),
        st.sampled_from(['JACCARD', 'COSINE', 'DICE', 'OVERLAP',
                         'OVERLAP_COEFFICIENT']),
        st.booleans())
    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_kernel_matches_scalar(self, pairs, sim_type, return_set):
        from py_stringsimjoin_ray.core import measures
        from py_stringsimjoin_ray.pipelines.matcher import _bulk_set_scores
        tok = WhitespaceTokenizer(return_set=return_set)
        lv = np.asarray([p[0] for p in pairs], dtype=object)
        rv = np.asarray([p[1] for p in pairs], dtype=object)
        got = _bulk_set_scores(lv, rv, tok, sim_type)
        fn = measures.SIM_FUNCTIONS[sim_type]
        want = np.asarray([fn(tok.tokenize(a), tok.tokenize(b))
                           for a, b in pairs], dtype=np.float64)
        np.testing.assert_array_equal(got, want)
