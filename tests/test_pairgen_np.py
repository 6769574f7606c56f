"""Numpy bucket-kernel differential tests (stages/pairgen.py, VERDICT r4
#1): the vectorized candidates kernel must emit EXACTLY the row-wise
reference path's pairs for every filter_tables mode — including forced
heavy-token salting, duplicate signature classes, bag tokenizers and
same-table inputs.  The row-wise path is the oracle-pinned ground truth
(tests/test_property_filters.py ties it to per-kernel oracles)."""

import numpy as np
import pandas as pd
import pytest

from py_stringsimjoin_ray import (OverlapFilter, PositionFilter, PrefixFilter,
                                  QgramTokenizer, WhitespaceTokenizer)


def _tables(n=40, seed=11):
    rng = np.random.default_rng(seed)
    words = [f'w{i}' for i in range(12)]

    def mk(shift):
        rows = []
        for i in range(n):
            k = int(rng.integers(1, 6))
            toks = ['common'] + list(rng.choice(words, size=k))
            if i % 7 == 0:     # exact-duplicate classes
                toks = ['common', 'dup', 'dup2']
            rows.append(' '.join(toks))
        return pd.DataFrame({'id': [shift + i for i in range(n)],
                             's': rows})
    return mk(0), mk(1000)


def _canon(df):
    cols = [c for c in df.columns if c != '_sim_score']
    out = sorted(map(tuple, df[cols].itertuples(index=False)))
    if '_sim_score' in df.columns:
        smap = sorted(map(tuple, df.round({'_sim_score': 10})
                          .itertuples(index=False)))
        return out, smap
    return out


def _both_paths(monkeypatch, fn):
    monkeypatch.delenv('SSJ_PAIRGEN_ROWWISE', raising=False)
    fast = fn()
    monkeypatch.setenv('SSJ_PAIRGEN_ROWWISE', '1')
    slow = fn()
    monkeypatch.delenv('SSJ_PAIRGEN_ROWWISE', raising=False)
    return fast, slow


@pytest.mark.parametrize('salt', [10 ** 9, 2])
@pytest.mark.parametrize('build', [
    lambda: (OverlapFilter(WhitespaceTokenizer(return_set=True), 2), {}),
    lambda: (OverlapFilter(QgramTokenizer(qval=2, return_set=False), 3),
             {'out_sim_score': True}),
    lambda: (PrefixFilter(WhitespaceTokenizer(return_set=True),
                          'JACCARD', 0.4), {}),
    lambda: (PositionFilter(WhitespaceTokenizer(return_set=True),
                            'DICE', 0.55), {}),
    lambda: (PositionFilter(WhitespaceTokenizer(return_set=True),
                            'OVERLAP', 2), {}),
], ids=['overlap_set', 'overlap_bag_score', 'prefix_jac', 'position_dice',
        'position_overlap'])
def test_np_kernel_matches_rowwise(ray_session, monkeypatch, salt, build):
    l, r = _tables()
    f, kw = build()
    fast, slow = _both_paths(
        monkeypatch,
        lambda: f.filter_tables(l, r, 'id', 'id', 's', 's',
                                salt_df_threshold=salt, **kw))
    assert _canon(fast) == _canon(slow)
    assert len(fast) > 0


def test_np_kernel_same_table_identity(ray_session, monkeypatch):
    # same DataFrame on both sides: single-side postings, identity class
    # pairs, duplicate signature classes
    l, _ = _tables(24, seed=3)
    f = PrefixFilter(WhitespaceTokenizer(return_set=True), 'JACCARD', 0.5)
    fast, slow = _both_paths(
        monkeypatch, lambda: f.filter_tables(l, l, 'id', 'id', 's', 's'))
    assert _canon(fast) == _canon(slow)
    # identity pairs present exactly once
    pairs = list(zip(fast['l_id'], fast['r_id']))
    assert len(pairs) == len(set(pairs))
    assert all((i, i) in set(pairs) for i in l['id'])


def test_np_kernel_prefix_edit_distance(ray_session, monkeypatch):
    rng = np.random.default_rng(5)
    base = ['martha', 'marhta', 'jones', 'jonse', 'aaaaa', 'aaaab',
            'different', 'differant']
    l = pd.DataFrame({'id': range(len(base)), 's': base})
    r = pd.DataFrame({'id': range(100, 100 + len(base)),
                      's': [x + rng.choice(['', 's']) for x in base]})
    f = PrefixFilter(QgramTokenizer(qval=2, return_set=False),
                     'EDIT_DISTANCE', 1)
    fast, slow = _both_paths(
        monkeypatch, lambda: f.filter_tables(l, r, 'id', 'id', 's', 's'))
    assert _canon(fast) == _canon(slow)
    assert len(fast) > 0


def test_np_kernel_salted_dup_classes(ray_session, monkeypatch):
    # several identical records share a salted heavy token: class collapse
    # + grid roles + identity emission must still be exact-once
    rows = ['common heavy alpha beta'] * 6 + \
           ['common heavy alpha gamma'] * 3 + ['rare solo text'] * 2
    l = pd.DataFrame({'id': range(len(rows)), 's': rows})
    r = pd.DataFrame({'id': range(500, 500 + len(rows)), 's': rows})
    f = OverlapFilter(WhitespaceTokenizer(return_set=True), 2)
    fast, slow = _both_paths(
        monkeypatch,
        lambda: f.filter_tables(l, r, 'id', 'id', 's', 's',
                                salt_df_threshold=2))
    assert _canon(fast) == _canon(slow)
    pairs = list(zip(fast['l_id'], fast['r_id']))
    assert len(pairs) == len(set(pairs))


def test_np_kernel_position_edit_distance(ray_session, monkeypatch):
    """The EDIT_DISTANCE position-filter path (qgram bags, ED overlap
    threshold with qval, ED size bounds) through the numpy kernel must
    match the row-wise reference path."""
    names = ['martha', 'marhta', 'marta', 'jones', 'jonse', 'joness',
             'aaaaaa', 'aaaaab', 'zzzzz', 'different']
    l = pd.DataFrame({'id': range(len(names)), 's': names})
    r = pd.DataFrame({'id': range(200, 200 + len(names)),
                      's': [n + x for n, x in
                            zip(names, ['', 's', '', 'x', '', '', 'a', '',
                                        '', 'ly'])]})
    f = PositionFilter(QgramTokenizer(qval=2, return_set=False),
                       'EDIT_DISTANCE', 2)
    fast, slow = _both_paths(
        monkeypatch, lambda: f.filter_tables(l, r, 'id', 'id', 's', 's'))
    assert _canon(fast) == _canon(slow)
    assert len(fast) > 0
