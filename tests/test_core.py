"""Unit tests for the pure-Python semantic kernel (no Ray)."""

import numpy as np
import pytest

from py_stringsimjoin_ray.core import bounds, measures, ordering
from py_stringsimjoin_ray.core.tokenizers import (AlphanumericTokenizer,
                                                  DelimiterTokenizer,
                                                  QgramTokenizer,
                                                  WhitespaceTokenizer)


class TestTokenizers:
    def test_whitespace(self):
        t = WhitespaceTokenizer()
        assert t.tokenize('a  b\tc a') == ['a', 'b', 'c', 'a']
        assert t.tokenize('') == []
        assert t.tokenize('  ') == []

    def test_return_set_dedup_first_occurrence(self):
        t = WhitespaceTokenizer(return_set=True)
        assert t.tokenize('b a b c a') == ['b', 'a', 'c']

    def test_qgram_padding(self):
        t = QgramTokenizer(qval=2)
        assert t.tokenize('ab') == ['#a', 'ab', 'b$']
        # empty string with padding yields one qgram
        assert t.tokenize('') == ['#$']
        assert t.tokenize('a') == ['#a', 'a$']

    def test_qgram_no_padding(self):
        t = QgramTokenizer(qval=3, padding=False)
        assert t.tokenize('ab') == []
        assert t.tokenize('abcd') == ['abc', 'bcd']

    def test_qgram_bag_vs_set(self):
        bag = QgramTokenizer(qval=2, return_set=False)
        st = QgramTokenizer(qval=2, return_set=True)
        assert bag.tokenize('aaa') == ['#a', 'aa', 'aa', 'a$']
        assert st.tokenize('aaa') == ['#a', 'aa', 'a$']

    def test_delimiter(self):
        t = DelimiterTokenizer([',', ' '])
        assert t.tokenize('a,b c,,d') == ['a', 'b', 'c', 'd']

    def test_alnum(self):
        t = AlphanumericTokenizer()
        assert t.tokenize('ab-c12 .x') == ['ab', 'c12', 'x']

    def test_type_errors(self):
        with pytest.raises(TypeError):
            WhitespaceTokenizer().tokenize(None)
        with pytest.raises(TypeError):
            WhitespaceTokenizer().tokenize(42)

    # edge strings exercising empty-token filtering, dedup, unicode widths
    EDGE = ['', '  ', 'a', ' a  b\tc a ', 'b a b c a', 'aaa', 'héllo wörld',
            'café café', 'a,b c,,d', 'ab-c12 .x', '#$', 'x' * 50,
            '日本 語 日本', 'tab\there', 'a.b.c', '--', '123 123 456']

    @pytest.mark.parametrize('tok', [
        WhitespaceTokenizer(), WhitespaceTokenizer(return_set=True),
        DelimiterTokenizer([',', ' ']),
        DelimiterTokenizer([',', '. '], return_set=True),
        QgramTokenizer(qval=2), QgramTokenizer(qval=2, return_set=True),
        QgramTokenizer(qval=3, padding=False),
        QgramTokenizer(qval=1, return_set=True),
        AlphanumericTokenizer(), AlphanumericTokenizer(return_set=True),
    ], ids=lambda t: type(t).__name__ + ('_set' if t.return_set else '')
       + str(getattr(t, 'qval', '')))
    def test_tokenize_arrow_matches_per_row(self, tok):
        import pyarrow as pa
        got = tok.tokenize_arrow(pa.array(self.EDGE)).to_pylist()
        assert got == [tok.tokenize(s) for s in self.EDGE]

    # pure-ASCII batch: drives the qgram byte-window fast path (a single
    # non-ASCII row above routes the whole batch to the per-row fallback)
    ASCII_EDGE = ['', 'a', 'ab', 'aaa', 'abcdef', 'a b,c', 'x' * 40, '##$$']

    @pytest.mark.parametrize('tok', [
        QgramTokenizer(qval=2), QgramTokenizer(qval=2, return_set=True),
        QgramTokenizer(qval=3, padding=False), QgramTokenizer(qval=1),
        QgramTokenizer(qval=4, prefix_pad='<', suffix_pad='>'),
    ], ids=['q2', 'q2set', 'q3nopad', 'q1', 'q4pads'])
    def test_qgram_ascii_fast_path(self, tok):
        import pyarrow as pa
        got = tok.tokenize_arrow(pa.array(self.ASCII_EDGE)).to_pylist()
        assert got == [tok.tokenize(s) for s in self.ASCII_EDGE]

    def test_qgram_fast_path_on_sliced_array(self):
        import pyarrow as pa
        tok = QgramTokenizer(qval=2)
        arr = pa.array(['zz', 'ab', 'cd', 'zz']).slice(1, 2)  # offset != 0
        assert tok.tokenize_arrow(arr).to_pylist() == \
            [tok.tokenize('ab'), tok.tokenize('cd')]

    def test_tokenize_arrow_chunked_and_empty(self):
        import pyarrow as pa
        tok = WhitespaceTokenizer(return_set=True)
        chunked = pa.chunked_array([['a b a'], ['c']])
        assert tok.tokenize_arrow(chunked).to_pylist() == [['a', 'b'], ['c']]
        assert tok.tokenize_arrow(pa.array([], pa.string())).to_pylist() == []
        q = QgramTokenizer(qval=2)
        assert q.tokenize_arrow(pa.array([], pa.string())).to_pylist() == []

    def test_qgram_large_string_column(self):
        # large_string has int64 offsets; the int32 byte-window parse must
        # not misread it (regression: returned wrong tokens silently)
        import pyarrow as pa
        vals = ['abc', 'defg', '', 'xy']
        for tok in (QgramTokenizer(qval=2, padding=False),
                    QgramTokenizer(qval=2),
                    QgramTokenizer(qval=3, return_set=True)):
            arr = pa.array(vals, type=pa.large_string())
            assert tok.tokenize_arrow(arr).to_pylist() == \
                [tok.tokenize(s) for s in vals]


class TestMeasures:
    def test_empty_conventions(self):
        assert measures.jaccard([], []) == 1.0
        assert measures.cosine([], []) == 1.0
        assert measures.dice([], []) == 1.0
        assert measures.overlap_coefficient([], []) == 1.0
        assert measures.jaccard(['a'], []) == 0.0
        assert measures.overlap([], []) == 0

    def test_values(self):
        assert measures.jaccard(['a', 'b'], ['b', 'c']) == pytest.approx(1 / 3)
        assert measures.dice(['a', 'b'], ['b', 'c']) == pytest.approx(0.5)
        assert measures.cosine(['a', 'b'], ['b', 'c']) == pytest.approx(0.5)
        assert measures.overlap_coefficient(['a', 'b', 'c'], ['b', 'c']) == 1.0
        assert measures.overlap(['a', 'b', 'b'], ['b', 'b']) == 1

    def test_levenshtein(self):
        lev = measures.levenshtein
        assert lev('', '') == 0
        assert lev('abc', '') == 3
        assert lev('kitten', 'sitting') == 3
        assert lev('flaw', 'lawn') == 2
        assert lev('abc', 'abc') == 0
        rng = np.random.default_rng(7)
        letters = 'abcd'
        # cross-check against a simple reference DP
        def ref(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a):
                ndp = [i + 1]
                for j, cb in enumerate(b):
                    ndp.append(min(dp[j] + (ca != cb), dp[j + 1] + 1,
                                   ndp[-1] + 1))
                dp = ndp
            return dp[-1]
        for _ in range(50):
            a = ''.join(rng.choice(list(letters), rng.integers(0, 10)))
            b = ''.join(rng.choice(list(letters), rng.integers(0, 10)))
            assert lev(a, b) == ref(a, b), (a, b)

    def test_bag_product_overlap(self):
        a = np.array([1, 1, 2, 3])
        b = np.array([1, 1, 1, 3, 4])
        # token 1: 2*3=6, token 3: 1*1=1
        assert measures.bag_product_overlap_sorted(a, b) == 7


class TestBounds:
    @pytest.mark.parametrize('st,t,n,lb,ub,pl', [
        ('JACCARD', 0.5, 4, 2, 8, 3),
        ('JACCARD', 0.8, 5, 4, 6, 2),
        ('COSINE', 0.7, 10, 5, 20, 6),
        ('DICE', 0.5, 6, 2, 18, 5),
        ('OVERLAP', 3, 5, 3, None, 3),
    ])
    def test_formulas(self, st, t, n, lb, ub, pl):
        assert bounds.size_lower_bound(n, st, t) == lb
        if ub is not None:
            assert bounds.size_upper_bound(n, st, t) == ub
        assert bounds.prefix_length(n, st, t) == pl

    def test_prefix_zero(self):
        assert bounds.prefix_length(0, 'JACCARD', 0.5) == 0

    def test_edit_distance_bounds(self):
        assert bounds.size_lower_bound(10, 'EDIT_DISTANCE', 2) == 8
        assert bounds.size_upper_bound(10, 'EDIT_DISTANCE', 2) == 12
        assert bounds.prefix_length(10, 'EDIT_DISTANCE', 2, qval=2) == 5
        assert bounds.prefix_length(3, 'EDIT_DISTANCE', 2, qval=2) == 3

    def test_overlap_threshold(self):
        assert bounds.overlap_threshold(4, 6, 'JACCARD', 0.5) == 4
        assert bounds.overlap_threshold(4, 4, 'DICE', 0.5) == 2
        # max(5+2-1, 5+2-1) - 2 + 1 - 2*1 = 3 (filter_utils.py:90-93)
        assert bounds.overlap_threshold(5, 5, 'EDIT_DISTANCE', 1, qval=2) == 3


class TestOrdering:
    def test_rank_rare_first_ties_lexicographic(self):
        o = ordering.build_ordering_for_lists([['b', 'a'], ['b', 'c']])
        # freqs: a=1, c=1, b=2 → ranks: a=1, c=2, b=3
        assert o == {'a': 1, 'c': 2, 'b': 3}

    def test_apply_sorts_and_drops_unknown(self):
        o = {'a': 3, 'b': 1}
        assert ordering.apply_ordering(['a', 'x', 'b'], o) == [1, 3]
