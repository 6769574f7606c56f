"""In-process index shims for the reference's probe surface.

The distributed engine replaces broadcast per-worker indexes with postings
shuffles, but the reference API also exposes index objects users probe
directly (``index/prefix_index.py:6-57``, ``index/position_index.py:8-83``).
These shims reproduce that surface for code written against the reference:
build once over ORDERED token lists, then ``Filter.find_candidates`` probes
them pair-locally.
"""

from __future__ import annotations

from . import bounds


class PrefixIndex:
    """token → [record ids], over each record's prefix tokens only
    (reference ``index/prefix_index.py:24-57``)."""

    def __init__(self, token_lists, sim_measure_type, threshold, qval=None):
        self.index: dict = {}
        for rid, tokens in enumerate(token_lists):
            p = bounds.prefix_length(len(tokens), sim_measure_type,
                                     threshold, qval)
            for tok in tokens[:p]:
                self.index.setdefault(tok, []).append(rid)

    def probe(self, token):
        return self.index.get(token, [])


class PositionIndex:
    """token → [(record id, position)] over prefix tokens, plus size cache
    and observed min/max token counts (reference
    ``index/position_index.py:29-83``)."""

    def __init__(self, token_lists, sim_measure_type, threshold, qval=None):
        self.index: dict = {}
        self.size_cache: list = []
        self.min_length = None
        self.max_length = None
        for rid, tokens in enumerate(token_lists):
            n = len(tokens)
            self.size_cache.append(n)
            self.min_length = n if self.min_length is None \
                else min(self.min_length, n)
            self.max_length = n if self.max_length is None \
                else max(self.max_length, n)
            p = bounds.prefix_length(n, sim_measure_type, threshold, qval)
            for pos, tok in enumerate(tokens[:p]):
                self.index.setdefault(tok, []).append((rid, pos))
        if self.min_length is None:
            self.min_length = 0
            self.max_length = 0

    def probe(self, token):
        return self.index.get(token, [])


class InvertedIndex:
    """token → [row ids] over ALL tokens of the index attr, plus optional
    size cache (reference ``index/inverted_index.py:29-68``).  Takes the
    reference's (table-as-tuples, attr position, tokenizer) surface;
    ``build`` reports empty records like the reference."""

    def __init__(self, table, index_attr, tokenizer, cache_size_flag=False):
        self.table = table
        self.index_attr = index_attr
        self.tokenizer = tokenizer
        self.cache_size_flag = cache_size_flag
        self.index = None
        self.size_cache = None

    def build(self, cache_empty_records=True):
        self.index = {}
        self.size_cache = []
        empty_records = []
        for row_id, row in enumerate(self.table):
            tokens = self.tokenizer.tokenize(row[self.index_attr])
            for token in tokens:
                self.index.setdefault(token, []).append(row_id)
            if self.cache_size_flag:
                self.size_cache.append(len(tokens))
            if cache_empty_records and len(tokens) == 0:
                empty_records.append(row_id)
        return {'empty_records': empty_records}

    def probe(self, token):
        return self.index.get(token, [])


class SizeIndex:
    """token count → [row ids]; empty records tracked but not indexed
    (reference ``index/size_index.py:22-58``)."""

    def __init__(self, table, index_attr, tokenizer):
        self.table = table
        self.index_attr = index_attr
        self.tokenizer = tokenizer
        self.index = None
        self.min_length = 2 ** 63 - 1
        self.max_length = 0

    def build(self, cache_empty_records=True):
        self.index = {}
        empty_records = []
        for row_id, row in enumerate(self.table):
            num_tokens = len(self.tokenizer.tokenize(row[self.index_attr]))
            self.min_length = min(self.min_length, num_tokens)
            self.max_length = max(self.max_length, num_tokens)
            if num_tokens == 0:
                if cache_empty_records:
                    empty_records.append(row_id)
                continue
            self.index.setdefault(num_tokens, []).append(row_id)
        return {'empty_records': empty_records}

    def probe(self, num_tokens):
        return self.index.get(num_tokens, [])
