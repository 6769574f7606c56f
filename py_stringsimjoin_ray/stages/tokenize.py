"""Tokenization + token-frequency stages.

Replaces the reference's per-worker re-tokenization (each joblib worker
tokenizes its R-slice and the whole of L from scratch,
``/root/reference/py_stringsimjoin/join/set_sim_join.py:39-54``) with a
single tokenize pass per table expressed as ``map_batches`` over Arrow
batches, with the tokenizer held as actor/task state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


class TokenizeStage:
    """Callable-class stage: (key, join_attr) batches → (key, tokens) batches.

    Rows whose join attribute is null are DROPPED here — matching the
    reference's pre-join null drop
    (``utils/generic_helper.py:73-81``).  ``tokenize_many`` runs the
    compiled tokenizer; the tokenizer object is constructed once per actor.
    """

    def __init__(self, key_attr: str, join_attr: str, tokenizer,
                 extra_attrs: tuple = (), keep_string: bool = False):
        self.key_attr = key_attr
        self.join_attr = join_attr
        self.tokenizer = tokenizer
        self.extra_attrs = tuple(extra_attrs)
        self.keep_string = keep_string

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.join_attr]
        mask = col.is_valid()
        if not pa.compute.all(mask).as_py():
            batch = batch.filter(mask)
            col = batch[self.join_attr]
        strings = col.to_pylist()
        token_lists = self.tokenizer.tokenize_many(strings)
        cols = {'key': batch[self.key_attr],
                'tokens': pa.array(token_lists, type=pa.list_(pa.string()))}
        if self.keep_string:
            cols['s'] = col
        for a in self.extra_attrs:
            cols[a] = batch[a]
        return pa.table(cols)


def tokenized_dataset(ds: ray.data.Dataset, key_attr: str, join_attr: str,
                      tokenizer, keep_string: bool = False,
                      batch_size: int = 4096) -> ray.data.Dataset:
    needed = [key_attr, join_attr]
    ds = ds.select_columns(list(dict.fromkeys(needed)))
    fn = TokenizeStage(key_attr, join_attr, tokenizer, keep_string=keep_string)
    return ds.map_batches(fn, batch_format='pyarrow', batch_size=batch_size)


def partial_token_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: token → partial record-frequency.  Pre-aggregating
    inside map_batches keeps the follow-up groupby small (SURVEY.md §2.6)."""
    flat = batch['tokens'].combine_chunks()
    if isinstance(flat, pa.ChunkedArray):  # defensive; combine_chunks on chunked
        flat = flat.combine_chunks()
    values = flat.flatten()
    if len(values) == 0:
        return pa.table({'token': pa.array([], type=pa.string()),
                         'partial': pa.array([], type=pa.int64())})
    vc = values.value_counts()
    return pa.table({'token': vc.field('values'),
                     'partial': vc.field('counts')})


def token_frequencies(tokenized: ray.data.Dataset) -> 'pa.Table':
    """Global (token, count) table.  The groupby is over the pre-combined
    per-batch partials, so the all-to-all exchange moves one row per distinct
    token per batch — not one row per token occurrence."""
    partial = tokenized.map_batches(partial_token_counts, batch_format='pyarrow')
    agg = partial.groupby('token').sum('partial')
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    count_col = 'sum(partial)' if 'sum(partial)' in tbl.column_names else tbl.column_names[1]
    return pa.table({'token': tbl['token'], 'count': tbl[count_col]})


def build_global_ordering(freq_table: pa.Table) -> dict:
    """token→rank dict: rank 1 = rarest; ties broken lexicographically
    (semantics of ``utils/token_ordering.py:24-42``).  The vocabulary is
    assumed driver-collectable (qgram vocabularies are bounded by charset^q;
    word vocabularies are ≪ corpus size — documented scale assumption)."""
    tokens = freq_table['token'].to_pylist()
    counts = freq_table['count'].to_pylist()
    order = sorted(range(len(tokens)), key=lambda i: (counts[i], tokens[i]))
    return {tokens[i]: rank + 1 for rank, i in enumerate(order)}
