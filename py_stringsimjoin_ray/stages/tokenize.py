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
    reference's pre-join null drop (``utils/generic_helper.py:73-81``).
    Built-in tokenizers run their Arrow batch kernel (``tokenize_arrow``);
    user-supplied tokenizers fall back to the reference's per-row
    ``.tokenize(str)`` contract.  The tokenizer object is constructed once
    per actor."""

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
        if pa.types.is_null(col.type):
            # an all-null input block arrives as Arrow type null; after the
            # null drop above it is empty — cast so tokenizers see string
            col = col.cast(pa.string())
        if hasattr(self.tokenizer, 'tokenize_arrow'):
            tokens = self.tokenizer.tokenize_arrow(col)
        else:  # user-supplied tokenizer: reference contract is .tokenize(str)
            tk = self.tokenizer.tokenize
            tokens = pa.array([tk(s) for s in col.to_pylist()],
                              type=pa.list_(pa.string()))
        cols = {'key': batch[self.key_attr], 'tokens': tokens}
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


def partial_token_counts_hashed(batch: pa.Table) -> pa.Table:
    """``partial_token_counts`` plus the token's 64-bit hash, computed ONCE
    here (parallel, fused with tokenize), with rows SORTED by hash — the
    sharded vocabulary build then takes its hash range from each block as
    a binary-search slice (zero scan amplification across shards)."""
    import numpy as np

    from .postings import _token_hashes
    t = partial_token_counts(batch)
    if len(t) == 0:
        return t.append_column('h', pa.array([], pa.uint64()))
    h = _token_hashes(t['token'].combine_chunks())
    order = np.argsort(h, kind='stable')
    t = t.take(pa.array(order))
    return t.append_column('h', pa.array(h[order], pa.uint64()))


def token_partials(tokenized: ray.data.Dataset) -> ray.data.Dataset:
    """Materialized per-block (token, partial-count) combiner outputs.
    Row count = Σ per-block distinct tokens — the quantity the driver-merge
    gate in the join pipeline routes on (VERDICT r4 #5)."""
    return tokenized.map_batches(partial_token_counts,
                                 batch_format='pyarrow',
                                 batch_size=None).materialize()


def token_frequencies(tokenized: ray.data.Dataset,
                      partial: ray.data.Dataset | None = None) -> 'pa.Table':
    """Global (token, count) table.  Per-batch combiners shrink each block to
    its distinct tokens; the partials are merged on the DRIVER (one vectorized
    groupby over blocks × vocab rows) — the result is vocab-sized and needed
    on the driver anyway to build the ordering artifact, so a distributed
    groupby here would round-trip through an all-to-all shuffle only to be
    collected right back.  Scale note: partial volume is (num blocks ×
    vocab); the join pipeline gates on the materialized partial row count
    (``token_partials``) and auto-routes to the fully distributed ordering
    (stages/dist_ordering.py) beyond it instead of collecting here."""
    if partial is None:
        partial = tokenized.map_batches(partial_token_counts,
                                        batch_format='pyarrow',
                                        batch_size=None)
    parts = [pa.table(b) for b in partial.iter_batches(batch_size=None,
                                                       batch_format='pyarrow')]
    merged = pa.concat_tables([p for p in parts if len(p)]) if parts else \
        pa.table({'token': pa.array([], pa.string()),
                  'partial': pa.array([], pa.int64())})
    if len(merged) == 0:
        return pa.table({'token': pa.array([], pa.string()),
                         'count': pa.array([], pa.int64())})
    agg = merged.group_by('token').aggregate([('partial', 'sum')])
    return pa.table({'token': agg['token'], 'count': agg['partial_sum']})


def build_ordering_table(freq_table: pa.Table) -> pa.Array:
    """The ordering artifact: a StringArray where position i holds the token
    of rank i+1 — rank 1 = rarest, ties broken lexicographically (semantics
    of ``utils/token_ordering.py:24-42``).  As a plain Arrow array it lives
    zero-copy in the object store; workers map tokens to ranks with one
    vectorized ``pc.index_in`` per batch instead of a per-token dict walk
    (the dict form cost a multi-second unpickle per worker at
    multi-million-token vocabularies)."""
    idx = pa.compute.sort_indices(
        freq_table, sort_keys=[('count', 'ascending'), ('token', 'ascending')])
    col = freq_table['token'].take(idx)
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def build_global_ordering(freq_table: pa.Table) -> dict:
    """token→rank dict view of the ordering — for the pure-Python kernels
    (SuffixFilter recursion, unit oracles).  Driver-collectable vocabularies
    only; the distributed join path uses ``build_ordering_table``."""
    ranked = build_ordering_table(freq_table)
    return {t: i + 1 for i, t in enumerate(ranked.to_pylist())}
