"""Event-stream window operators: tumbling-window aggregation and gap-based
sessionization.

Ray Data has no native windowed aggregate or session-window operator; these
are the composition forms the engine uses at scale:

- ``tumbling_window_agg``: per-block PARTIAL aggregation (pandas C-speed
  groupby inside ``map_batches``) followed by one bucketed global sum over
  the (key, window) partials (``stages/groupagg.py``) — the combiner
  pattern, so the all-to-all exchange moves one row per
  (key, window, block), never one row per event.
- ``sessionize``: events are hash-bucketed by key (``groupby`` on a derived
  bucket column co-locates every event of a key without creating one Python
  call per key); inside each bucket a single vectorized pass (lexsort +
  diff + cumsum) assigns session sequence numbers for ALL keys in the
  bucket at once.

Partitioning assumption (documented per the engine's custom-operator rule):
``sessionize`` requires every event of a key to land in one group —
guaranteed by bucketing on ``hash(key) % num_buckets``; a key whose event
count exceeds a block is still fine (Ray Data groups are not
block-bounded), but a single key holding a large fraction of the corpus
serializes on that bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

KNUTH64 = np.uint64(0x9E3779B97F4A7C15)


def tumbling_window_agg(ds: ray.data.Dataset, ts_col: str, key_col: str,
                        value_col: str, width_s: int) -> ray.data.Dataset:
    """Count / sum / mean of ``value_col`` per (key, epoch-aligned tumbling
    window of ``width_s`` seconds).  Output columns:
    ``(key_col, window_id, n_events, sum_value, avg_value)`` where
    ``window_id = floor(epoch_microseconds / (width_s * 1e6))``."""
    width_us = int(width_s) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp('us')).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            key_col: batch[key_col].to_numpy(zero_copy_only=False),
            'window_id': ts // width_us,
            'value': batch[value_col].to_numpy(zero_copy_only=False),
        })
        g = df.groupby([key_col, 'window_id'], sort=False)['value'] \
            .agg(['count', 'sum']).reset_index()
        return pa.table({key_col: pa.array(g[key_col]),
                         'window_id': pa.array(g['window_id'].astype(np.int64)),
                         'n_partial': pa.array(g['count'].astype(np.int64)),
                         'sum_partial': pa.array(g['sum'].astype(np.float64))})
    partial.__name__ = 'window_partial_agg'

    # bucketed sum over the partials: (key, window) cardinality grows with
    # the stream, where ray's native aggregate reduce is pathologically slow
    from .groupagg import bucketed_group_agg
    merged = bucketed_group_agg(
        ds.map_batches(partial, batch_format='pyarrow'),
        [key_col, 'window_id'],
        [('n_total', 'n_partial', 'sum'),
         ('sum_total', 'sum_partial', 'sum')])

    def finish(batch: pa.Table) -> pa.Table:
        n = batch['n_total'].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = batch['sum_total'].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({key_col: batch[key_col],
                         'window_id': batch['window_id'],
                         'n_events': pa.array(n),
                         'sum_value': pa.array(s),
                         'avg_value': pa.array(s / n)})
    finish.__name__ = 'window_finish'
    return merged.map_batches(finish, batch_format='pyarrow')


def sessionize(ds: ray.data.Dataset, ts_col: str, key_col: str,
               id_col: str, gap_s: int,
               num_buckets: int = 64) -> ray.data.Dataset:
    """Gap-based session assignment: within a key's time-ordered event
    stream (ties broken by ``id_col``), a new session starts when the gap
    from the previous event exceeds ``gap_s`` seconds.  Output columns:
    ``(id_col, key_col, session_seq)`` with ``session_seq`` 0-based per
    key."""
    gap_us = int(gap_s) * 1_000_000

    def bucketed(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        # fail fast with a clear message: a null key would hash fine here
        # but crash opaquely in the per-bucket lexsort (None vs str compare)
        nulls = pa.compute.sum(pa.compute.is_null(col).cast(pa.int64()))
        if (nulls.as_py() or 0) > 0:
            raise ValueError(
                f'sessionize: key column {key_col!r} contains '
                f'{nulls.as_py()} null value(s); drop or fill them first '
                f'(e.g. ds.filter(expr="{key_col} is not null"))')
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            keys = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            b = ((keys.astype(np.uint64) * KNUTH64) >> np.uint64(40)) \
                % np.uint64(num_buckets)
        else:  # string / binary keys: deterministic cross-block hash
            b = pd.util.hash_array(col.to_numpy(zero_copy_only=False),
                                   categorize=False) \
                % np.uint64(num_buckets)
        return pa.table({'sbucket': pa.array(b.astype(np.int32)),
                         id_col: batch[id_col],
                         key_col: batch[key_col],
                         '_ts_us': batch[ts_col].cast(pa.timestamp('us'))
                                                .cast(pa.int64())})

    def assign(tbl: pa.Table) -> pa.Table:
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        ts = tbl['_ts_us'].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, keys))
        k, t = keys[order], ts[order]
        new_key = np.empty(len(k), dtype=bool)
        new_key[:1] = True
        new_key[1:] = k[1:] != k[:-1]
        gap_break = np.empty(len(k), dtype=bool)
        gap_break[:1] = True
        gap_break[1:] = (t[1:] - t[:-1]) > gap_us
        boundary = new_key | gap_break
        sess_global = np.cumsum(boundary) - 1
        # per-key 0-base: subtract the global session id at the key's first
        # event, forward-propagated (sess_global is nondecreasing)
        start = np.where(new_key, sess_global, -1)
        start = np.maximum.accumulate(start)
        seq = sess_global - start
        return pa.table({id_col: pa.array(ids[order]),
                         key_col: pa.array(k),
                         'session_seq': pa.array(seq.astype(np.int64))})
    assign.__name__ = 'sessionize_bucket'

    return ds.map_batches(bucketed, batch_format='pyarrow') \
        .groupby('sbucket') \
        .map_groups(assign, batch_format='pyarrow')
