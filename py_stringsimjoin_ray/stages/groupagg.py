"""Bucketed group-aggregate — the engine's replacement for Ray Data's
native ``groupby(key).aggregate(...)`` on HIGH-CARDINALITY keys.

Ray's native aggregate sorts the full stream by the group key and pays a
per-group cost in the reduce; at millions of distinct keys that is
pathological (measured: 190 s for a 12M-row / 3M-group min on 8 CPUs).
This module expresses the same result as the engine's standard bucket
pattern:

    map_batches:  per-block pandas combiner (groupby → partial per
                  distinct key in the block) + bucket = hash(key) % P
    groupby(bucket).map_groups:  vectorized pandas reduce per bucket

so the shuffle key has ONLY P distinct values (P ≈ a few × CPUs — on a
cluster, a few × total cores), the sort is trivial, and every per-key
reduction is one C-level pandas groupby.  Same 12M-row min: 2.0 s — 95×.

Semantics match the native aggregate: one output row per distinct key
combination; ``count`` counts rows (keys with null values included),
``min``/``max``/``sum`` reduce the value column.  Key hashing uses
``pd.util.hash_pandas_object`` so any hashable dtype (ints, strings,
mixed multi-column keys) buckets uniformly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_REDUCE_OF = {'min': 'min', 'max': 'max', 'sum': 'sum', 'count': 'sum'}


def _default_buckets() -> int:
    try:
        cpus = int(ray.cluster_resources().get('CPU', 8))
    except Exception:  # pragma: no cover - ray not initialised
        cpus = 8
    return max(32, cpus * 4)


def bucketed_group_agg(ds: ray.data.Dataset, keys: list[str],
                       aggs: list[tuple], num_buckets: int | None = None
                       ) -> ray.data.Dataset:
    """``ds.groupby(keys) → one row per key combo with the requested
    aggregates``, shuffled by key-hash bucket instead of by key.

    ``aggs``: list of ``(out_col, in_col, kind)`` with kind in
    ``{'min', 'max', 'sum', 'count'}``; for ``count`` the ``in_col`` is
    ignored (row count per group).  Output columns: ``keys + out_cols``.
    """
    if num_buckets is None:
        num_buckets = _default_buckets()
    keys = list(keys)
    P = np.uint64(num_buckets)

    need = list(dict.fromkeys(keys + [a[1] for a in aggs if a[1]]))

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.select(need).to_pandas()
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for out, col, kind in aggs:
            if kind == 'count':
                parts[out] = g.size()
            else:
                parts[out] = g[col].agg(kind)
        res = pd.DataFrame(parts).reset_index()
        bucket = (pd.util.hash_pandas_object(res[keys], index=False)
                  .to_numpy() % P).astype(np.int64)
        res.insert(0, '_gb', bucket)
        # strip pandas schema metadata: it is an unhashable dict that
        # defeats the shuffle's schema deduplication (and spams warnings)
        return pa.Table.from_pandas(res, preserve_index=False) \
            .replace_schema_metadata(None)

    combine.__name__ = 'group_combine'

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {out: g[out].agg(_REDUCE_OF[kind])
                 for out, _col, kind in aggs}
        return pd.DataFrame(parts).reset_index()[keys
                                                 + [a[0] for a in aggs]]

    reduce_bucket.__name__ = 'group_reduce'

    return ds.map_batches(combine, batch_format='pyarrow') \
        .groupby('_gb').map_groups(reduce_bucket, batch_format='pandas')


def bucketed_distinct(ds: ray.data.Dataset, keys: list[str],
                      num_buckets: int | None = None) -> ray.data.Dataset:
    """Distinct key combinations (``ds.select(keys).unique()``), bucketed:
    per-block dedup bounds the shuffle by the per-block distinct sum, the
    P-key sort is trivial, per-bucket dedup is one pandas drop_duplicates."""
    if num_buckets is None:
        num_buckets = _default_buckets()
    keys = list(keys)
    P = np.uint64(num_buckets)

    def block_distinct(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas().drop_duplicates()
        bucket = (pd.util.hash_pandas_object(df[keys], index=False)
                  .to_numpy() % P).astype(np.int64)
        df.insert(0, '_gb', bucket)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    block_distinct.__name__ = 'distinct_combine'

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(keys)[keys]

    reduce_bucket.__name__ = 'distinct_reduce'

    return ds.map_batches(block_distinct, batch_format='pyarrow') \
        .groupby('_gb').map_groups(reduce_bucket, batch_format='pandas')


def bucketed_distinct_count(ds: ray.data.Dataset, keys: list[str],
                            num_buckets: int | None = None) -> int:
    """Exact number of distinct key combinations; only per-bucket COUNTS
    reach the driver (never the values)."""
    if num_buckets is None:
        num_buckets = _default_buckets()
    distinct = bucketed_distinct(ds, keys, num_buckets)

    def count_rows(batch: pa.Table) -> pa.Table:
        return pa.table({'n': pa.array([len(batch)], pa.int64())})

    parts = distinct.map_batches(count_rows,
                                 batch_format='pyarrow').to_pandas()
    return int(parts['n'].sum()) if len(parts) else 0
