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
``pd.util.hash_pandas_object`` over a dtype-CANONICAL projection (numeric
keys as float64) — a nullable int column converts to float64 only in the
blocks that contain a null, and hashing the raw per-block dtype would
route the same key to different buckets.  Combine output key columns are
rebuilt with the input batch's Arrow types so every block carries one
schema; with nullable NUMERIC keys the final key dtype may still widen to
float64 in the reduce (pandas null representation) — dtype fidelity, not
grouping correctness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_REDUCE_OF = {'min': 'min', 'max': 'max', 'sum': 'sum', 'count': 'sum'}


def _key_buckets(df: pd.DataFrame, keys: list, P: np.uint64) -> np.ndarray:
    """hash(keys) % P over a dtype-canonical projection: numeric/bool key
    columns hash as float64 so int64 blocks and float64 blocks (nullable
    int after to_pandas) route the same value to the same bucket."""
    proj = {}
    for k in keys:
        s = df[k]
        if pd.api.types.is_bool_dtype(s) or pd.api.types.is_numeric_dtype(s):
            s = s.astype(np.float64)
        proj[k] = s
    return (pd.util.hash_pandas_object(pd.DataFrame(proj), index=False)
            .to_numpy() % P).astype(np.int64)


def _restore_key_types(tbl: pa.Table, keys: list,
                       src_schema: pa.Schema) -> pa.Table:
    """Rebuild key columns with the source batch's Arrow types so every
    combine output block carries ONE schema (a nullable int key converts
    to float64 only in blocks that contain a null)."""
    for k in keys:
        want = src_schema.field(k).type
        i = tbl.schema.get_field_index(k)
        if tbl.schema.field(k).type != want:
            col = pa.array(tbl[k].to_pandas(), type=want, from_pandas=True)
            tbl = tbl.set_column(i, k, col)
    return tbl


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
        res.insert(0, '_gb', _key_buckets(res, keys, P))
        # strip pandas schema metadata: it is an unhashable dict that
        # defeats the shuffle's schema deduplication (and spams warnings)
        tbl = pa.Table.from_pandas(res, preserve_index=False) \
            .replace_schema_metadata(None)
        return _restore_key_types(tbl, keys, batch.schema)

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
        df.insert(0, '_gb', _key_buckets(df, keys, P))
        tbl = pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)
        return _restore_key_types(tbl, keys, batch.schema)

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
