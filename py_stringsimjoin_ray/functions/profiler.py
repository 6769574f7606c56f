"""Table profiler (reference:
``/root/reference/py_stringsimjoin/profiler/profiler.py:9-85``): per
attribute, unique-value count, missing-value count, percentages and a
key-suitability comment.

On a Dataset the counts are computed distributed — null count via a
vectorized map_batches partial + sum, unique count via an exact
``groupby(col).count()`` per attribute (pandas' ``unique`` counts NaN as a
value; the Dataset path reproduces that)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..core import validation as V


def _format_statistic(stat, stat_percent):
    return ''.join([str(stat), ' (', str(stat_percent), '%)'])


def _dataset_counts(ds, attr):
    def partial(batch: pa.Table) -> pa.Table:
        col = batch[attr]
        return pa.table({
            'nulls': pa.array([col.null_count], type=pa.int64()),
            'rows': pa.array([len(col)], type=pa.int64()),
        })
    agg = ds.select_columns([attr]).map_batches(
        partial, batch_format='pyarrow').to_pandas().sum()
    uniq = ds.select_columns([attr]).unique(attr)
    n_unique = len(uniq)
    # pandas .unique() counts NaN as one distinct value; ray's unique drops
    # nulls from the distinct list, so add it back when nulls exist
    if agg['nulls'] > 0 and not any(v is None for v in uniq):
        n_unique += 1
    return int(agg['rows']), n_unique, int(agg['nulls'])


def profile_table_for_join(input_table, profile_attrs=None):
    V.validate_input_table(input_table, 'input table')
    is_pd = isinstance(input_table, pd.DataFrame)
    cols = V.table_columns(input_table)
    if profile_attrs is None:
        profile_attrs = list(cols)
    else:
        for attr in profile_attrs:
            V.validate_attr(attr, cols, 'profile attribute', 'input table')

    profile_output = []
    if is_pd:
        num_rows = len(input_table)
    for attr in profile_attrs:
        if is_pd:
            unique_values = len(input_table[attr].unique())
            missing_values = int(sum(pd.isnull(input_table[attr])))
        else:
            num_rows, unique_values, missing_values = _dataset_counts(
                input_table, attr)
        unique_percent = round((float(unique_values) / float(num_rows)) * 100, 2)
        missing_percent = round((float(missing_values) / float(num_rows)) * 100, 2)
        comments = ''
        if missing_percent > 0:
            comments = ''.join(['Joining on this attribute will ignore ',
                                _format_statistic(missing_values,
                                                  missing_percent), ' rows.'])
        if unique_percent == 100.0 and missing_values == 0:
            comments = 'This attribute can be used as a key attribute.'
        profile_output.append((attr,
                               _format_statistic(unique_values, unique_percent),
                               _format_statistic(missing_values, missing_percent),
                               comments))
    out = pd.DataFrame(profile_output, columns=['Attribute', 'Unique values',
                                                'Missing values', 'Comments'])
    return out.set_index('Attribute')


def profile_counts(input_table, profile_attrs=None):
    """Numeric variant (attribute, unique_values, missing_values) — oracle-
    friendly output used by the correctness harness."""
    V.validate_input_table(input_table, 'input table')
    is_pd = isinstance(input_table, pd.DataFrame)
    cols = V.table_columns(input_table)
    if profile_attrs is None:
        profile_attrs = list(cols)
    rows = []
    for attr in profile_attrs:
        if is_pd:
            rows.append((attr, len(input_table[attr].unique()),
                         int(sum(pd.isnull(input_table[attr])))))
        else:
            _, u, m = _dataset_counts(input_table, attr)
            rows.append((attr, u, m))
    return pd.DataFrame(rows, columns=['attribute', 'unique_values',
                                       'missing_values'])
