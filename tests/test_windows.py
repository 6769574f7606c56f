"""Window-operator semantics: tumbling-window combiner aggregation and
gap-based sessionization (stages/windows.py).  Boundary cases the sf0.001
oracle rehearsal may not exercise: gap exactly equal to the threshold (NOT
a break), ties on timestamp broken by id, multi-block partial merge."""

import numpy as np
import pandas as pd
import ray.data

from py_stringsimjoin_ray.stages.windows import (sessionize,
                                                 tumbling_window_agg)


def _events(rows):
    df = pd.DataFrame(rows, columns=['event_id', 'user_id', 'ts_us', 'value'])
    df['ts'] = pd.to_datetime(df['ts_us'], unit='us')
    return ray.data.from_pandas(df[['event_id', 'user_id', 'ts', 'value']])


US = 1_000_000


def test_tumbling_window_agg_multi_block():
    rows = [(i, i % 3, (i % 7) * 600 * US, float(i)) for i in range(200)]
    ds = _events(rows).repartition(8)
    out = tumbling_window_agg(ds, 'ts', 'user_id', 'value', 3600).to_pandas()
    exp = pd.DataFrame(rows, columns=['event_id', 'user_id', 'ts_us', 'value'])
    exp['window_id'] = exp['ts_us'] // (3600 * US)
    g = exp.groupby(['user_id', 'window_id'])['value'] \
        .agg(['count', 'sum', 'mean']).reset_index()
    merged = out.merge(g, on=['user_id', 'window_id'], how='outer')
    assert len(merged) == len(out) == len(g)
    assert (merged['n_events'] == merged['count']).all()
    assert np.allclose(merged['sum_value'], merged['sum'])
    assert np.allclose(merged['avg_value'], merged['mean'])


def test_sessionize_gap_boundary_and_ties():
    gap = 1800
    rows = [
        # user 1: second event exactly at the gap -> SAME session;
        # third event one microsecond past -> new session
        (10, 1, 0, 0.0),
        (11, 1, gap * US, 0.0),
        (12, 1, 2 * gap * US + 1, 0.0),
        # user 2: timestamp tie -> order (and sessions) broken by event_id
        (21, 2, 5, 0.0),
        (20, 2, 5, 0.0),
        (22, 2, 5 + gap * US + 1, 0.0),
    ]
    out = sessionize(_events(rows), 'ts', 'user_id', 'event_id',
                     gap).to_pandas()
    seq = dict(zip(out['event_id'], out['session_seq']))
    assert seq[10] == 0 and seq[11] == 0 and seq[12] == 1
    assert seq[20] == 0 and seq[21] == 0 and seq[22] == 1


def test_sessionize_per_key_zero_base_across_buckets():
    # many users so several share a hash bucket; every user's first
    # session must be 0 regardless of bucket co-residents
    rows = []
    for u in range(50):
        rows.append((u * 10, u, u * US, 0.0))
        rows.append((u * 10 + 1, u, (u + 7200) * US, 0.0))
    out = sessionize(_events(rows), 'ts', 'user_id', 'event_id', 1800,
                     num_buckets=4).to_pandas()
    first = out[out['event_id'] % 10 == 0]
    second = out[out['event_id'] % 10 == 1]
    assert (first['session_seq'] == 0).all()
    assert (second['session_seq'] == 1).all()


def test_sessionize_string_keys():
    # Arrow-native assign (round 4): string key columns ride the numpy
    # object path and come back as Arrow strings
    rows = [(1, 'alice', 0 * US, 0.0), (2, 'alice', 100 * US, 0.0),
            (3, 'alice', 5000 * US, 0.0), (4, 'bob', 0 * US, 0.0),
            (5, 'bob', 7200 * US, 0.0)]
    df = pd.DataFrame(rows, columns=['event_id', 'user_id', 'ts_us',
                                     'value'])
    df['ts'] = pd.to_datetime(df['ts_us'], unit='us')
    ds = ray.data.from_pandas(df[['event_id', 'user_id', 'ts', 'value']])
    out = sessionize(ds, 'ts', 'user_id', 'event_id', 1800).to_pandas()
    seq = dict(zip(out['event_id'], out['session_seq']))
    assert seq[1] == 0 and seq[2] == 0 and seq[3] == 1
    assert seq[4] == 0 and seq[5] == 1
    assert set(out['user_id']) == {'alice', 'bob'}


def test_sessionize_null_key_fails_fast(ray_session):
    """ADVICE r4: null keys used to crash deep in the per-bucket lexsort
    (None vs str compare); now the bucketing stage raises a clear error."""
    import pyarrow as pa
    import pytest
    import ray
    df = pd.DataFrame({
        'ts': pd.to_datetime(['2024-01-01 00:00:00'] * 3),
        'user_id': pd.array(['u1', None, 'u2'], dtype=object),
        'event_id': [1, 2, 3],
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match='null'):
        sessionize(ds, 'ts', 'user_id', 'event_id', 1800).to_pandas()
