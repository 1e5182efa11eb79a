"""Unit tests for the round-5 window/CDC/set operators — the NULL and tie
edges the driver oracle can't reach (the testdata events table has no
NULLs): lag/lead over NULL values, all-NULL running prefixes, rank ties,
snapshot-diff NULL-vs-NULL columns, NULL-key intersects."""

import numpy as np
import pandas as pd
import pytest

import ray

from caligraph_ray.stages import relational as rel
from caligraph_ray.stages.temporal import lag_lead_delta, running_total


def _events(rows):
    df = pd.DataFrame(rows, columns=['event_id', 'ts', 'user_id',
                                     'value', 'event_type'])
    df['ts'] = pd.to_datetime(df['ts'], unit='us').astype('datetime64[us]')
    return ray.data.from_pandas(df)


def test_lag_lead_delta_null_values_and_partition_edges(ray_session):
    ev = _events([
        (1, 10, 7, 1.00, 'a'),
        (2, 20, 7, None, 'b'),    # NULL value: delta NULL here AND next row
        (3, 30, 7, 4.50, 'c'),
        (4, 10, 8, 2.00, 'a'),    # new partition: first row delta NULL
    ])
    out = rel.collect_pandas(lag_lead_delta(ev)) \
        .sort_values('event_id').reset_index(drop=True)
    # SQL: c - LAG(c) is NULL when either side is NULL (rows 2/3) or the
    # row opens its partition (rows 1/4)
    assert all(pd.isna(v) for v in out['delta_cents'].tolist())
    assert out['next_type'].tolist() == ['b', 'c', None, None]


def test_lag_lead_delta_exact_cents(ray_session):
    ev = _events([
        (1, 10, 7, 1.10, 'a'),
        (2, 20, 7, 3.33, 'b'),
        (3, 30, 7, 2.00, 'c'),
    ])
    out = rel.collect_pandas(lag_lead_delta(ev)) \
        .sort_values('event_id').reset_index(drop=True)
    deltas = out['delta_cents'].tolist()
    assert pd.isna(deltas[0])
    assert deltas[1:] == [223, -133]   # floor-cents: 333-110, 200-333


def test_running_total_null_prefix(ray_session):
    ev = _events([
        (1, 10, 7, None, 'a'),    # all-NULL prefix → SQL NULL sum, count 0
        (2, 20, 7, 2.00, 'a'),
        (3, 30, 7, None, 'a'),    # NULL row: sum carries, count unchanged
        (4, 40, 7, 0.50, 'a'),
    ])
    out = rel.collect_pandas(running_total(ev)) \
        .sort_values('event_id').reset_index(drop=True)
    sums = out['run_sum_cents'].tolist()
    assert pd.isna(sums[0])
    assert sums[1:] == [200, 200, 250]
    assert out['run_n'].tolist() == [0, 1, 1, 2]


def test_grouped_rank_ties_gap_vs_dense(ray_session):
    df = pd.DataFrame({'g': ['x'] * 4 + ['y'] * 2,
                       'u': [1, 2, 3, 4, 5, 6],
                       'n': [9, 9, 5, 5, 3, 1]})
    out = rel.collect_pandas(rel.grouped_rank(
        ray.data.from_pandas(df), 'g', 'n', ascending=False)) \
        .sort_values(['g', 'u']).reset_index(drop=True)
    assert out['rnk'].tolist() == [1, 1, 3, 3, 1, 2]     # gaps after ties
    assert out['drnk'].tolist() == [1, 1, 2, 2, 1, 2]    # no gaps


def test_snapshot_diff_classification(ray_session):
    old = ray.data.from_pandas(pd.DataFrame({
        'doc_id': [1, 2, 3, 4],
        'lang': ['en', 'de', None, 'fr']}))
    new = ray.data.from_pandas(pd.DataFrame({
        'doc_id': [1, 3, 4, 5],
        'lang': ['en', None, 'xx', 'es']}))
    out = rel.collect_pandas(
        rel.snapshot_diff(old, new, 'doc_id', ['lang'])) \
        .sort_values('doc_id').reset_index(drop=True)
    # 1: unchanged (dropped); 2: removed; 3: NULL IS NOT DISTINCT FROM NULL
    # (dropped); 4: changed; 5: added
    assert list(zip(out['doc_id'].astype(int), out['change'])) == \
        [(2, 'removed'), (4, 'changed'), (5, 'added')]


def test_snapshot_diff_null_to_value_is_change(ray_session):
    old = ray.data.from_pandas(pd.DataFrame(
        {'doc_id': [1], 'lang': [None]}))
    new = ray.data.from_pandas(pd.DataFrame(
        {'doc_id': [1], 'lang': ['en']}))
    out = rel.collect_pandas(rel.snapshot_diff(old, new, 'doc_id', ['lang']))
    assert out['change'].tolist() == ['changed']


def test_distinct_intersect_dedup_and_nulls(ray_session):
    a = ray.data.from_pandas(pd.DataFrame(
        {'k': [1.0, 1.0, 2.0, None, 7.0]}))
    b = ray.data.from_pandas(pd.DataFrame(
        {'j': [2.0, 2.0, None, 9.0]}))
    out = rel.collect_pandas(rel.distinct_intersect(a, b, 'k', 'j'))
    got = {(None if pd.isna(v) else float(v)) for v in out['key']}
    # SQL INTERSECT distinct semantics: NULLs on both sides intersect
    assert got == {2.0, None}
