"""Unit tests for association_lift / transition_gap_stats /
string_agg_per_group cap — brute-force equality on synthetic inputs."""

import math

import numpy as np
import pandas as pd

import ray

from caligraph_ray.stages import relational as rel
from caligraph_ray.stages.temporal import transition_gap_stats


def test_association_lift_brute_force(ray_session):
    df = pd.DataFrame({
        'u': [1, 1, 1, 2, 2, 3, 3, 3, 4],
        'it': ['a', 'b', 'a', 'a', 'c', 'b', 'c', 'b', 'a'],
    })
    out = rel.collect_pandas(
        rel.association_lift(ray.data.from_pandas(df).repartition(3),
                             'u', 'it'))
    baskets = df.drop_duplicates().groupby('u')['it'].apply(set)
    N = len(baskets)
    n_of = {}
    for s in baskets:
        for i in s:
            n_of[i] = n_of.get(i, 0) + 1
    got = {(r['item_a'], r['item_b']): r for _, r in out.iterrows()}
    for a in n_of:
        for b in n_of:
            if a == b:
                continue
            n_ab = sum(1 for s in baskets if a in s and b in s)
            if n_ab == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r['n_ab'] == n_ab
            assert r['support'] == math.floor(n_ab / N * 1e6) / 1e6
            assert r['confidence'] == \
                math.floor(n_ab / n_of[a] * 1e6) / 1e6
            assert r['lift'] == math.floor(
                float(n_ab * N) / float(n_of[a] * n_of[b]) * 1e6) / 1e6


def test_transition_gap_stats_exact(ray_session):
    base = pd.Timestamp('2024-01-01')
    df = pd.DataFrame({
        'user_id': [1, 1, 1, 2, 2],
        'event_id': [1, 2, 3, 4, 5],
        'ts': [base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=25),
               base, base + pd.Timedelta(seconds=7)],
        'event_type': ['x', 'y', 'x', 'x', 'y'],
    })
    out = rel.collect_pandas(
        transition_gap_stats(ray.data.from_pandas(df).repartition(2)))
    out = out.set_index(['from_type', 'to_type'])
    xy = out.loc[('x', 'y')]
    # x->y gaps: 10s (user 1) and 7s (user 2)
    assert xy['n'] == 2
    assert xy['min_gap_us'] == 7_000_000
    assert xy['max_gap_us'] == 10_000_000
    assert xy['mean_gap_us'] == 8_500_000
    yx = out.loc[('y', 'x')]
    assert yx['n'] == 1 and yx['mean_gap_us'] == 15_000_000


def test_string_agg_cap_truncates_sorted(ray_session):
    df = pd.DataFrame({'k': ['g'] * 30,
                       'v': [str(i) for i in range(30)]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = rel.collect_pandas(
        rel.string_agg_per_group(ds, 'k', 'v', alias='agg', cap=5))
    # lexicographic order of '0'..'29', first 5
    expected = ','.join(sorted(str(i) for i in range(30))[:5])
    assert out['agg'].iloc[0] == expected
    # uncapped still returns everything
    full = rel.collect_pandas(
        rel.string_agg_per_group(ds, 'k', 'v', alias='agg'))
    assert full['agg'].iloc[0] == ','.join(sorted(str(i) for i in range(30)))


def test_rolling_distinct_count_brute_force(ray_session):
    from caligraph_ray.stages.temporal import rolling_distinct_count
    rng = np.random.RandomState(9)
    days = rng.randint(0, 20, 300)
    users = rng.randint(0, 30, 300)
    df = pd.DataFrame({
        'ts': pd.to_datetime(days * 86400, unit='s'),
        'user_id': users,
    })
    out = rel.collect_pandas(
        rolling_distinct_count(ray.data.from_pandas(df).repartition(4),
                               window_days=7))
    got = dict(zip(out['day'], out['n_distinct']))
    active = sorted(set(days))
    assert set(got) == set(active)      # only active anchor days emitted
    for d in active:
        exp = len({u for dd, u in zip(days, users) if d - 6 <= dd <= d})
        assert got[d] == exp, d


def test_weighted_race_per_group_matches_global_within_group(ray_session):
    from caligraph_ray.functions.hashing import md5_hash64
    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        'g': rng.choice(['a', 'b', 'c'], 200),
        'id': np.arange(200),
        'w': rng.randint(1, 100, 200).astype('float64'),
    })
    df.loc[5, 'w'] = 0.0        # never wins
    out = rel.collect_pandas(rel.weighted_race_topk_per_group(
        ray.data.from_pandas(df).repartition(5), 'g', 'id', 'w', 4))
    for g, sub in df.groupby('g'):
        sub = sub[sub['w'] > 0]
        keys = np.array([md5_hash64(f'wrs:42:{i}') for i in sub['id']],
                        dtype=np.float64) / sub['w'].to_numpy()
        order = np.lexsort((sub['id'].to_numpy(), keys))
        exp_ids = sub['id'].to_numpy()[order][:4]
        got_ids = out[out['g'] == g].sort_values(
            ['race_key', 'id'])['id'].to_numpy()
        assert list(got_ids) == list(exp_ids), g
    assert 5 not in set(out['id'])


def test_grouping_sets_matches_pandas(ray_session):
    rng = np.random.RandomState(4)
    df = pd.DataFrame({'a': rng.choice(['x', 'y'], 500),
                       'b': rng.randint(0, 3, 500),
                       'v': rng.randint(1, 10, 500).astype('int64')})
    ds = ray.data.from_pandas(df).repartition(5)
    out = rel.collect_pandas(rel.grouping_sets_sum(
        ds, [('a', 'b'), ('a',), ('b',), ()], 'v'))
    # gid bitmask: MSB = first key aggregated away
    full = out[out['gid'] == 0]
    assert len(full) == df.groupby(['a', 'b']).ngroups
    by_a = out[out['gid'] == 1].set_index('a')['total']
    for a, sub in df.groupby('a'):
        assert int(by_a.loc[a]) == int(sub['v'].sum())
    by_b = out[out['gid'] == 2]
    assert {int(r['b']) for _, r in by_b.iterrows()} == set(df['b'])
    grand = out[out['gid'] == 3]
    assert len(grand) == 1 and int(grand['total'].iloc[0]) == int(df['v'].sum())


def test_grouping_sets_null_group_vs_padding(ray_session):
    # a REAL NULL key value must stay distinct from grouping padding
    df = pd.DataFrame({'a': ['x', None, 'x'],
                       'b': [1, 1, 2],
                       'v': [10, 20, 30]})
    out = rel.collect_pandas(rel.grouping_sets_sum(
        ds := ray.data.from_pandas(df), [('a',), ()], 'v'))
    # one key column: ('a',) -> gid 0, () -> gid 1
    by_a = out[out['gid'] == 0]
    vals = {(None if pd.isna(r['a']) else r['a']): int(r['total'])
            for _, r in by_a.iterrows()}
    assert vals == {'x': 40, None: 20}
    grand = out[out['gid'] == 1]
    assert int(grand['total'].iloc[0]) == 60
