"""Property-based equivalence: the distributed relational primitives vs
single-process pandas references, over hypothesis-generated frames with the
shapes that have bitten before — duplicate keys, NULL keys, int columns
whose null-bearing blocks demote to float64, empty sides.

Example counts are small (Ray execution per example); the generators are
biased toward collisions (tiny key alphabets) so every example exercises
real group/join structure.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_KEYS = st.one_of(st.integers(min_value=0, max_value=4), st.none())
_VALS = st.integers(min_value=-1000, max_value=1000)


def _frame(draw, key_col, val_col, max_rows=12):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    ks = draw(st.lists(_KEYS, min_size=n, max_size=n))
    vs = draw(st.lists(_VALS, min_size=n, max_size=n))
    return pd.DataFrame({key_col: pd.array(ks, dtype='Int64'),
                         val_col: np.array(vs, dtype='int64')})


@st.composite
def join_inputs(draw):
    return _frame(draw, 'k', 'x'), _frame(draw, 'kk', 'y', max_rows=8)


@st.composite
def agg_input(draw):
    return _frame(draw, 'k', 'v', max_rows=20)


def _sql_join_reference(l, r, how):
    """pandas merge with SQL NULL semantics: null keys match nothing."""
    rr = r[r['kk'].notna()]
    if how == 'inner':
        l = l[l['k'].notna()]
    return l.merge(rr, how=how, left_on='k', right_on='kk')


def _canon_rows(df, cols):
    out = []
    for _, row in df.iterrows():
        out.append(tuple(None if pd.isna(row[c]) else int(row[c])
                         for c in cols))
    return sorted(out, key=lambda t: tuple((v is None, v) for v in t))


@SETTINGS
@given(join_inputs())
def test_shuffle_join_matches_sql_semantics(ray_session, inputs):
    import ray.data as rd
    from caligraph_ray.stages.relational import shuffle_join
    l, r = inputs
    for how in ('inner', 'left'):
        want = _sql_join_reference(l, r, how)
        if len(l) == 0:
            continue   # Ray from_pandas of a fully empty frame is schema-less
        got = shuffle_join(rd.from_pandas(l), rd.from_pandas(r),
                           'k', 'kk', how=how).to_pandas()
        assert _canon_rows(got, ['k', 'x', 'y']) == \
            _canon_rows(want, ['k', 'x', 'y']), f'how={how}'


@SETTINGS
@given(agg_input())
def test_two_phase_agg_matches_pandas(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.relational import two_phase_pandas_agg
    if len(df) == 0:
        return
    want = df.groupby('k', dropna=False)['v'] \
        .agg(total='sum', n='size', lo='min').reset_index()
    got = two_phase_pandas_agg(
        rd.from_pandas(df).repartition(3), ['k'],
        {'total': ('v', 'sum'), 'n': (None, 'count'), 'lo': ('v', 'min')}
    ).to_pandas()
    cols = ['k', 'total', 'n', 'lo']
    assert _canon_rows(got, cols) == _canon_rows(want, cols)


@SETTINGS
@given(agg_input(), st.integers(min_value=1, max_value=3))
def test_topk_per_group_matches_pandas(ray_session, df, k):
    import ray.data as rd
    from caligraph_ray.stages.relational import topk_per_group
    if len(df) == 0:
        return
    # deterministic order: v desc then k — mirror with the same sort
    want = df.sort_values(['v'], ascending=[False], kind='mergesort') \
        .groupby('k', sort=False, dropna=False).head(k)
    got = topk_per_group(rd.from_pandas(df).repartition(2), 'k', ['v'],
                         k=k, ascending=[False]).to_pandas()
    # compare per-group multisets of v (row order within ties is engine
    # internal; the honest contract is the top-k VALUE multiset per group)
    def by_group(d):
        out = {}
        for _, row in d.iterrows():
            kk = None if pd.isna(row['k']) else int(row['k'])
            out.setdefault(kk, []).append(int(row['v']))
        return {g: sorted(vs) for g, vs in out.items()}
    assert by_group(got) == by_group(want)


@st.composite
def event_frame(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    ks = draw(st.lists(_KEYS, min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(min_value=0, max_value=500),
                       min_size=n, max_size=n))
    return pd.DataFrame({
        'event_id': np.arange(n, dtype='int64'),
        'user_id': pd.array(ks, dtype='Int64'),
        'ts': pd.to_datetime(ts, unit='s').astype('datetime64[us]'),
        'value': np.arange(n, dtype='float64')})


def _sessionize_reference(df, gap_us):
    """Single-process reference: per key (NULLs one partition), order by
    (ts, event_id), gap > gap_us starts a session."""
    out = []
    key = df['user_id'].map(lambda v: -1 if pd.isna(v) else int(v))
    for g, sub in df.assign(_g=key).groupby('_g'):
        sub = sub.sort_values(['ts', 'event_id'], kind='mergesort')
        tsv = sub['ts'].astype('datetime64[us]').astype('int64').tolist()
        sessions = []
        for i, t in enumerate(tsv):
            if i == 0 or t - tsv[i - 1] > gap_us:
                sessions.append([t, t, 1])
            else:
                sessions[-1][1] = t
                sessions[-1][2] += 1
        for idx, (s, e, n) in enumerate(sessions):
            out.append((g, idx + 1, n, s, e))
    return sorted(out)


@SETTINGS
@given(event_frame(), st.integers(min_value=1, max_value=100))
def test_sessionize_matches_reference(ray_session, df, gap_s):
    import ray.data as rd
    from caligraph_ray.stages.temporal import sessionize
    gap_us = gap_s * 1_000_000
    got = sessionize(rd.from_pandas(df).repartition(2),
                     gap_us=gap_us).to_pandas()
    got_rows = sorted(
        (-1 if pd.isna(r['user_id']) else int(r['user_id']),
         int(r['session_idx']), int(r['n_events']),
         int(pd.Timestamp(r['start_ts']).value // 1000),
         int(pd.Timestamp(r['end_ts']).value // 1000))
        for _, r in got.iterrows())
    assert got_rows == _sessionize_reference(df, gap_us)


@SETTINGS
@given(event_frame(), event_frame())
def test_asof_join_matches_merge_asof(ray_session, left, right):
    import ray.data as rd
    from caligraph_ray.stages.temporal import asof_join
    right = right.rename(columns={'event_id': 'okey', 'user_id': 'cust',
                                  'ts': 'odate'}).drop(columns=['value'])
    # single right row per (cust, odate): the documented tie contract
    right = right.drop_duplicates(['cust', 'odate'], keep='last')
    # reference: pandas merge_asof per non-null key group
    l = left[left['user_id'].notna()].sort_values('ts', kind='mergesort')
    r = right[right['cust'].notna()].sort_values('odate', kind='mergesort')
    want = []
    for _, row in l.iterrows():
        cand = r[(r['cust'] == row['user_id']) & (r['odate'] <= row['ts'])]
        if len(cand):
            best = cand.sort_values(['odate'], kind='mergesort').iloc[-1]
            want.append((int(row['event_id']), int(best['okey'])))
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    'user_id', 'cust', 'ts', 'odate',
                    right_cols=['okey'], inner=True).to_pandas()
    got_rows = sorted((int(r['event_id']), int(r['okey']))
                      for _, r in got.iterrows())
    assert got_rows == sorted(want)


@SETTINGS
@given(st.integers(min_value=0, max_value=30), st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=4))
def test_stratified_sample_quota_and_partition_invariance(ray_session, n, k, parts):
    """stratified_sample: exactly min(k, |stratum|) rows per stratum, the
    SAME rows at any partitioning (pure function of the id), matching the
    single-process md5-rank reference."""
    import ray.data as rd
    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.stages.relational import stratified_sample
    df = pd.DataFrame({'doc_id': np.arange(n, dtype='int64'),
                       'lang': [['en', 'fr', 'de'][i % 3] for i in range(n)]})
    want = set()
    for lang, g in df.groupby('lang'):
        ranked = sorted((md5_hash64(f'strat:42:{i}'), i) for i in g['doc_id'])
        want |= {i for _, i in ranked[:k]}
    for p in (1, parts + 1):
        out = stratified_sample(rd.from_pandas(df).repartition(p),
                                'lang', 'doc_id', k).to_pandas()
        if not n:   # empty exchanges come back schema-less (documented)
            assert out.empty
            continue
        assert set(out['doc_id'].astype(int)) == want
        assert (out.groupby('lang').size() <= k).all()


@settings(deadline=None)
@given(st.lists(st.text(alphabet='ab\x00', min_size=0, max_size=6),
                min_size=1, max_size=8, unique=True))
def test_col_hash_value_pure_with_embedded_nul(keys):
    """_col_hash must be a function of the VALUE only — pandas'
    categorize=True default hashed 'a\\x00b' differently depending on which
    other values shared its batch (factorize-path NUL truncation), silently
    dropping join matches on NUL-packed pair keys."""
    import pandas as pd
    from caligraph_ray.stages.relational import _col_hash
    solo = {k: _col_hash(pd.Series([k]))[0] for k in keys}
    together = dict(zip(keys, _col_hash(pd.Series(keys))))
    assert solo == together


def test_shuffle_join_broadcast_regime_equals_shuffle(ray_session, monkeypatch):
    """The JOIN_BROADCAST_BYTES auto-gate must be invisible: same rows for
    the broadcast-merge regime and the forced union-shuffle regime, inner
    and left, with nulls on both key sides."""
    import ray.data as rd
    import caligraph_ray.stages.relational as rel
    L = pd.DataFrame({'k': [1, 2, 2, None, 5], 'lv': ['a', 'b', 'c', 'd', 'e']})
    R = pd.DataFrame({'k': [2, 2, None, 7], 'rv': [10, 20, 30, 40]})
    for how in ('inner', 'left'):
        outs = []
        for forced in (32 << 20, 0):
            monkeypatch.setattr(rel, 'JOIN_BROADCAST_BYTES', forced)
            out = rel.collect_pandas(rel.shuffle_join(
                rd.from_pandas(L), rd.from_pandas(R),
                left_on='k', right_on='k', how=how))
            canon = out.fillna('_N_').astype(str)
            outs.append(canon.sort_values(list(canon.columns))
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


def test_shuffle_join_fact_hint_equals_auto(ray_session):
    """right_hint='fact' (no gate, no measuring materialization — the
    streaming path for dataset-sized right sides) must return the same
    rows as the default gated path, inner and left."""
    import ray.data as rd
    import caligraph_ray.stages.relational as rel
    L = pd.DataFrame({'k': [1, 2, 2, None, 5], 'lv': ['a', 'b', 'c', 'd', 'e']})
    R = pd.DataFrame({'k': [2, 2, None, 7], 'rv': [10, 20, 30, 40]})
    for how in ('inner', 'left'):
        outs = []
        for hint in ('auto', 'fact'):
            out = rel.collect_pandas(rel.shuffle_join(
                rd.from_pandas(L), rd.from_pandas(R),
                left_on='k', right_on='k', how=how, right_hint=hint))
            canon = out.fillna('_N_').astype(str)
            outs.append(canon.sort_values(list(canon.columns))
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.booleans(),
       st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)),
                min_size=1, max_size=12),
       st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)),
                min_size=1, max_size=8),
       st.lists(st.booleans(), min_size=20, max_size=20))
def test_shuffle_join_fuzz_vs_pandas_merge(ray_session, str_keys, left,
                                           right, nulls):
    """shuffle_join (whichever regime the gate picks) must equal a plain
    pandas merge with SQL NULL-key semantics — int keys with NULLs, or
    NUL-bearing string keys with NULLs (one logical key type per join,
    the engine contract; pandas itself refuses mixed-type object keys)."""
    import ray.data as rd
    import caligraph_ray.stages.relational as rel

    def key(i, flag):
        if flag:
            return None
        return f'k\x00{i}' if str_keys else i

    nit = iter(nulls + [False] * 20)
    L = pd.DataFrame({'k': [key(k, next(nit)) for k, _ in left],
                      'lv': [v for _, v in left]})
    R = pd.DataFrame({'k': [key(k, next(nit)) for k, _ in right],
                      'rv': [v * 10 for _, v in right]})
    got = rel.collect_pandas(rel.shuffle_join(
        rd.from_pandas(L), rd.from_pandas(R), 'k', 'k', how='inner'))
    exp = L[L['k'].notna()].merge(R[R['k'].notna()], on='k', how='inner')

    def canon(df):
        # numeric columns normalize through float (int keys can demote to
        # float64 in transit when a sibling row carried NULL — a
        # documented, value-preserving property, not a defect). Sort on
        # NUL-escaped copies: pandas MULTI-column sort_values factorizes
        # its keys and factorize truncates at NUL, leaving NUL-distinct
        # keys in arbitrary relative order (the flake this canon had).
        from caligraph_ray.stages.relational import _nul_escape
        out = {}
        for c in df.columns:
            try:
                out[c] = pd.to_numeric(df[c]).astype('float64')
            except (ValueError, TypeError):
                out[c] = df[c].astype(str).map(_nul_escape)
        o = pd.DataFrame(out)
        return o.sort_values(list(o.columns)).reset_index(drop=True)
    if len(got) == 0 and len(exp) == 0:
        return
    try:
        pd.testing.assert_frame_equal(canon(got[exp.columns.tolist()]),
                                      canon(exp))
    except AssertionError:
        import pickle
        with open('/tmp/join_fuzz_fail.pkl', 'wb') as f:
            pickle.dump({'L': L, 'R': R, 'got': got, 'exp': exp}, f)
        raise


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.booleans(),
       st.lists(st.tuples(st.integers(0, 4), st.integers(-3, 3)),
                min_size=1, max_size=15),
       st.lists(st.booleans(), min_size=15, max_size=15))
def test_grouped_map_fuzz_vs_pandas_groupby(ray_session, str_keys, rows,
                                            nulls):
    """grouped_map (whichever exchange regime) must see every group whole
    and exactly once — totals per key equal a pandas groupby, for int and
    NUL-bearing string keys with NULLs (dropna=False contract)."""
    import ray.data as rd
    from caligraph_ray.stages.relational import collect_pandas, grouped_map

    def key(i, flag):
        if flag:
            return None
        return f'g\x00{i}' if str_keys else i

    nit = iter(nulls)
    df = pd.DataFrame({'k': [key(k, next(nit)) for k, _ in rows],
                       'v': [v for _, v in rows]})

    def per_group(g: pd.DataFrame):
        return pd.DataFrame({'k': [g['k'].iloc[0]],
                             'n': [len(g)], 's': [int(g['v'].sum())]})

    got = collect_pandas(grouped_map(rd.from_pandas(df), ['k'], per_group))
    # NUL-safe reference: plain dicts (pandas groupby itself conflates
    # NUL-distinct keys — the bug class the engine now escapes around)
    acc = {}
    for k, v in zip(df['k'], df['v']):
        if k is None or (isinstance(k, float) and k != k):
            k = 'NULL'     # one SQL-style null group (dict NaN != NaN)
        cur = acc.setdefault(k, [0, 0])
        cur[0] += 1
        cur[1] += v
    exp = pd.DataFrame({'k': list(acc), 'n': [a[0] for a in acc.values()],
                        's': [a[1] for a in acc.values()]})
    canon = lambda d: (d.astype({'k': str, 'n': 'int64', 's': 'int64'})
                       .sort_values(['k']).reset_index(drop=True))
    # null keys render as None/nan/NaN depending on transit — unify
    fix = lambda d: d.assign(k=d['k'].map(
        lambda x: 'NULL' if x is None or (isinstance(x, float) and x != x)
        or str(x) in ('nan', 'None', '<NA>') else x))
    pd.testing.assert_frame_equal(canon(fix(got))[['k', 'n', 's']],
                                  canon(fix(exp))[['k', 'n', 's']])


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=9),
                          st.sampled_from(['a', 'b', 'view', 'click x'])),
                min_size=1, max_size=60))
def test_pivot_unpivot_round_trip(ray_session, pairs):
    """pivot_counts → unpivot reproduces the exact (row, col, n) counts
    including materialized zero cells; columns are the sorted distinct
    col values (the dynamic SQL PIVOT contract)."""
    from collections import Counter

    import ray.data as rd

    from caligraph_ray.stages.relational import pivot_counts, unpivot
    df = pd.DataFrame({'r': np.array([p[0] for p in pairs], dtype='int64'),
                       'c': [p[1] for p in pairs]})
    wide = pivot_counts(rd.from_pandas(df).repartition(2), 'r', 'c')
    names = [c for c in wide.schema().names if c != 'r']
    assert names == sorted({p[1] for p in pairs})
    long = unpivot(wide, ['r'], names, var_name='c',
                   value_name='n').to_pandas()
    want = Counter(pairs)
    rows = {int(p[0]) for p in pairs}
    for _, row in long.iterrows():
        assert row['n'] == want.get((row['r'], row['c']), 0)
    assert set(long['r'].astype(int)) == rows
    assert len(long) == len(rows) * len(names)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(['a', 'b']),
                          st.floats(min_value=-50, max_value=50,
                                    allow_nan=False, width=32),
                          st.integers(min_value=0, max_value=23)),
                min_size=1, max_size=50))
def test_grouped_moments_matches_reference(ray_session, rows):
    """Exact-integer var/cov vs a plain-Python reference on the SAME
    quantized ints — including negative covariances, where the truncating
    division must match DuckDB's // semantics."""
    import math

    import ray.data as rd

    from caligraph_ray.stages.relational import _trunc_div, grouped_moments
    df = pd.DataFrame({'k': [r[0] for r in rows],
                       'x': np.array([r[1] for r in rows], dtype='float64'),
                       'y': np.array([r[2] for r in rows], dtype='int64')})
    got = grouped_moments(rd.from_pandas(df).repartition(2), 'k', 'x',
                          y_col='y', scale=1000).to_pandas()
    got = got.set_index('k')
    for k, g in df.groupby('k'):
        xq = [math.floor(v * 1000) for v in g['x']]
        ys = list(g['y'])
        n = len(xq)
        var = (n * sum(v * v for v in xq) - sum(xq) ** 2) // (n * n)
        cov = _trunc_div(n * sum(a * b for a, b in zip(xq, ys))
                         - sum(xq) * sum(ys), n * n)
        assert int(got.loc[k, 'n']) == n
        assert int(got.loc[k, 'var_q']) == var, k
        assert int(got.loc[k, 'cov_q']) == cov, k


def test_trunc_div_matches_duckdb():
    import duckdb

    from caligraph_ray.stages.relational import _trunc_div
    for num in (-7, 7, -8, 8, 0, -1, 1, -999999999999, 999999999999):
        for den in (2, -2, 3, -3, 7):
            want = duckdb.sql(f'SELECT {num} // {den}').fetchone()[0]
            assert _trunc_div(num, den) == want, (num, den)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.one_of(st.none(),
                                    st.integers(min_value=0, max_value=5)),
                          st.integers(min_value=-99, max_value=99)),
                min_size=0, max_size=12),
       st.lists(st.tuples(st.one_of(st.none(),
                                    st.integers(min_value=0, max_value=5)),
                          st.integers(min_value=-99, max_value=99)),
                min_size=0, max_size=12))
def test_shuffle_join_outer_matches_duckdb(ray_session, lrows, rrows):
    """FULL OUTER join semantics pinned against DuckDB directly — null
    keys on EITHER side must surface as unmatched rows, never match each
    other, and int payloads must survive exactly."""
    import duckdb
    import ray.data as rd

    from caligraph_ray.stages.relational import shuffle_join
    l = pd.DataFrame({'k': pd.array([x[0] for x in lrows], dtype='Int64'),
                      'a': np.array([x[1] for x in lrows], dtype='int64')})
    r = pd.DataFrame({'k2': pd.array([x[0] for x in rrows], dtype='Int64'),
                      'b': np.array([x[1] for x in rrows], dtype='int64')})
    if not len(l) or not len(r):
        return   # Dataset creation needs ≥1 row; empty-side is join-trivial
    got = shuffle_join(rd.from_pandas(l).repartition(2),
                       rd.from_pandas(r).repartition(2),
                       left_on='k', right_on='k2', how='outer').to_pandas()
    want = duckdb.sql(
        'SELECT * FROM l FULL JOIN r ON l.k = r.k2').fetchdf()

    def canon(df):
        rows = []
        for _, row in df.iterrows():
            rows.append(tuple(None if pd.isna(v) else int(v)
                              for v in (row['k'], row['a'],
                                        row['k2'], row['b'])))
        return sorted(rows, key=lambda t: tuple(
            (v is None, v if v is not None else 0) for v in t))
    assert canon(got) == canon(want)
