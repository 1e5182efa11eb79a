"""Property-based equivalence for the round-5 batch-2 operators vs
single-process references, biased toward the inputs that bite: tiny key
alphabets (collisions), NULL keys, hot keys, degenerate weights.
Example counts stay small (Ray execution per example)."""

import hashlib

import numpy as np
import pandas as pd
import ray
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caligraph_ray.stages import relational as rel

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_KEYS = st.one_of(st.integers(min_value=0, max_value=4), st.none())


@st.composite
def two_key_lists(draw):
    na = draw(st.integers(min_value=0, max_value=15))
    nb = draw(st.integers(min_value=0, max_value=15))
    a = draw(st.lists(_KEYS, min_size=na, max_size=na))
    b = draw(st.lists(_KEYS, min_size=nb, max_size=nb))
    return a, b


@SETTINGS
@given(two_key_lists())
def test_distinct_except_matches_set_difference(ray_session, lists):
    a, b = lists
    a_ds = ray.data.from_pandas(pd.DataFrame(
        {'k': pd.array(a, dtype='Int64')}))
    b_ds = ray.data.from_pandas(pd.DataFrame(
        {'j': pd.array(b, dtype='Int64')}))
    out = rel.collect_pandas(rel.distinct_except(a_ds, b_ds, 'k', 'j'))
    got = {None if pd.isna(v) else int(v) for v in out['key']} \
        if len(out) else set()
    want = {x for x in a} - {x for x in b}
    assert got == want


@st.composite
def weighted_rows(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    ids = list(range(n))
    ws = draw(st.lists(
        st.one_of(st.integers(min_value=-2, max_value=50), st.none()),
        min_size=n, max_size=n))
    k = draw(st.integers(min_value=1, max_value=6))
    return ids, ws, k


def _race_reference(ids, ws, k):
    rows = []
    for i, w in zip(ids, ws):
        if w is None or not w > 0:
            continue
        u = int.from_bytes(
            hashlib.md5(f'wrs:42:{i}'.encode()).digest()[:8], 'little')
        rows.append((np.float64(u) / np.float64(w), i))
    rows.sort()
    return [i for _, i in rows[:k]]


@SETTINGS
@given(weighted_rows())
def test_weighted_race_matches_reference(ray_session, rows):
    ids, ws, k = rows
    ds = ray.data.from_pandas(pd.DataFrame(
        {'doc_id': np.array(ids, dtype='int64'),
         'w': pd.array(ws, dtype='Int64').astype('Float64')}))
    out = rel.collect_pandas(rel.weighted_race_topk(ds, 'doc_id', 'w', k))
    got = out['doc_id'].astype(int).tolist() if len(out) else []
    assert got == _race_reference(ids, ws, k)


@st.composite
def band_values(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    vs = draw(st.lists(
        st.one_of(st.floats(min_value=-5, max_value=25,
                            allow_nan=False), st.none()),
        min_size=n, max_size=n))
    return vs


_EDGES = [0.0, 2.0, 7.0, 20.0]
_LABELS = ['a', 'b', 'c']


@SETTINGS
@given(band_values())
def test_band_lookup_matches_pandas_cut(ray_session, vs):
    ds = ray.data.from_pandas(pd.DataFrame(
        {'v': pd.array(vs, dtype='Float64')}))
    out = rel.collect_pandas(rel.band_lookup_count(
        ds, 'v', _EDGES, _LABELS))
    got = dict(zip(out['band'], out['n'].astype(int))) if len(out) else {}
    ref = {}
    for v in vs:
        if v is None or not (_EDGES[0] <= v < _EDGES[-1]):
            continue
        lab = _LABELS[int(np.searchsorted(_EDGES, v, side='right')) - 1]
        ref[lab] = ref.get(lab, 0) + 1
    assert got == ref


@st.composite
def skewed_join(draw):
    n = draw(st.integers(min_value=0, max_value=20))
    # 0 is the hot key (drawn 3x as often)
    lk = draw(st.lists(st.sampled_from([0, 0, 0, 1, 2, 3, None]),
                       min_size=n, max_size=n))
    m = draw(st.integers(min_value=0, max_value=5))
    rk = draw(st.lists(st.sampled_from([0, 1, 2, None]),
                       min_size=m, max_size=m))
    return lk, rk


@SETTINGS
@given(skewed_join())
def test_salted_join_property_equals_shuffle(ray_session, inputs):
    lk, rk = inputs
    left = ray.data.from_pandas(pd.DataFrame(
        {'k': pd.array(lk, dtype='Int64'),
         'v': np.arange(len(lk), dtype='int64')}))
    right = ray.data.from_pandas(pd.DataFrame(
        {'rk': pd.array(rk, dtype='Int64'),
         'p': np.arange(len(rk), dtype='int64')}))
    a = rel.collect_pandas(rel.salted_join(left, right, 'k', 'rk',
                                           salts=3))
    b = rel.collect_pandas(rel.shuffle_join(left, right, 'k', 'rk'))

    def canon(df):
        if not len(df):
            return []
        return sorted(tuple(None if pd.isna(x) else int(x)
                            for x in (r['k'], r['v'], r['rk'], r['p']))
                      for _, r in df.iterrows())
    assert canon(a) == canon(b)
