"""Temporal operators: as-of join, range join, sessionization, rolling
windows (stages/temporal.py) and the IVF ANN variant (similarity.ivf_topk).

The SQL-oracle gate covers these end-to-end on the driver tables
(asof_latest_order, event_pairs_window, user_sessions, rolling_user_value,
ivf_topk); here the semantics are pinned on small crafted inputs where the
expected output is hand-checkable."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from caligraph_ray.stages.relational import collect_pandas
from caligraph_ray.stages.temporal import (asof_join, range_join, rolling_window,
                                           sessionize)

US = 1_000_000


def _events(rows):
    df = pd.DataFrame(rows, columns=['event_id', 'ts', 'user_id', 'value'])
    df['ts'] = pd.to_datetime(df['ts'], unit='s').astype('datetime64[us]')
    return rd.from_pandas(df)


def test_asof_join_backward_exact_and_miss():
    left = _events([(1, 100, 7, 0.0), (2, 200, 7, 0.0), (3, 50, 8, 0.0)])
    right = pd.DataFrame({'okey': [10, 11, 12],
                          'cust': [7, 7, 9],
                          'odate': pd.to_datetime([100, 150, 40], unit='s')
                          .astype('datetime64[us]')})
    out = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=True))
    got = {int(r.event_id): int(r.okey) for r in out.itertuples()}
    # event 1 at t=100 matches order 10 (exact match allowed);
    # event 2 at t=200 matches the later order 11 (t=150);
    # event 3 (user 8) has no order → dropped by inner
    assert got == {1: 10, 2: 11}


def test_asof_join_left_keeps_misses():
    left = _events([(1, 100, 7, 0.0), (3, 50, 8, 0.0)])
    right = pd.DataFrame({'okey': [10], 'cust': [7],
                          'odate': pd.to_datetime([90], unit='s')
                          .astype('datetime64[us]')})
    out = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=False))
    assert len(out) == 2
    by_ev = {int(r['event_id']): r['okey'] for _, r in out.iterrows()}
    assert int(by_ev[1]) == 10
    assert pd.isna(by_ev[3])


def test_range_join_window_boundaries():
    # pairs with 1us <= delta < 100s
    left = _events([(1, 1000, 7, 0.0), (2, 1099, 7, 0.0), (3, 1100, 7, 0.0)])
    right = _events([(9, 1000, 7, 0.0)])
    out = collect_pandas(range_join(
        left, right.map_batches(
            lambda b: b.rename(columns={'event_id': 'prior'}),
            batch_format='pandas'),
        'user_id', 'user_id', 'ts', 'ts',
        right_cols=['prior'], low_us=1, high_us=100 * US))
    # event 1: delta 0 → excluded (strictly after); event 2: 99s → in;
    # event 3: 100s → excluded (half-open)
    assert sorted(out['event_id'].astype(int)) == [2]


def test_sessionize_gap_splits():
    # user 7: events at 0s, 10s, 100s with gap threshold 60s → 2 sessions
    ev = _events([(1, 0, 7, 0.0), (2, 10, 7, 0.0), (3, 100, 7, 0.0),
                  (4, 5, 8, 0.0)])
    out = collect_pandas(sessionize(ev, gap_us=60 * US)) \
        .sort_values(['user_id', 'session_idx']).reset_index(drop=True)
    u7 = out[out['user_id'] == 7]
    assert list(u7['n_events'].astype(int)) == [2, 1]
    assert list(u7['session_idx'].astype(int)) == [1, 2]
    assert len(out[out['user_id'] == 8]) == 1


def test_rolling_window_frame():
    ev = _events([(i, i, 7, float(i)) for i in range(1, 7)])
    out = collect_pandas(rolling_window(ev, window_rows=3, cents=True)) \
        .sort_values('event_id').reset_index(drop=True)
    # floor(value*100): 100, 200, ... → rolling 3-row sums
    assert list(out['roll_sum'].astype(int)) == [100, 300, 600, 900, 1200, 1500]
    assert list(out['roll_n'].astype(int)) == [1, 2, 3, 3, 3, 3]


def test_ivf_full_probe_equals_brute_force():
    from caligraph_ray.stages.similarity import brute_force_topk, ivf_topk
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(80, 16))
    emb = rd.from_pandas(pd.DataFrame({
        'vec_id': np.arange(80, dtype=np.int64),
        'embedding': [list(map(float, v)) for v in mat]}))
    q = mat[:2]
    # probing EVERY centroid makes IVF exhaustive → identical to brute force
    ivf = ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8, round_decimals=6)
    bf = brute_force_topk(emb, q, k=5, round_decimals=6)
    pd.testing.assert_frame_equal(ivf.reset_index(drop=True),
                                  bf.reset_index(drop=True))


def test_ivf_partial_probe_recall():
    from caligraph_ray.stages.similarity import brute_force_topk, ivf_topk
    rng = np.random.default_rng(6)
    mat = rng.normal(size=(200, 16))
    emb = rd.from_pandas(pd.DataFrame({
        'vec_id': np.arange(200, dtype=np.int64),
        'embedding': [list(map(float, v)) for v in mat]}))
    q = mat[:3]
    ivf = ivf_topk(emb, q, k=5, n_centroids=16, nprobe=6)
    bf = brute_force_topk(emb, q, k=5)
    hits = 0
    for qi in range(3):
        got = set(ivf[ivf['query_idx'] == qi]['vec_id'])
        want = set(bf[bf['query_idx'] == qi]['vec_id'])
        hits += len(got & want)
    # each query's own vector (cosine 1.0) always lands in a probed list,
    # and random gaussians at nprobe=6/16 keep most of the top-5
    assert hits >= 8


def test_grouped_quantiles_exact_semantics():
    from caligraph_ray.stages.relational import grouped_quantiles_exact
    # group 'a': values 1..10 → p50 = 5 (ceil(0.5*10)=5th), p90 = 9, p99 = 10
    df = pd.DataFrame({'g': ['a'] * 10 + ['b'] * 3,
                       'v': list(range(1, 11)) + [7, 7, 9]})
    ds = rd.from_pandas(df)
    out = collect_pandas(grouped_quantiles_exact(ds, ['g'], 'v')) \
        .sort_values('g').reset_index(drop=True)
    a = out[out['g'] == 'a'].iloc[0]
    assert (int(a['q50']), int(a['q90']), int(a['q99'])) == (5, 9, 10)
    b = out[out['g'] == 'b'].iloc[0]
    # group 'b': sorted [7,7,9]; ceil(.5*3)=2 → 7; ceil(.9*3)=3 → 9
    assert (int(b['q50']), int(b['q90']), int(b['q99'])) == (7, 9, 9)


def test_hash_split_deterministic_and_total():
    from caligraph_ray.functions.hashing import md5_hash64
    # pure function of the id: same id → same split on any engine/run
    s1 = [md5_hash64(str(i)) % 10 for i in range(100)]
    s2 = [md5_hash64(str(i)) % 10 for i in range(100)]
    assert s1 == s2
    assert set(s1) <= set(range(10))


def test_unigram_logprob_scores_exact():
    from caligraph_ray.functions.hashing import log2_fixed
    from caligraph_ray.stages.textstats import unigram_logprob_scores
    docs = rd.from_pandas(pd.DataFrame({
        'doc_id': [1, 2], 'text': ['a a b', 'b c']}))
    out = collect_pandas(unigram_logprob_scores(docs)) \
        .sort_values('doc_id').reset_index(drop=True)
    # corpus: a:2 b:2 c:1, N=5
    lp = {t: log2_fixed(f) - log2_fixed(5)
          for t, f in {'a': 2, 'b': 2, 'c': 1}.items()}
    assert int(out.loc[0, 'logprob_q']) == 2 * lp['a'] + lp['b']
    assert int(out.loc[1, 'logprob_q']) == lp['b'] + lp['c']
    assert list(out['n_tokens'].astype(int)) == [3, 2]


def test_log2_fixed_matches_duckdb_kernel():
    """The shared fixed-point log2 kernel must be bit-identical between
    Python (functions/hashing.log2_fixed) and the recursive-CTE DuckDB twin
    embedded in SQL_UNIGRAM_LP — this is the engine-independence contract
    the unigram-LM driver gate rides on."""
    import math

    import duckdb

    from caligraph_ray.functions.hashing import log2_fixed
    vals = sorted({1, 2, 3, 5, 7, 100, 12345, 99999999, 2**31 - 1,
                   2**40 + 12345, *range(1, 200)})
    sql = """
WITH RECURSIVE vals(v) AS (SELECT * FROM (VALUES {vv}) t(v)),
lgrec(v, iter, y, frac) AS (
    SELECT v, 0,
           (CAST(v AS HUGEINT) * (1::BIGINT << 40))
               // (1::BIGINT << (length(bin(v)) - 1)),
           CAST(0 AS HUGEINT)
    FROM vals
    UNION ALL
    SELECT v, iter + 1,
           CASE WHEN (y*y) // (1::BIGINT << 40)
                     >= CAST(2 AS HUGEINT) * (1::BIGINT << 40)
                THEN ((y*y) // (1::BIGINT << 40)) // 2
                ELSE (y*y) // (1::BIGINT << 40) END,
           CASE WHEN (y*y) // (1::BIGINT << 40)
                     >= CAST(2 AS HUGEINT) * (1::BIGINT << 40)
                THEN frac*2 + 1 ELSE frac*2 END
    FROM lgrec WHERE iter < 20
)
SELECT v, CAST(CAST(length(bin(v)) - 1 AS HUGEINT) * (1::BIGINT << 20) + frac
               AS BIGINT) AS l2
FROM lgrec WHERE iter = 20 ORDER BY v
""".format(vv=', '.join(f'({v})' for v in vals))
    con = duckdb.connect()
    rows = con.sql(sql).fetchall()
    assert len(rows) == len(vals)
    for v, l2 in rows:
        py = log2_fixed(int(v))
        assert py == int(l2), (v, py, int(l2))
        # and it is an accurate log2: within 2 fixed-point ulps
        assert abs(py - math.log2(v) * (1 << 20)) < 2


def test_split_contamination_detects_copies():
    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.stages.textstats import split_contamination
    # find a test-split id (md5 % 10 == 0) and a train-split id
    test_id = next(i for i in range(1000) if md5_hash64(str(i)) % 10 == 0)
    train_id = next(i for i in range(1000) if md5_hash64(str(i)) % 10 != 0)
    clean_id = next(i for i in range(1000)
                    if md5_hash64(str(i)) % 10 == 0 and i != test_id)
    shared = 'one two three four five six'          # 2 distinct 5-grams
    docs = rd.from_pandas(pd.DataFrame({
        'doc_id': [test_id, train_id, clean_id],
        'text': [shared, shared + ' seven', 'totally different words here now']}))
    out = collect_pandas(split_contamination(docs))
    assert list(out['doc_id'].astype(int)) == [test_id]
    assert int(out['shared_shingles'].iloc[0]) == 2


def test_hll_registers_match_direct_sketch():
    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.functions.sketches import HyperLogLog, hll_registers
    vals = [f'user_{i}' for i in range(500)]
    ds = rd.from_pandas(pd.DataFrame({'u': vals}))
    regs = hll_registers(ds, 'u', p=12, hash_fn=md5_hash64)
    # single-process reference sketch
    ref = HyperLogLog(12)
    ref.add(vals, hash_fn=md5_hash64)
    nz = np.nonzero(ref.registers)[0]
    assert list(regs['bucket']) == list(nz)
    assert list(regs['rank']) == list(ref.registers[nz])
    # register state is the sketch: estimate within the usual HLL error
    est = ref.cardinality()
    assert abs(est - 500) / 500 < 0.1


def test_minhash_no_duplicates_returns_empty_not_crash():
    # all-distinct corpus → zero pairs; the empty result must flow through
    # the exchange (schema-less empty blocks) without crashing
    from caligraph_ray.stages import dedup as dd
    docs = rd.from_pandas(pd.DataFrame({
        'doc_id': np.arange(6, dtype=np.int64),
        'text': [f'completely unique text number {i} with words {i*7} {i*13}'
                 for i in range(6)]}))
    pairs = dd.minhash_candidate_pairs(docs)
    out = collect_pandas(pairs)
    assert len(out) == 0


def test_asof_join_preserves_big_ids():
    # ids above 2^53 must survive the exchange exactly (no float64 round
    # trip through None-padded columns)
    big = (1 << 60) + 12345
    left = _events([(big, 100, 7, 0.0)])
    right = pd.DataFrame({'okey': [big + 1], 'cust': [7],
                          'odate': pd.to_datetime([90], unit='s')
                          .astype('datetime64[us]')})
    out = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=True))
    assert int(out['event_id'].iloc[0]) == big
    assert int(out['okey'].iloc[0]) == big + 1


def test_asof_inner_keeps_matched_null_payload():
    # matched right row with NULL payload survives an inner asof join
    left = _events([(1, 100, 7, 0.0)])
    right = pd.DataFrame({'okey': [None], 'cust': [7],
                          'odate': pd.to_datetime([90], unit='s')
                          .astype('datetime64[us]')})
    out = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=True))
    assert len(out) == 1
    assert pd.isna(out['okey'].iloc[0])


def test_rolling_window_float_mode():
    ev = _events([(i, i, 7, 0.5) for i in range(1, 4)])
    out = collect_pandas(rolling_window(ev, window_rows=2, cents=False)) \
        .sort_values('event_id').reset_index(drop=True)
    assert list(out['roll_sum']) == [0.5, 1.0, 1.0]


def test_columns_list_with_inner_divs():
    from caligraph_ray.stages.html_extract import parse_page
    cols = ''.join(f'<div class="div-col"><ul><li>item {i}a</li>'
                   f'<li>item {i}b</li></ul></div>' for i in range(3))
    html = ('<html><head><title>Cols</title></head><body><h1>Cols</h1>'
            f'<h2>Content</h2><div class="columns-list">{cols}</div>'
            '</body></html>').encode()
    page = parse_page('https://ex.org/wiki/Cols', html)
    assert page is not None
    enums = [l for l in page.listings if l.ltype == 'enum']
    assert len(enums) == 1 and len(enums[0].items) == 6


def test_asof_right_payload_exact_above_2_53():
    # the merge carries only an int64 row position; right payloads above
    # 2^53 must survive the NaN-fill float demotion path exactly, for both
    # matched-with-misses inner joins and left joins
    big = (1 << 53) + 1
    left = _events([(1, 100, 7, 0.0), (2, 50, 8, 0.0)])   # user 8: no match
    right = pd.DataFrame({'okey': [big], 'cust': [7],
                          'odate': pd.to_datetime([90], unit='s')
                          .astype('datetime64[us]')})
    inner = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=True))
    assert len(inner) == 1 and int(inner['okey'].iloc[0]) == big
    outer = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=False)).sort_values('event_id')
    assert len(outer) == 2
    assert int(outer['okey'].iloc[0]) == big
    assert pd.isna(outer['okey'].iloc[1])


def test_asof_overlapping_payload_name_rejected():
    import pytest
    left = _events([(1, 100, 7, 0.0)])
    right = pd.DataFrame({'value': [1.0], 'cust': [7],
                          'odate': pd.to_datetime([90], unit='s')
                          .astype('datetime64[us]')})
    with pytest.raises(ValueError, match='rename'):
        asof_join(left, rd.from_pandas(right), 'user_id', 'cust', 'ts',
                  'odate', right_cols=['value'])


def test_ts_to_int_tz_aware_and_nat():
    from caligraph_ray.stages.temporal import _ts_to_int
    tz = pd.Series(pd.to_datetime(['2020-01-01 00:00:00', None])) \
        .dt.tz_localize('UTC').dt.tz_convert('US/Eastern')
    out = _ts_to_int(tz)
    # tz-aware converts via UTC (pandas 2.x raises on a direct astype);
    # NaT becomes <NA>, never the iNaT sentinel (-2^63)
    assert int(out.iloc[0]) == 1577836800000000
    assert out.iloc[1] is pd.NA


def test_asof_join_null_key_and_null_ts_unmatchable():
    # SQL: NULL keys / timestamps match nothing; left join keeps them
    left_df = pd.DataFrame({
        'event_id': [1, 2, 3],
        'ts': pd.to_datetime([100, 100, None], unit='s')
        .astype('datetime64[us]'),
        'user_id': ['a', None, 'a']})
    right = pd.DataFrame({'okey': [10], 'cust': ['a'],
                          'odate': pd.to_datetime([90], unit='s')
                          .astype('datetime64[us]')})
    inner = collect_pandas(asof_join(
        rd.from_pandas(left_df), rd.from_pandas(right), 'user_id', 'cust',
        'ts', 'odate', right_cols=['okey'], inner=True))
    assert sorted(inner['event_id'].astype(int)) == [1]
    outer = collect_pandas(asof_join(
        rd.from_pandas(left_df), rd.from_pandas(right), 'user_id', 'cust',
        'ts', 'odate', right_cols=['okey'], inner=False)) \
        .sort_values('event_id').reset_index(drop=True)
    assert len(outer) == 3
    assert int(outer['okey'].iloc[0]) == 10
    assert pd.isna(outer['okey'].iloc[1]) and pd.isna(outer['okey'].iloc[2])


def test_range_join_null_keys_never_pair():
    left_df = pd.DataFrame({
        'event_id': [1, 2],
        'ts': pd.to_datetime([1010, 1010], unit='s').astype('datetime64[us]'),
        'user_id': [None, 'u']})
    right_df = pd.DataFrame({
        'prior': [8, 9],
        'rts': pd.to_datetime([1000, 1000], unit='s').astype('datetime64[us]'),
        'ruser': [None, 'u']})
    out = collect_pandas(range_join(
        rd.from_pandas(left_df), rd.from_pandas(right_df),
        'user_id', 'ruser', 'ts', 'rts',
        right_cols=['prior'], low_us=1, high_us=100 * US))
    # only the non-null key pairs; NaN == NaN must NOT join
    assert len(out) == 1
    assert int(out['event_id'].iloc[0]) == 2 and int(out['prior'].iloc[0]) == 9


def test_sessionize_null_key_one_partition():
    # SQL PARTITION BY: all NULL keys form ONE partition, not one session
    # per row, and are not dropped
    df = pd.DataFrame({
        'event_id': [1, 2, 3, 4],
        'ts': pd.to_datetime([0, 10, 5, 200], unit='s')
        .astype('datetime64[us]'),
        'user_id': [None, None, 'u', None]})
    out = collect_pandas(sessionize(rd.from_pandas(df), gap_us=60 * US))
    nul = out[out['user_id'].isna()].sort_values('session_idx')
    assert list(nul['n_events'].astype(int)) == [2, 1]   # (0,10) then 200
    assert len(out[out['user_id'] == 'u']) == 1


def test_rolling_window_null_key_rows_kept():
    df = pd.DataFrame({
        'event_id': [1, 2, 3],
        'ts': pd.to_datetime([0, 10, 20], unit='s').astype('datetime64[us]'),
        'user_id': [None, None, 'u'],
        'value': [1.0, 2.0, 3.0]})
    out = collect_pandas(rolling_window(
        rd.from_pandas(df), window_rows=2, cents=True)) \
        .sort_values('event_id').reset_index(drop=True)
    # NULL-key rows window over the NULL partition (not NaN-dropped)
    assert list(out['roll_sum'].astype(int)) == [100, 300, 300]
    assert list(out['roll_n'].astype(int)) == [1, 2, 1]


def test_rolling_window_null_value_skipped_not_poisoned():
    # a NULL value must occupy its frame slot but contribute nothing to
    # sum/count (SQL SUM(value)/COUNT(value) OVER) — NOT become INT64_MIN
    # via an undefined NaN→int64 cast and poison every window it touches
    df = pd.DataFrame({
        'event_id': [1, 2, 3, 4],
        'ts': pd.to_datetime([0, 10, 20, 30], unit='s')
        .astype('datetime64[us]'),
        'user_id': ['u', 'u', 'u', 'u'],
        'value': [1.0, None, 3.0, None]})
    out = collect_pandas(rolling_window(
        rd.from_pandas(df), window_rows=2, cents=True)) \
        .sort_values('event_id').reset_index(drop=True)
    assert list(out['roll_sum'].astype('Int64')) == [100, 100, 300, 300]
    assert list(out['roll_n'].astype(int)) == [1, 1, 1, 1]


def test_rolling_window_all_null_window_is_null_sum():
    df = pd.DataFrame({
        'event_id': [1, 2],
        'ts': pd.to_datetime([0, 10], unit='s').astype('datetime64[us]'),
        'user_id': ['u', 'u'],
        'value': [None, None]})
    out = collect_pandas(rolling_window(
        rd.from_pandas(df), window_rows=2, cents=True)) \
        .sort_values('event_id').reset_index(drop=True)
    assert out['roll_sum'].isna().all()   # SQL SUM over empty set → NULL
    assert list(out['roll_n'].astype(int)) == [0, 0]


def test_asof_join_null_rows_dont_demote_big_int_keys():
    # the round-2 advice bug: a single NULL-key right row in the same
    # bucket used to demote the whole int64 _k column to float64 via
    # to_pandas, corrupting co-resident keys above 2^53 BEFORE the null
    # filter; the arrow-side filter in _split_sides must keep them exact
    big_a = (1 << 60) + 1
    big_b = (1 << 60) + 2   # float64 would collapse big_a and big_b
    left = _events([(1, 100, big_a, 0.0), (2, 100, big_b, 0.0)])
    right = pd.DataFrame({
        'okey': [10, 11, 12],
        'cust': pd.array([big_a, big_b, None], dtype='Int64'),
        'odate': pd.to_datetime([90, 95, 80], unit='s')
        .astype('datetime64[us]')})
    out = collect_pandas(asof_join(
        left, rd.from_pandas(right), 'user_id', 'cust', 'ts', 'odate',
        right_cols=['okey'], inner=True))
    got = {int(r.event_id): int(r.okey) for r in out.itertuples()}
    assert got == {1: 10, 2: 11}


def test_funnel_greedy_matches_subsequence_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.stages.temporal import funnel_counts
    rng = np.random.RandomState(6)
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randint(0, 12)):
            rows.append({'user_id': u, 'event_id': eid,
                         'ts': pd.Timestamp('2024-01-01')
                         + pd.Timedelta(microseconds=int(rng.randint(0, 10**9))),
                         'event_type': rng.choice(['A', 'B', 'C', 'D'])})
            eid += 1
    df = pd.DataFrame(rows)
    steps = ['A', 'B', 'C']
    got = funnel_counts(rd.from_pandas(df), steps).to_pandas()
    got_map = dict(zip(got['reached'].astype(int),
                       got['n_users'].astype(int)))
    # reference: exists-in-order subsequence check per user
    exp = {1: 0, 2: 0, 3: 0}
    for u, g in df.sort_values(['ts', 'event_id']).groupby('user_id'):
        want = 0
        for t in g['event_type']:
            if want < 3 and t == steps[want]:
                want += 1
        for k in range(1, want + 1):
            exp[k] += 1
    assert got_map == {k: v for k, v in exp.items() if v}


def test_retention_cohorts_small_golden(ray_session):
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.stages.temporal import retention_cohorts
    day = 86_400_000_000
    base = pd.Timestamp('2024-01-01')
    df = pd.DataFrame({
        'user_id': [1, 1, 1, 2, 2, 3],
        'ts': [base, base + pd.Timedelta(days=1), base + pd.Timedelta(days=1),
               base + pd.Timedelta(days=1), base + pd.Timedelta(days=2),
               base]})
    out = retention_cohorts(rd.from_pandas(df)).to_pandas()
    d0 = int(base.value // 1000) // day
    got = {(int(r['cohort_day']), int(r['day_offset'])): int(r['n_users'])
           for _, r in out.iterrows()}
    assert got == {(d0, 0): 2, (d0, 1): 1, (d0 + 1, 0): 1, (d0 + 1, 1): 1}


def test_session_funnel_resets_across_gap(ray_session):
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.stages.temporal import session_funnel_counts
    base = pd.Timestamp('2024-01-01')
    rows = [
        # user 1: A then B in one session -> reaches 2
        {'user_id': 1, 'event_id': 1, 'ts': base, 'event_type': 'A'},
        {'user_id': 1, 'event_id': 2, 'ts': base + pd.Timedelta(minutes=5),
         'event_type': 'B'},
        # user 2: A, then a 2-hour gap, then B -> funnel resets, two
        # sessions each reaching only step 1... (B alone reaches 0)
        {'user_id': 2, 'event_id': 3, 'ts': base, 'event_type': 'A'},
        {'user_id': 2, 'event_id': 4, 'ts': base + pd.Timedelta(hours=2),
         'event_type': 'B'},
    ]
    out = session_funnel_counts(rd.from_pandas(pd.DataFrame(rows)),
                                ['A', 'B']).to_pandas()
    got = dict(zip(out['reached'].astype(int),
                   out['n_sessions'].astype(int)))
    # sessions reaching >=1: u1-s1 (A,B) and u2-s1 (A). u2-s2 (B) never
    # starts. reaching >=2: u1-s1 only.
    assert got == {1: 2, 2: 1}
