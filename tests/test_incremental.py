"""Incremental token-count state: delta merges ≡ full recompute,
exactly-once per partition, crash-safe LATEST pointer."""

import os

import pandas as pd
import pytest

from caligraph_ray.state.incremental import (processed_partitions,
                                             token_count_state,
                                             update_token_counts)


def _docs(rows):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(rows))


def _state_df(root):
    df = token_count_state(root).to_pandas()
    return (df.sort_values('token').reset_index(drop=True)
            .astype({'freq': 'int64'}))


def test_incremental_equals_full_recompute(ray_session, tmp_path):
    from caligraph_ray.stages.textstats import token_counts
    root = str(tmp_path / 'state')
    p1 = [{'doc_id': 1, 'text': 'a b a'}, {'doc_id': 2, 'text': 'b c'}]
    p2 = [{'doc_id': 3, 'text': 'c c d'}]
    r1 = update_token_counts(root, 'part-001', _docs(p1))
    assert not r1['skipped']
    r2 = update_token_counts(root, 'part-002', _docs(p2))
    assert not r2['skipped'] and r2['generation'] != r1['generation']

    full = token_counts(_docs(p1 + p2)).to_pandas() \
        .sort_values('token').reset_index(drop=True).astype({'freq': 'int64'})
    pd.testing.assert_frame_equal(_state_df(root), full)


def test_incremental_exactly_once_and_pointer(ray_session, tmp_path):
    root = str(tmp_path / 'state')
    p1 = [{'doc_id': 1, 'text': 'x y'}]
    update_token_counts(root, 'p1', _docs(p1))
    before = _state_df(root)
    # re-submitting the same partition is a no-op (manifest hit)
    r = update_token_counts(root, 'p1', _docs(p1))
    assert r['skipped']
    pd.testing.assert_frame_equal(_state_df(root), before)
    assert processed_partitions(root) == ['p1']
    # a stale generation dir without a LATEST flip is invisible to readers
    os.makedirs(os.path.join(root, 'gen_zz_phantom'), exist_ok=True)
    pd.testing.assert_frame_equal(_state_df(root), before)


def test_incremental_crash_recovery_no_double_count(ray_session, tmp_path):
    """A crash mid-write leaves partial parquet in the NEXT generation dir
    (its deterministic name means the re-run lands in the same dir, and
    write_parquet appends rather than clears). The re-run must wipe the
    partials so the committed generation's counts are exact — and the
    pointer files must never be readable half-written (atomic replace)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    root = str(tmp_path / 'state')
    update_token_counts(root, 'p1', _docs([{'doc_id': 1, 'text': 'a a b'}]))
    want_after = None
    # simulate the crashed attempt: the next gen dir already holds a
    # partial file with inflated counts, MANIFEST/LATEST never flipped
    crash_dir = os.path.join(root, 'gen_000001_p2')
    os.makedirs(crash_dir, exist_ok=True)
    pq.write_table(pa.table({'token': ['a'], 'freq': [999]}),
                   os.path.join(crash_dir, 'partial-uuid.parquet'))
    update_token_counts(root, 'p2', _docs([{'doc_id': 2, 'text': 'b c'}]))
    got = _state_df(root)
    want_after = pd.DataFrame({'token': ['a', 'b', 'c'],
                               'freq': [2, 2, 1]}).astype({'freq': 'int64'})
    pd.testing.assert_frame_equal(got, want_after)
    # pointer files are plain (fully-written) values
    assert processed_partitions(root) == ['p1', 'p2']
    with open(os.path.join(root, 'LATEST')) as f:
        assert f.read().strip() == 'gen_000001_p2'


def test_bloom_incremental_delta_equals_full(ray_session, tmp_path):
    """VERDICT r4 #8: daily-append Bloom state — merging day0 then day1
    must equal one full-recompute Bloom over the union (bit-OR == set
    union of positions), re-submission is a no-op, and the generation/
    LATEST contract matches the token-count chain."""
    import pandas as pd
    import ray.data as rd

    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.functions.sketches import bloom_bits
    from caligraph_ray.state.incremental import (bloom_bits_state,
                                                 update_bloom_bits)

    day0 = pd.DataFrame({'doc_id': [1, 2, 3, 40, 50]})
    day1 = pd.DataFrame({'doc_id': [3, 60, 70]})
    root = str(tmp_path / 'bloom_state')

    r0 = update_bloom_bits(root, 'day0', rd.from_pandas(day0), 'doc_id',
                           m=512, k=3, hash_fn=md5_hash64)
    assert not r0['skipped']
    r1 = update_bloom_bits(root, 'day1', rd.from_pandas(day1), 'doc_id',
                           m=512, k=3, hash_fn=md5_hash64)
    assert not r1['skipped']

    state = bloom_bits_state(root)
    full = bloom_bits(rd.from_pandas(pd.concat([day0, day1])), 'doc_id',
                      m=512, k=3, hash_fn=md5_hash64)
    assert state['bit_pos'].tolist() == sorted(full['bit_pos'].tolist())

    # re-submission: exactly-once, state untouched
    r2 = update_bloom_bits(root, 'day0', rd.from_pandas(day0), 'doc_id',
                           m=512, k=3, hash_fn=md5_hash64)
    assert r2['skipped'] and r2['generation'] == r1['generation']
    assert bloom_bits_state(root)['bit_pos'].tolist() == \
        state['bit_pos'].tolist()


def test_bloom_crash_recovery_clean_generation(ray_session, tmp_path):
    """A crashed bloom update leaves a partial generation dir; the retry
    must wipe it and commit a clean state identical to a never-crashed
    run (same contract as the token-count chain's crash test)."""
    import os

    import pandas as pd
    import ray.data as rd

    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.state.incremental import (bloom_bits_state,
                                                 update_bloom_bits)

    root = str(tmp_path / 'bloom_crash')
    day0 = pd.DataFrame({'doc_id': [1, 2, 3]})
    update_bloom_bits(root, 'day0', rd.from_pandas(day0), 'doc_id',
                      m=256, k=3, hash_fn=md5_hash64)
    # simulate a crashed day1 attempt: its generation dir already exists
    # with garbage that a naive append-write would merge into the state
    crash_dir = os.path.join(root, 'gen_000001_day1')
    os.makedirs(crash_dir, exist_ok=True)
    with open(os.path.join(crash_dir, 'partial-uuid.parquet'), 'wb') as f:
        f.write(b'not parquet')
    day1 = pd.DataFrame({'doc_id': [9, 10]})
    r = update_bloom_bits(root, 'day1', rd.from_pandas(day1), 'doc_id',
                          m=256, k=3, hash_fn=md5_hash64)
    assert not r['skipped']
    # clean reference run in a fresh root
    ref_root = str(tmp_path / 'bloom_ref')
    update_bloom_bits(ref_root, 'day0', rd.from_pandas(day0), 'doc_id',
                      m=256, k=3, hash_fn=md5_hash64)
    update_bloom_bits(ref_root, 'day1', rd.from_pandas(day1), 'doc_id',
                      m=256, k=3, hash_fn=md5_hash64)
    assert bloom_bits_state(root)['bit_pos'].tolist() == \
        bloom_bits_state(ref_root)['bit_pos'].tolist()
    assert not os.path.exists(os.path.join(crash_dir,
                                           'partial-uuid.parquet'))
