"""packed_sequences (distributed prefix-sum concat-and-split packing) and
host_quality_docs (host-level quality filter) — single-process oracles plus
forced-scale-path equivalence (the SMALL_EXCHANGE_BYTES=0 technique)."""

import numpy as np
import pandas as pd
import pytest

from caligraph_ray.stages import textstats as ts
from caligraph_ray.stages.relational import collect_pandas


def _docs_ds(rows):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(rows))


def _expected_pack(rows, capacity):
    out = []
    run = 0
    for r in sorted(rows, key=lambda r: r['doc_id']):
        n = len([t for t in r['text'].split(' ') if t])
        if not n:
            continue
        out.append({'doc_id': r['doc_id'], 'n_tokens': n, 'tok_offset': run,
                    'first_seq': run // capacity,
                    'last_seq': (run + n - 1) // capacity})
        run += n
    return pd.DataFrame(out)


@pytest.mark.parametrize('coarse', [1, 3, 16])
def test_packed_sequences_matches_serial_scan(ray_session, coarse):
    rng = np.random.RandomState(7)
    rows = [{'doc_id': int(i * 3 + 1),   # sparse, non-contiguous ids
             'text': ' '.join(f't{j}' for j in range(rng.randint(0, 9)))}
            for i in range(60)]
    got = collect_pandas(
        ts.packed_sequences(_docs_ds(rows), capacity=7, coarse=coarse))
    got = got.sort_values('doc_id').reset_index(drop=True).astype('int64')
    exp = _expected_pack(rows, 7).astype('int64')
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_packed_sequences_empty_and_all_blank(ray_session):
    rows = [{'doc_id': 1, 'text': ''}, {'doc_id': 2, 'text': '   '}]
    got = collect_pandas(ts.packed_sequences(_docs_ds(rows), capacity=4))
    assert len(got) == 0


def test_host_quality_broadcast_equals_join_regime(ray_session):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(120):
        host = f'h{i % 6}'
        # hosts h0/h1 emit repetitive text (low diversity), others diverse
        if i % 6 < 2:
            text = 'spam spam spam spam ham'
        else:
            text = ' '.join(f'w{rng.randint(0, 500)}' for _ in range(12))
        rows.append({'doc_id': i, 'source': host, 'text': text})
    bcast = collect_pandas(ts.host_quality_docs(_docs_ds(rows)))
    joined = collect_pandas(
        ts.host_quality_docs(_docs_ds(rows), host_broadcast_limit=0))
    key = ['doc_id', 'source']
    a = bcast[key].sort_values('doc_id').reset_index(drop=True)
    b = joined[key].sort_values('doc_id').reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # the repetitive hosts were actually dropped
    assert not set(a['source']) & {'h0', 'h1'}
    assert set(a['source']) == {'h2', 'h3', 'h4', 'h5'}


def test_bigram_backoff_broadcast_equals_join_regime(ray_session):
    rng = np.random.RandomState(3)
    vocab = [f'w{i}' for i in range(30)]
    rows = [{'doc_id': i,
             'text': ' '.join(rng.choice(vocab)
                              for _ in range(rng.randint(0, 20)))}
            for i in range(80)]
    ds = _docs_ds(rows)
    bcast = collect_pandas(ts.bigram_backoff_scores(ds))
    joined = collect_pandas(
        ts.bigram_backoff_scores(_docs_ds(rows), dim_broadcast_limit=0))
    cols = ['doc_id', 'logprob_q', 'n_pairs']
    a = bcast[cols].sort_values('doc_id').reset_index(drop=True).astype('int64')
    b = joined[cols].sort_values('doc_id').reset_index(drop=True).astype('int64')
    pd.testing.assert_frame_equal(a, b)
    # both branches exercised: some pairs frequent (score uses bigram),
    # some unseen-in-dim pairs (backoff)
    assert len(a) and (a['logprob_q'] < 0).all()


def test_edit_distance_pairs_match_brute_force(ray_session):
    import itertools
    import ray.data as rd
    from caligraph_ray.stages.dedup import _ed_le1, edit_distance_pairs
    rng = np.random.RandomState(5)
    alphabet = 'abc'
    words = {''.join(rng.choice(list(alphabet), size=rng.randint(4, 7)))
             for _ in range(60)}
    docs = pd.DataFrame({'doc_id': range(len(words)),
                         'text': sorted(words)})
    got = collect_pandas(
        edit_distance_pairs(rd.from_pandas(docs), text_col='text'))
    got_set = (set() if got.empty else
               set(map(tuple, got[['a', 'b']].to_numpy())))
    exp = {(a, b) for a, b in itertools.combinations(sorted(words), 2)
           if _ed_le1(a, b)}
    assert got_set == exp and exp   # non-vacuous: dense 3-letter space


def test_ed_le1_scalar_against_dp():
    from caligraph_ray.stages.dedup import _ed_le1

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, y in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (x != y))
        return dp[-1]

    import itertools
    words = [''.join(p) for n in range(0, 4)
             for p in itertools.product('ab', repeat=n)]
    for a in words:
        for b in words:
            assert _ed_le1(a, b) == (ed(a, b) <= 1), (a, b)


def test_training_data_prep_invariants(ray_session):
    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.pipelines.queries import q_training_data_prep
    out = q_training_data_prep('/root/testdata/sf0.001')
    assert len(out)
    ids = out['doc_id'].tolist()
    # no held-out-split doc trains
    assert all(md5_hash64(str(i)) % 10 != 0 for i in ids)
    # packing is a gapless concat: offsets are the exclusive prefix sum
    run = 0
    for _, r in out.sort_values('doc_id').iterrows():
        assert r['tok_offset'] == run
        assert r['first_seq'] == run // 512
        run += r['n_tokens']


def test_cooccurrence_pmi_matches_brute_force(ray_session):
    from caligraph_ray.functions.hashing import log2_fixed
    from caligraph_ray.stages.textstats import cooccurrence_pmi
    import ray.data as rd
    rng = np.random.RandomState(8)
    vocab = [f'w{i}' for i in range(8)]
    rows = [{'doc_id': i,
             'text': ' '.join(rng.choice(vocab)
                              for _ in range(rng.randint(0, 15)))}
            for i in range(40)]
    got = collect_pandas(cooccurrence_pmi(
        rd.from_pandas(pd.DataFrame(rows)), window=3, min_pairs=2))
    got_map = {(r['w1'], r['w2']): (int(r['c_ab']), int(r['pmi_q']))
               for _, r in got.iterrows()}
    # brute force
    from collections import Counter
    pc_, marg = Counter(), Counter()
    for r in rows:
        toks = [t for t in r['text'].split(' ') if t]
        for i in range(len(toks) - 1):
            for j in range(i + 1, min(i + 4, len(toks))):
                a, b = sorted((toks[i], toks[j]))
                pc_[(a, b)] += 1
    for (a, b), c in pc_.items():
        marg[a] += c
        marg[b] += c
    total = sum(pc_.values())
    exp = {}
    for (a, b), c in pc_.items():
        if c >= 2:
            exp[(a, b)] = (c, log2_fixed(c) + log2_fixed(total)
                           - log2_fixed(marg[a]) - log2_fixed(marg[b]))
    assert got_map == exp and exp
