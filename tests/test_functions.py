"""Goldens for scalar functions (mirrors reference tests/unit/util/test_nlp.py
intent: canonical-label cleanup, by-phrase removal, normalizers)."""

import numpy as np
import pyarrow as pa

from caligraph_ray.functions import strings as S
from caligraph_ray.functions import hashing as H


def test_canonical_label_goldens():
    # cases from reference nlp.py:89-101 comments
    assert S.get_canonical_label('Fellows of the Royal Society/name: A-C') == 'Fellows of the Royal Society'
    assert S.get_canonical_label('Interstate roads (1-10)') == 'Interstate roads'
    assert S.get_canonical_label('Interstate roads (Y)') == 'Interstate roads'
    assert S.get_canonical_label('Drugs: Sp-Sub') == 'Drugs'
    assert S.get_canonical_label('Football clubs in Sweden - Z') == 'Football clubs in Sweden'
    assert S.get_canonical_label('Fellows of the Royal Society/A') == 'Fellows of the Royal Society'
    assert S.get_canonical_label('Fellows of the Royal Society A, B, C') == 'Fellows of the Royal Society'
    # reference chain order quirk (nlp.py:96 fires before :99, consuming '- K'
    # and leaving ': !'): we reproduce the reference behavior exactly
    assert S.get_canonical_label('Fellows of the Royal Society: ! - K') == 'Fellows of the Royal Society: !'
    assert S.get_canonical_label('Recipients: Aa - Kz') == 'Recipients'


def test_by_phrase_removal():
    assert S.remove_by_phrase('People by country') == 'People'
    assert S.remove_by_phrase('Albums by artist') == 'Albums'
    assert S.remove_by_phrase('Bypass surgery') == 'Bypass surgery'  # no phrase


def test_string_normalizers():
    assert S.capitalize('united States') == 'United States'
    assert S.capitalize('a') == 'A'
    assert S.regularize_spaces('  a   b \t c ') == 'a b c'
    assert S.make_alphanumeric('St. Mary\'s!') == 'St Marys'
    assert S.make_alphanumeric('a!') == 'a!'  # short results keep original
    assert S.transfer_word_casing('McDonald', 'mcdonald') == 'McDonald'
    assert S.normalize_surface('The  United-States!') == 'the unitedstates'
    assert S.is_valid_entity_label('Paris')
    assert not S.is_valid_entity_label('42')
    assert not S.is_valid_entity_label('ab')


def test_vectorized_matches_scalar():
    vals = ['Drugs: Sp-Sub', 'People by country', 'Interstate roads (1-10)',
            'Fellows of the Royal Society/A', 'Plain label']
    arr = pa.array(vals)
    vec = S.canonical_label_array(arr).to_pylist()
    assert vec == [S.get_canonical_label(v) for v in vals]

    surf = ['The  United-States!', 'Ärger µ', 'simple']
    vec2 = S.normalize_surface_array(pa.array(surf)).to_pylist()
    assert vec2 == [S.normalize_surface(v) for v in surf]


def test_tokenize_roundtrip():
    text = 'John Smith (born 1950), Paris.'
    toks, ws = S.tokenize_with_ws(text)
    assert ''.join(t + w for t, w in zip(toks, ws)) == text
    assert S.tokenize(text) == toks


def test_minhash_jaccard_estimate():
    mh = H.MinHasher(num_perm=128, shingle_size=3, bands=32)
    a = ('the quick brown fox jumps over the lazy dog and runs far away ' * 4).split()
    b = list(a)
    b[5] = 'cat'  # small perturbation → high jaccard
    sa, sb = mh.signature(a), mh.signature(b)
    est = mh.estimate_jaccard(sa, sb)
    sha, shb = set(mh.shingles(a).tolist()), set(mh.shingles(b).tolist())
    true_j = len(sha & shb) / len(sha | shb)
    assert abs(est - true_j) < 0.2
    assert est > 0.5
    # identical docs → identical signatures and band hashes
    assert (mh.signature(a) == mh.signature(list(a))).all()


def test_simhash_properties():
    a = 'the quick brown fox jumps over the lazy dog'.split()
    b = 'the quick brown fox jumps over the lazy cat'.split()
    c = 'completely different words entirely here now'.split()
    ha, hb, hc = H.simhash64(a), H.simhash64(b), H.simhash64(c)
    assert H.hamming64(ha, ha) == 0
    assert H.hamming64(ha, hb) < H.hamming64(ha, hc)


def test_stable_hash_deterministic():
    assert H.stable_hash64('abc') == H.stable_hash64('abc')
    assert H.stable_hash64('abc') != H.stable_hash64('abd')
    assert H.stable_hash64('abc') >= 0
    arr = H.stable_hash64_array(['a', 'b', 'a'])
    assert arr[0] == arr[2] != arr[1]


def test_rolling_fingerprint():
    fp1 = H.rolling_fingerprint('hello world this is a longer text for fingerprinting')
    fp2 = H.rolling_fingerprint('hello world this is a longer text for fingerprinting')
    assert fp1 == fp2 and len(fp1) <= 8
    assert H.rolling_fingerprint('') == []


def test_singularize_and_plural_head():
    from caligraph_ray.functions import nlp as N
    # golden cases mirroring reference tests/unit/util/test_nlp.py intent
    assert N.has_plural_head('Countries by GDP per capita')
    assert N.has_plural_head('People from Paris')
    assert N.has_plural_head('Cities in France')
    assert not N.has_plural_head('Paris')
    assert not N.has_plural_head('History of France')  # singular head
    assert N.singularize('Countries') == 'Country'
    assert N.singularize('people') == 'person'
    assert N.singularize('Series') == 'Series'
    assert N.singularize('Churches') == 'Church'
    assert N.singularize('Wives') == 'Wife'
    assert N.singularize_phrase('Countries by GDP') == 'Country by GDP'
    assert N.singularize_phrase('Paris') == 'Paris'
    assert N.lexical_head('Fellows of the Royal Society/A') == 'Fellows'


def test_hyperloglog_accuracy_and_merge():
    from caligraph_ray.functions.sketches import HyperLogLog
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    h1.add(f'a{i}' for i in range(30_000))
    h2.add(f'a{i}' for i in range(20_000, 50_000))  # overlap 10k
    est = h1.merge(h2).cardinality()
    assert abs(est - 50_000) / 50_000 < 0.05
    # serialization round-trip preserves the estimate
    raw = h1.to_bytes()
    assert abs(HyperLogLog.from_bytes(raw).cardinality() - h1.cardinality()) < 1e-9
    # small-range linear counting
    h3 = HyperLogLog(12)
    h3.add(f'x{i}' for i in range(100))
    assert abs(h3.cardinality() - 100) < 10


def test_count_min_sketch_properties():
    from collections import Counter

    from caligraph_ray.functions.sketches import CountMinSketch
    vals = [f'v{i % 37}' for i in range(5000)] + ['hot'] * 400
    true = Counter(vals)
    s = CountMinSketch(depth=4, width=512)
    vc = Counter(vals)
    s.add_counts(vc.keys(), vc.values())
    # never underestimates; tight at this load factor
    for v, c in true.items():
        assert s.estimate(v) >= c
    assert s.estimate('hot') == 400   # md5 rows, width 512: no collision here
    # merge of split halves == sketch of the whole (elementwise-sum state)
    s1, s2 = CountMinSketch(4, 512), CountMinSketch(4, 512)
    c1, c2 = Counter(vals[:2000]), Counter(vals[2000:])
    s1.add_counts(c1.keys(), c1.values())
    s2.add_counts(c2.keys(), c2.values())
    assert (s1.merge(s2).table == s.table).all()
    # serialization round-trip
    assert (CountMinSketch.from_bytes(s.to_bytes(), 4, 512).table
            == s.table).all()


def test_cms_heavy_hitters_distributed(ray_session):
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.functions.sketches import cms_heavy_hitters
    df = pd.DataFrame({'k': ['a'] * 50 + ['b'] * 30 + ['c'] * 5 + ['d'] * 2})
    out = cms_heavy_hitters(rd.from_pandas(df).repartition(3), 'k',
                            threshold=20).to_pandas()
    got = dict(zip(out['k'], out['est_cnt']))
    assert set(got) == {'a', 'b'}
    assert got['a'] >= 50 and got['b'] >= 30


def test_singularize_movies_special_case():
    from caligraph_ray.functions.nlp import singularize
    # the inflection package's explicit (m)ovies$ → movie rule; consonant
    # +ies stays on the y-rule exactly like inflection (zombies → zomby)
    assert singularize('Movies') == 'Movie'
    assert singularize('movies') == 'movie'
    assert singularize('Cities') == 'City'
    assert singularize('countries') == 'country'


def test_bpe_train_classic_golden():
    """Sennrich et al.'s canonical example: vocab {low:5, lower:2,
    newest:6, widest:3} — first merges are (e s), (es t), (est </w>)."""
    from caligraph_ray.functions.bpe import bpe_encode, bpe_train_from_vocab
    vocab = {'low': 5, 'lower': 2, 'newest': 6, 'widest': 3}
    merges = bpe_train_from_vocab(vocab, 5)
    assert merges[0] == ('e s', 'es')
    assert merges[1] == ('es t', 'est')
    assert merges[2] == ('est </w>', 'est</w>')
    # encoding applies merges in rank order
    assert bpe_encode('newest', merges[:3]) == ['n', 'e', 'w', 'est</w>']
    # merge loop stops when no pairs remain
    assert bpe_train_from_vocab({'a': 1}, 5) == [('a </w>', 'a</w>')]


def test_bpe_merges_distributed(ray_session):
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.functions.bpe import bpe_merges, bpe_train_from_vocab
    docs = pd.DataFrame({'doc_id': [1, 2], 'text': [
        'low low low low low lower lower newest newest newest',
        'newest newest newest widest widest widest']})
    out = bpe_merges(rd.from_pandas(docs).repartition(2), n_merges=3)
    want = bpe_train_from_vocab({'low': 5, 'lower': 2, 'newest': 6,
                                 'widest': 3}, 3)
    assert list(zip(out['pair'], out['merged'])) == want
    assert list(out['rank']) == [1, 2, 3]


def test_bpe_segment_counts_matches_per_word_encode(ray_session):
    """The whole-doc vectorized replace chain must segment identically to
    per-word bpe_encode (boundary-straddle safety of the 4-space seams)."""
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.functions.bpe import (bpe_encode, bpe_merges,
                                             bpe_segment_counts)
    docs = pd.DataFrame({'doc_id': [1, 2, 3, 4], 'text': [
        'low low low lower newest newest',
        'newest widest widest baba abab',
        'aaaa aa a',
        '']})
    ds = rd.from_pandas(docs).repartition(2)
    merges_df = bpe_merges(ds, n_merges=6)
    merges = list(zip(merges_df['pair'], merges_df['merged']))
    out = bpe_segment_counts(ds, n_merges=6).to_pandas()
    got = dict(zip(out['doc_id'], out['n_bpe_tokens']))
    for _, r in docs.iterrows():
        want = sum(len(bpe_encode(w, merges))
                   for w in r['text'].split(' ') if w)
        assert got[r['doc_id']] == want, r['text']


def test_bloom_filter_membership_and_merge(ray_session):
    """No false negatives ever; per-batch merge ≡ one bulk filter
    (partition-invariant state); FP rate on unseen keys stays near the
    (1-e^{-kn/m})^k design point."""
    import math

    import pandas as pd
    import ray

    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.functions.sketches import BloomFilter, bloom_bits

    keys = [f'user_{i}' for i in range(500)]
    bulk = BloomFilter(m=16384, k=4, hash_fn=md5_hash64)
    bulk.add(keys)
    assert all(bulk.contains(k) for k in keys)        # no false negatives

    ghosts = [f'ghost_{i}' for i in range(2000)]
    fp = sum(1 for g in ghosts if bulk.contains(g)) / len(ghosts)
    expect = (1 - math.exp(-4 * 500 / 16384)) ** 4
    assert fp <= expect * 3 + 0.01, (fp, expect)

    half = BloomFilter(m=16384, k=4, hash_fn=md5_hash64)
    half.add(keys[:250])
    other = BloomFilter(m=16384, k=4, hash_fn=md5_hash64)
    other.add(keys[250:])
    assert (half.merge(other).bits == bulk.bits).all()

    rt = BloomFilter.from_bytes(bulk.to_bytes(), 16384, 4, md5_hash64)
    assert (rt.bits == bulk.bits).all()

    df = pd.DataFrame({'k': keys})
    for parts in (1, 3):
        got = bloom_bits(ray.data.from_pandas(df).repartition(parts), 'k',
                         m=16384, k=4, hash_fn=md5_hash64)
        import numpy as np
        assert (got['bit_pos'].to_numpy()
                == np.nonzero(bulk.bits)[0]).all()


def test_md5_hash64_batch_matches_per_row():
    """The vectorized sampling-membership hash must be bit-identical to
    md5_hash64(f'{prefix}{v}') on every dtype an id column can carry."""
    import numpy as np
    import pandas as pd

    from caligraph_ray.functions.hashing import md5_hash64, md5_hash64_batch

    cases = [
        pd.Series(np.arange(-5, 50, dtype=np.int64) * 7919),
        pd.Series(np.arange(20).astype(np.uint32)),
        pd.Series([f'doc_{i}' for i in range(30)]),
        pd.Series(['a', None, 'b', float('nan'), 'ü', ''], dtype=object),
        pd.Series([1.5, -0.0, float('nan')]),
    ]
    for s in cases:
        got = md5_hash64_batch(s, 'salt:42:')
        want = np.array([md5_hash64(f'salt:42:{v}') for v in s],
                        dtype=np.uint64)
        assert (got == want).all(), s.dtype
