"""Property-based equivalence for the text-analysis family vs Counter/loop
references: distributed token and bigram counts, the quantized unigram-LM
scorer, and the shingle-exchange contamination check. Plus the pure
winnowing-fingerprint invariants."""

from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))
PURE = settings(max_examples=200, deadline=None)

_WORDS = ['the', 'cat', 'sat', 'x', 'aa']


@st.composite
def doc_frame(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    texts = [' '.join(draw(st.lists(st.sampled_from(_WORDS), max_size=8)))
             for _ in range(n)]
    return pd.DataFrame({'doc_id': np.arange(n, dtype='int64'),
                         'text': texts})


def _toks(text):
    return [t for t in text.split(' ') if t]


@SETTINGS
@given(doc_frame(), st.sampled_from([0, 2]),
       st.sampled_from([None, frozenset(['the', 'cat'])]))
def test_token_counts_matches_counter(ray_session, df, min_len, vocab):
    import ray.data as rd
    from caligraph_ray.stages.textstats import token_counts
    got_df = token_counts(rd.from_pandas(df).repartition(2),
                          min_len=min_len, vocab=vocab).to_pandas()
    got = {r['token']: int(r['freq']) for _, r in got_df.iterrows()}
    want = Counter(t for text in df['text'] for t in _toks(text)
                   if len(t) >= min_len and (vocab is None or t in vocab))
    assert got == dict(want)


@SETTINGS
@given(doc_frame())
def test_bigram_counts_matches_counter(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.textstats import bigram_counts
    got_df = bigram_counts(rd.from_pandas(df).repartition(2)).to_pandas()
    got = {(r['w1'], r['w2']): int(r['freq']) for _, r in got_df.iterrows()}
    want = Counter()
    for text in df['text']:
        toks = _toks(text)
        for i in range(len(toks) - 1):
            want[(toks[i], toks[i + 1])] += 1
    assert got == dict(want)


@SETTINGS
@given(doc_frame())
def test_unigram_logprob_matches_reference(ray_session, df):
    import ray.data as rd
    from caligraph_ray.functions.hashing import log2_fixed
    from caligraph_ray.stages.textstats import unigram_logprob_scores
    got_df = unigram_logprob_scores(rd.from_pandas(df).repartition(2)).to_pandas()
    got = {int(r['doc_id']): (int(r['logprob_q']), int(r['n_tokens']))
           for _, r in got_df.iterrows()}
    corpus = Counter(t for text in df['text'] for t in _toks(text))
    n_total = sum(corpus.values())
    lp = {t: log2_fixed(f) - log2_fixed(n_total)
          for t, f in corpus.items()}
    want = {}
    for _, r in df.iterrows():
        toks = _toks(r['text'])
        if toks:
            want[int(r['doc_id'])] = (sum(lp[t] for t in toks), len(toks))
    assert got == want


@SETTINGS
@given(doc_frame())
def test_unigram_logprob_join_regime_equivalent(ray_session, df):
    """Forced-low-gate equivalence: vocab_broadcast_limit=0 routes through
    the token-keyed shuffle-join scale path, which must be bit-identical
    to the broadcast regime."""
    import ray.data as rd
    from caligraph_ray.stages.textstats import unigram_logprob_scores
    ds = rd.from_pandas(df).repartition(2)
    base = unigram_logprob_scores(ds).to_pandas()
    joined = unigram_logprob_scores(
        ds, vocab_broadcast_limit=0).to_pandas()
    key = lambda d: {int(r['doc_id']): (int(r['logprob_q']),
                                        int(r['n_tokens']))
                     for _, r in d.iterrows()}
    assert key(base) == key(joined)


@SETTINGS
@given(doc_frame(), st.integers(min_value=1, max_value=3))
def test_split_contamination_matches_brute(ray_session, df, shingle_size):
    import ray.data as rd
    from caligraph_ray.functions.hashing import MinHasher, md5_hash64
    from caligraph_ray.stages.textstats import split_contamination
    got_df = split_contamination(rd.from_pandas(df).repartition(2),
                                 shingle_size=shingle_size).to_pandas()
    got = {} if got_df.empty else \
        {int(r['doc_id']): int(r['shared_shingles']) for _, r in got_df.iterrows()}
    mh = MinHasher(shingle_size=shingle_size, shingle_hash=md5_hash64)
    doc_sh = {int(r['doc_id']): set(mh.shingles(_toks(r['text'])))
              for _, r in df.iterrows()}
    split = {d: md5_hash64(str(d)) % 10 for d in doc_sh}
    train = set().union(*(s for d, s in doc_sh.items() if split[d] != 0)) \
        if any(split[d] != 0 for d in doc_sh) else set()
    want = {d: len(s & train) for d, s in doc_sh.items()
            if split[d] == 0 and len(s & train)}
    assert got == want


@PURE
@given(st.text(alphabet='abc ', max_size=60),
       st.integers(min_value=1, max_value=20),
       st.integers(min_value=1, max_value=10))
def test_rolling_fingerprint_invariants(text, window, keep):
    from caligraph_ray.functions.hashing import (rolling_fingerprint,
                                                 stable_hash64)
    fp = rolling_fingerprint(text, window, keep)
    assert fp == rolling_fingerprint(text, window, keep)   # deterministic
    if not text:
        assert fp == []
        return
    assert fp == sorted(fp) and len(fp) == len(set(fp))
    if len(text) <= window:
        assert fp == [stable_hash64(text)]
    else:
        assert 1 <= len(fp) <= keep
        all_hashes = {stable_hash64(text[i:i + window])
                      for i in range(len(text) - window + 1)}
        assert fp == sorted(all_hashes)[:keep]


def test_repetition_stats_crafted(ray_session):
    """Gopher repetition filters on crafted docs: a clean doc, a doc whose
    text is one bigram repeated (top_bigram_frac ≈ 1), and a doc with
    duplicated 5-grams."""
    import math

    import pandas as pd
    import ray.data as rd
    from caligraph_ray.stages.textstats import repetition_stats
    docs = pd.DataFrame({
        'doc_id': [1, 2, 3, 4],
        'text': ['one two three four five six seven',
                 'ab cd ab cd ab cd ab cd',
                 'a b c d e a b c d e a b c d e',
                 'x'],
    })
    out = repetition_stats(rd.from_pandas(docs).repartition(2)).to_pandas() \
        .set_index('doc_id').sort_index()
    # doc 1: every bigram unique -> top bigram covers its own chars once
    assert out.loc[1, 'dup_5gram_frac'] == 0.0
    assert 0 < out.loc[1, 'top_bigram_frac'] < 0.5
    # doc 2: 'ab cd' occurs 4x of 7 bigrams; 4*5/23 chars
    assert out.loc[2, 'top_bigram_frac'] == math.floor(4 * 5 / 23 * 1e6) / 1e6
    # doc 3: 15 tokens -> 11 5-grams, 5 distinct -> 6/11 duplicated
    assert out.loc[3, 'dup_5gram_frac'] == math.floor(6 / 11 * 1e6) / 1e6
    # doc 4: too short for either n-gram
    assert out.loc[4, 'top_bigram_frac'] == 0.0
    assert out.loc[4, 'dup_5gram_frac'] == 0.0


def test_duplicate_spans_crafted(ray_session):
    """Exact-substring span dedup: a 7-token run shared by docs 1 and 2
    (different offsets) comes back as ONE maximal span, not 3 overlapping
    5-gram hits; unrelated docs produce nothing."""
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.stages.dedup import duplicate_spans
    shared = 'the quick brown fox jumps over fences'
    docs = pd.DataFrame({
        'doc_id': pd.Series([1, 2, 3], dtype='int64'),
        'text': [f'intro words {shared} tail one',
                 f'{shared} completely different ending here',
                 'nothing in common with the others at all'],
    })
    out = duplicate_spans(rd.from_pandas(docs).repartition(2),
                          min_len=5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r['da']), int(r['db'])) == (1, 2)
    assert int(r['a_start']) == 2 and int(r['b_start']) == 0
    assert int(r['length']) == 7


def test_lang_id_ngram_classifies(ray_session):
    import pandas as pd
    import ray.data as rd
    from caligraph_ray.stages.textstats import lang_id_ngram
    df = pd.DataFrame({'doc_id': pd.Series([1, 2, 3, 4, 5], dtype='int64'),
                       'text': [
        'the cat and the dog are in the house with all of them',
        'le chat est dans la maison avec les autres et il ne dort pas',
        'der Hund ist in dem Haus und die Katze auch nicht da',
        'el perro y el gato en la casa con los otros sin miedo',
        'zzz qqq 123']})
    out = lang_id_ngram(rd.from_pandas(df).repartition(2)).to_pandas() \
        .set_index('doc_id').sort_index()
    assert list(out['pred_lang']) == ['en', 'fr', 'de', 'es', 'unknown']


@SETTINGS
@given(doc_frame(), st.integers(min_value=1, max_value=3))
def test_tfidf_top_terms_matches_reference(ray_session, df, k):
    """tfidf_top_terms ≡ single-process exact-integer reference (tf ×
    (log2_fixed(N) − log2_fixed(df)), top-k by (score desc, token asc))."""
    import ray.data as rd
    from caligraph_ray.functions.hashing import log2_fixed
    from caligraph_ray.stages.textstats import tfidf_top_terms
    out = tfidf_top_terms(rd.from_pandas(df).repartition(2), k=k).to_pandas()
    got = sorted((int(r['doc_id']), r['token'], int(r['score_q']))
                 for _, r in out.iterrows())
    n_docs = len(df)
    dfreq = Counter()
    per_doc = {}
    for _, r in df.iterrows():
        tf = Counter(_toks(r['text']))
        per_doc[int(r['doc_id'])] = tf
        dfreq.update(tf.keys())
    l2n = log2_fixed(n_docs) if n_docs else 0
    want = []
    for did, tf in per_doc.items():
        scored = sorted(((t, c * (l2n - log2_fixed(dfreq[t])))
                         for t, c in tf.items()),
                        key=lambda x: (-x[1], x[0]))
        want += [(did, t, s) for t, s in scored[:k]]
    assert got == sorted(want)


@SETTINGS
@given(doc_frame(), st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=5))
def test_passage_chunks_geometry(ray_session, df, window, stride):
    """Chunk geometry ≡ loop reference: every start < n at stride steps,
    short tails kept, boundary tokens correct."""
    import ray.data as rd
    from caligraph_ray.stages.textstats import passage_chunks
    out = passage_chunks(rd.from_pandas(df).repartition(2),
                         window=window, stride=stride).to_pandas()
    got = sorted((int(r['doc_id']), int(r['chunk_idx']), int(r['start']),
                  int(r['n_chunk_tokens']), r['first_token'],
                  r['last_token']) for _, r in out.iterrows())
    want = []
    for _, r in df.iterrows():
        toks = _toks(r['text'])
        ci = 0
        for st_ in range(0, len(toks), stride):
            m = min(window, len(toks) - st_)
            want.append((int(r['doc_id']), ci, st_, m, toks[st_],
                         toks[st_ + m - 1]))
            ci += 1
    assert got == sorted(want)


def test_mixture_sample_rates(ray_session):
    """mixture_sample ≡ per-row md5 reference; unknown strata drop."""
    import ray.data as rd
    from caligraph_ray.functions.hashing import md5_hash64
    from caligraph_ray.stages.textstats import mixture_sample
    df = pd.DataFrame({'doc_id': np.arange(200, dtype='int64'),
                       'lang': [['en', 'fr', 'xx'][i % 3]
                                for i in range(200)]})
    rates = {'en': 300, 'fr': 900}
    out = mixture_sample(rd.from_pandas(df).repartition(3), rates,
                         'lang', 'doc_id').to_pandas()
    want = {int(i) for i, l in zip(df['doc_id'], df['lang'])
            if md5_hash64(f'mix:42:{i}') % 1000 < rates.get(l, 0)}
    assert set(out['doc_id'].astype(int)) == want
    assert 'xx' not in set(out['lang'])


@SETTINGS
@given(doc_frame())
def test_importance_weights_match_reference(ray_session, df):
    """DSIR importance weights vs a Counter/loop reference: target = even
    doc_ids (a subset of raw), Laplace-+1 smoothing over the raw vocab,
    exact integer fixed-point sums."""
    import ray.data as rd
    from caligraph_ray.functions.hashing import log2_fixed
    from caligraph_ray.stages.textstats import importance_weights
    tgt_df = df[df['doc_id'] % 2 == 0]
    got_df = importance_weights(
        rd.from_pandas(df).repartition(2),
        rd.from_pandas(tgt_df).repartition(2)).to_pandas()
    got = {int(r['doc_id']): (int(r['weight_q']), int(r['n_tokens']))
           for _, r in got_df.iterrows()}
    raw = Counter(t for text in df['text'] for t in _toks(text))
    tgt = Counter(t for text in tgt_df['text'] for t in _toks(text))
    want = {}
    if raw:
        v = len(raw)
        l2_nr = log2_fixed(sum(raw.values()) + v)
        l2_nt = log2_fixed(sum(tgt.values()) + v)
        w = {t: (log2_fixed(tgt.get(t, 0) + 1) - l2_nt)
                - (log2_fixed(f + 1) - l2_nr) for t, f in raw.items()}
        for _, r in df.iterrows():
            toks = _toks(r['text'])
            if toks:
                want[int(r['doc_id'])] = (sum(w[t] for t in toks), len(toks))
    assert got == want


@SETTINGS
@given(doc_frame())
def test_importance_weights_join_regime_equivalent(ray_session, df):
    """Forced-low-gate equivalence: vocab_broadcast_limit=0 routes scoring
    through the exploded token-keyed shuffle join, bit-identical to the
    broadcast regime."""
    import ray.data as rd
    from caligraph_ray.stages.textstats import importance_weights
    tgt_df = df[df['doc_id'] % 2 == 0]
    ds = rd.from_pandas(df).repartition(2)
    tgt = rd.from_pandas(tgt_df).repartition(2)
    base = importance_weights(ds, tgt).to_pandas()
    joined = importance_weights(ds, tgt, vocab_broadcast_limit=0).to_pandas()
    key = lambda d: {int(r['doc_id']): (int(r['weight_q']),
                                        int(r['n_tokens']))
                     for _, r in d.iterrows()}
    assert key(base) == key(joined)


# --- Arrow fast-path ≡ _split_tokens Python reference (VERDICT r4 #6) ---

_ADVERSARIAL = ['', ' ', '  ', 'a  b', 'tab\tinside token', ' lead',
                'trail ', '...', '......', '#a#b ... #', 'ü ü ü',
                'the the the of', 'x' * 300, 'a\x00b c', "it's a test"]


@st.composite
def adversarial_frame(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    texts = [draw(st.one_of(
        st.sampled_from(_ADVERSARIAL),
        st.text(alphabet=' aZ#.\tü', max_size=30)))
        for _ in range(n)]
    return pd.DataFrame({'doc_id': np.arange(n, dtype='int64'),
                         'text': texts})


@SETTINGS
@given(adversarial_frame())
def test_quality_scores_arrow_matches_python(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.textstats import EN_STOPWORDS, quality_scores
    got = quality_scores(rd.from_pandas(df).repartition(2)).to_pandas() \
        .sort_values('doc_id').reset_index(drop=True)
    for _, row in got.iterrows():
        toks = _toks(df.loc[df['doc_id'] == row['doc_id'], 'text'].iloc[0])
        n = len(toks)
        assert row['n_tokens'] == n
        assert row['n_uniq_tokens'] == len(set(toks))
        assert row['avg_token_len'] == (
            round(sum(map(len, toks)) / n, 6) if n else 0.0)
        assert row['stopword_ratio'] == (
            round(sum(t in EN_STOPWORDS for t in toks) / n, 6) if n else 0.0)


@SETTINGS
@given(adversarial_frame())
def test_gopher_flags_arrow_matches_python(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.textstats import (_GOPHER_STOPWORDS,
                                                gopher_quality_flags)
    got = gopher_quality_flags(rd.from_pandas(df).repartition(2),
                               min_words=2, max_words=10).to_pandas() \
        .sort_values('doc_id').reset_index(drop=True)
    stop = frozenset(_GOPHER_STOPWORDS)
    for _, row in got.iterrows():
        text = df.loc[df['doc_id'] == row['doc_id'], 'text'].iloc[0] or ''
        toks = _toks(text)
        n = len(toks)
        total_len = sum(len(t) for t in toks)
        symbols = text.count('#') + text.count('...')
        alpha = sum(1 for t in toks
                    if any('a' <= c <= 'z' or 'A' <= c <= 'Z' for c in t))
        n_stop = len(stop.intersection(toks))
        assert row['n_words'] == n
        assert row['pass_word_count'] == int(2 <= n <= 10)
        assert row['pass_mean_word_len'] == int(
            n > 0 and 3 * n <= total_len <= 10 * n)
        assert row['pass_symbol_ratio'] == int(10 * symbols <= n)
        assert row['pass_alpha_ratio'] == int(5 * alpha >= 4 * n)
        assert row['pass_stopwords'] == int(n_stop >= 2)
        assert row['pass_all'] == (
            row['pass_word_count'] & row['pass_mean_word_len']
            & row['pass_symbol_ratio'] & row['pass_alpha_ratio']
            & row['pass_stopwords'])


@SETTINGS
@given(adversarial_frame())
def test_blocklist_flags_arrow_matches_python(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.textstats import blocklist_flags
    terms = ['the', '...', 'ü', '#a#b']
    got = blocklist_flags(rd.from_pandas(df).repartition(2),
                          terms).to_pandas() \
        .sort_values('doc_id').reset_index(drop=True)
    block = frozenset(terms)
    for _, row in got.iterrows():
        toks = _toks(df.loc[df['doc_id'] == row['doc_id'], 'text'].iloc[0])
        want = sum(1 for t in toks if t in block)
        assert row['n_blocked'] == want
        assert row['blocked'] == int(want > 0)


@SETTINGS
@given(adversarial_frame(), st.sampled_from([0, 2]))
def test_token_counts_arrow_adversarial(ray_session, df, min_len):
    import ray.data as rd
    from caligraph_ray.stages.textstats import token_counts
    got = token_counts(rd.from_pandas(df).repartition(2),
                       min_len=min_len).to_pandas()
    want = Counter(t for text in df['text'] for t in _toks(text)
                   if len(t) >= min_len)
    got_d = dict(zip(got['token'], got['freq'])) if len(got) else {}
    assert got_d == dict(want)


@SETTINGS
@given(adversarial_frame())
def test_bigram_counts_arrow_adversarial(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.textstats import bigram_counts
    got = bigram_counts(rd.from_pandas(df).repartition(2)).to_pandas()
    want = Counter()
    for text in df['text']:
        toks = _toks(text)
        for i in range(len(toks) - 1):
            want[(toks[i], toks[i + 1])] += 1
    got_d = {(a, b): c for a, b, c in
             zip(got['w1'], got['w2'], got['freq'])} if len(got) else {}
    assert got_d == dict(want)
