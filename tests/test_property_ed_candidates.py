"""Property-based checks for the ED candidate stack (ST8/J7) and the
template expander (M8).

* _topk_idx's argpartition shortcut must be IDENTICAL to the full
  lexsort it documents, including boundary ties.
* BM25Index.topk vs a from-scratch Okapi BM25 loop (same formula,
  independent bookkeeping), and the distributed actor-pool bm25_topk vs
  the local index.
* me_candidates_topk vs a brute per-mention lexsort reference.
* expand_templates: plain text is untouched; self/mutually-recursive
  templates terminate; parameter substitution follows the documented
  positional/named/default rules.
"""

import math
from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))
PURE = settings(max_examples=300, deadline=None)


@PURE
@given(st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=12))
def test_topk_idx_matches_full_lexsort(scores, k):
    from caligraph_ray.stages.ed import _topk_idx
    s = np.array(scores, dtype=np.float64)
    tb = np.arange(len(s) - 1, -1, -1)   # adversarial: tiebreak anti-ordered
    got = _topk_idx(s, tb, k)
    want = np.lexsort((tb, -s))[:k]
    assert list(got) == list(want)


_VOCAB = ['the', 'city', 'of', 'paris', 'berlin', 'x']


@st.composite
def corpus_and_queries(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    texts = [' '.join(draw(st.lists(st.sampled_from(_VOCAB), min_size=1,
                                    max_size=5))) for _ in range(n)]
    nq = draw(st.integers(min_value=1, max_value=4))
    queries = [' '.join(draw(st.lists(st.sampled_from(_VOCAB), min_size=1,
                                      max_size=3))) for _ in range(nq)]
    return texts, queries


def _ref_bm25(texts, query, k, k1=1.5, b=0.75):
    docs = [t.lower().split() for t in texts]
    n = len(docs)
    avgdl = sum(map(len, docs)) / n
    df = Counter(tok for d in docs for tok in set(d))
    out = []
    for i, d in enumerate(docs):
        tf = Counter(d)
        s = 0.0
        for t in query.lower().split():
            f = tf.get(t, 0)
            if f:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
                s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(d) / avgdl))
        if s > 0:
            out.append((s, i))
    out.sort(key=lambda x: (-x[0], x[1]))
    return [(i, round(s, 6)) for s, i in out[:k]]


@SETTINGS
@given(corpus_and_queries(), st.integers(min_value=1, max_value=4))
def test_bm25_local_and_distributed_match_reference(ray_session, cq, k):
    import ray.data as rd
    from caligraph_ray.stages.ed import BM25Index, bm25_topk
    texts, queries = cq
    ids = list(range(len(texts)))
    index = BM25Index(ids, texts)
    for q in queries:
        got = [(i, round(s, 6)) for i, s in index.topk(q, k)]
        assert got == _ref_bm25(texts, q, k), q
    qdf = pd.DataFrame({'label': queries})
    dist = bm25_topk(rd.from_pandas(qdf).repartition(2), ids, texts,
                     k=k, concurrency=(1, 1)).to_pandas()
    if dist.empty:   # zero hits anywhere: schema-less empty (engine contract)
        assert all(not _ref_bm25(texts, q, k) for q in queries)
        return
    for q in set(queries):
        got_rows = dist[dist['label'] == q]
        got = list(zip(got_rows['doc_id'].astype(int), got_rows['bm25']))
        # distributed output: per-query rows in rank order; duplicate query
        # strings emit their rows once per occurrence
        mult = queries.count(q)
        want = _ref_bm25(texts, q, k) * mult
        assert sorted(got) == sorted(want), q


@SETTINGS
@given(st.integers(min_value=1, max_value=10), st.integers(min_value=1, max_value=6),
       st.integers(min_value=1, max_value=4), st.randoms(use_true_random=False))
def test_me_candidates_match_brute(ray_session, n_mentions, n_entities, k, rnd):
    import ray.data as rd
    from caligraph_ray.stages.ed import me_candidates_topk
    dim = 4
    mvecs = np.array([[rnd.randint(-2, 2) or 1 for _ in range(dim)]
                      for _ in range(n_mentions)], dtype=np.float64)
    evecs = np.array([[rnd.randint(-2, 2) or 1 for _ in range(dim)]
                      for _ in range(n_entities)], dtype=np.float64)
    eids = np.arange(n_entities, dtype=np.int64)
    df = pd.DataFrame({'mention_uid': np.arange(n_mentions, dtype='int64'),
                       'embedding': list(mvecs)})
    got_df = me_candidates_topk(rd.from_pandas(df).repartition(2), eids,
                                evecs, k=k, min_score=-2.0).to_pandas()

    def norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = norm(mvecs) @ norm(evecs).T
    for m in range(n_mentions):
        idx = np.lexsort((eids, -sims[m]))[:min(k, n_entities)]
        want = [(int(eids[j]), round(float(sims[m][j]), 6)) for j in idx]
        sub = got_df[got_df['mention_uid'] == m]
        got = list(zip(sub['entity_id'].astype(int), sub['score']))
        assert got == want, m


def test_expand_templates_contracts():
    from caligraph_ray.stages.category_parser import (
        expand_templates, prepare_template_definitions)
    defs = prepare_template_definitions({
        'loop': 'a {{loop}} b',
        'mutual1': 'x {{mutual2}}',
        'mutual2': 'y {{mutual1}}',
        'greet': 'hello {{{1}}} and {{{name|nobody}}}',
    })
    # plain text untouched
    out, used = expand_templates('no templates here [[Category:X]]', defs)
    assert out == 'no templates here [[Category:X]]' and used == set()
    # recursion terminates (visited set breaks the cycle)
    out, used = expand_templates('{{loop}}', defs)
    assert 'loop' in used
    out, used = expand_templates('{{mutual1}}', defs)
    assert {'mutual1', 'mutual2'} <= used
    # positional + named-with-default substitution
    out, used = expand_templates('{{greet|world|name=Ann}}', defs)
    assert out == 'hello world and Ann'
    out, _ = expand_templates('{{greet|world}}', defs)
    assert out == 'hello world and nobody'
