"""Matcher train/predict lifecycle (reference matching/matcher.py:11-55):
train fits entity dim + acceptance threshold, test predicts + scores."""

import numpy as np
import pandas as pd
import pytest


def _corpus(ray_session=None):
    import ray.data as rd
    rows = []
    uid = 0
    for ent in ['Madrid', 'Rome', 'Oslo', 'Paris']:
        for _ in range(3):
            rows.append({'mention_uid': uid, 'label': ent, 'gold': ent})
            uid += 1
    # noisy mentions: junk surface, gold unreachable by label alone
    for ent in ['Madrid', 'Rome']:
        rows.append({'mention_uid': uid, 'label': 'zzz qqq ww', 'gold': ent})
        uid += 1
    df = pd.DataFrame(rows)
    df['mention_uid'] = df['mention_uid'].astype('int64')
    return rd.from_pandas(df).repartition(2)


def test_trainable_matcher_lifecycle(ray_session):
    from caligraph_ray.pipelines.registry import make_trainable_matcher
    m = make_trainable_matcher('scored')
    corpus = _corpus().materialize()
    report = m.train(corpus, eval_on_train=True)
    assert m.threshold is not None
    assert sorted(m.entity_labels) == ['Madrid', 'Oslo', 'Paris', 'Rome']
    tr = report[m.MODE_TRAIN]
    # exact-label mentions score 1.0 and are correct; the learned threshold
    # must keep them (recall ≥ 12/14) without tanking precision
    assert tr['metrics']['f1'] >= 0.85
    assert tr['mode'] == 'train'
    assert 'prediction_time_s' in tr
    # approach name carries the learned parameter (reference
    # get_approach_name contract)
    assert m.get_approach_name().startswith('scored_k=4_t=')

    test_report = m.test(corpus)[m.MODE_TEST]
    assert test_report['mode'] == 'test'
    assert test_report['metrics']['f1'] >= 0.85

    # prediction is usable standalone and honors the threshold
    pred = m.predict(m.MODE_PREDICT, corpus)
    assert all(isinstance(k, int) for k in pred)
    for uid in range(12):   # the exact-label mentions
        assert pred.get(uid) is not None


def test_matcher_requires_training(ray_session):
    from caligraph_ray.pipelines.matcher import ThresholdedScoredMatcher
    m = ThresholdedScoredMatcher()
    with pytest.raises(RuntimeError, match='not trained|not fitted'):
        m.predict(m.MODE_PREDICT, _corpus())


def test_matcher_with_real_transformer(ray_session):
    """The trainable matcher through the REAL model seams (the constructor
    swap applies to training too)."""
    from caligraph_ray.functions.tiny_transformer import (
        TransformerCrossScorer, TransformerEmbedder)
    from caligraph_ray.pipelines.matcher import ThresholdedScoredMatcher
    m = ThresholdedScoredMatcher(embedder_factory=TransformerEmbedder,
                                 reranker_factory=TransformerCrossScorer)
    corpus = _corpus().materialize()
    m.train(corpus)
    assert m.threshold is not None
    rep = m.test(corpus)[m.MODE_TEST]
    # exact-match pairs still pin 1.0 under the real scorer
    assert rep['metrics']['f1'] >= 0.85


def test_mention_corpus_from_sf(ray_session):
    from caligraph_ray.pipelines.matcher import mention_corpus_from_sf
    corpus = mention_corpus_from_sf('/root/testdata/sf0.001', limit_docs=50)
    df = corpus.to_pandas()
    assert len(df) > 0
    assert list(df.columns) == ['mention_uid', 'label', 'gold']
    assert df['gold'].notna().all()
    assert (df['label'] != '').all()
