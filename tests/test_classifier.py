"""Distributed logistic-regression trainer: gradient-partial exchange,
convergence on separable data, partition invariance, quality-filter
application."""

import numpy as np
import pandas as pd
import pytest


def _separable(n=400, seed=5):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 2)
    y = (x[:, 0] + 2 * x[:, 1] > 0).astype('int64')
    return pd.DataFrame({'f1': x[:, 0], 'f2': x[:, 1], 'y': y})


def test_logreg_converges_and_matches_local(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.classifier import (_design, _sigmoid,
                                                 logreg_score, logreg_train)
    df = _separable()
    ds = rd.from_pandas(df).repartition(4)
    w = logreg_train(ds, ['f1', 'f2'], 'y', n_iters=200, lr=1.0)
    # accuracy on the training set must be near-perfect (separable)
    p = _sigmoid(_design(df, ['f1', 'f2']) @ w)
    acc = float(np.mean((p > 0.5) == (df['y'] == 1)))
    assert acc >= 0.97
    # driver-side replica of the same GD (same float math, same order up
    # to partition sums) agrees to high precision
    wl = np.zeros(3)
    for _ in range(200):
        x = _design(df, ['f1', 'f2'])
        err = _sigmoid(x @ wl) - df['y'].to_numpy(dtype=float)
        wl = wl - 1.0 * (x.T @ err) / len(df)
    np.testing.assert_allclose(w, wl, rtol=1e-6)
    # scoring pass appends probabilities
    scored = logreg_score(ds, w, ['f1', 'f2']).to_pandas()
    assert scored['p'].between(0, 1).all()


def test_logreg_partition_invariance(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.classifier import logreg_train
    df = _separable(n=200, seed=9)
    w2 = logreg_train(rd.from_pandas(df).repartition(2), ['f1', 'f2'], 'y',
                      n_iters=50, lr=0.8)
    w8 = logreg_train(rd.from_pandas(df).repartition(8), ['f1', 'f2'], 'y',
                      n_iters=50, lr=0.8)
    np.testing.assert_allclose(w2, w8, rtol=1e-9)


def test_quality_classifier_end_to_end(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.classifier import (logreg_score,
                                                 train_quality_classifier)
    docs = rd.read_parquet('/root/testdata/sf0.001/documents.parquet',
                           columns=['doc_id', 'text'])
    w, cols = train_quality_classifier(docs, n_iters=30)
    assert len(w) == len(cols) + 1
    from caligraph_ray.stages.textstats import quality_scores
    scored = logreg_score(quality_scores(docs), w[:5], cols[:4],
                          keep_cols=['doc_id'])
    out = scored.to_pandas()
    assert len(out) == docs.count()
    assert out['p'].between(0, 1).all()
