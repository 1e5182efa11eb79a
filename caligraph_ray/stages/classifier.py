"""Distributed trainable classifier: logistic regression by full-batch
gradient descent — the gradient-based training loop of a training-data
pipeline (quality-filter classifiers à la CCNet/GPT-3 are this shape:
featurize → train on a labeled split → score the corpus).

Execution shape per iteration (same as the k-means trainer): broadcast
the weight vector once (``ray.put``), ONE stateless ``map_batches`` pass
emits per-batch gradient partials (Σ (σ(xw) − y)·x, n), the D-sized
partials reduce on the driver, the driver takes the step. Nothing
data-sized ever leaves the workers; iterations are deterministic given
the data and hyperparameters (float summation order varies with
partitioning — scoring/thresholding downstream must tolerate last-ulp
drift, as any distributed float reduction must).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def _design(batch: pd.DataFrame, feature_cols: Sequence[str]) -> np.ndarray:
    x = np.column_stack([batch[c].to_numpy(dtype=np.float64)
                         for c in feature_cols])
    return np.column_stack([np.ones(len(x)), x])   # bias first


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0)))


def logreg_train(ds, feature_cols: Sequence[str], label_col: str,
                 n_iters: int = 100, lr: float = 0.5,
                 l2: float = 0.0) -> np.ndarray:
    """Weights [bias, w_1..w_D] after ``n_iters`` full-batch GD steps."""
    import ray

    from ..state.broadcast import get_broadcast
    from .relational import collect_pandas

    cols = list(feature_cols)
    w = np.zeros(len(cols) + 1, dtype=np.float64)
    proj = ds.select_columns(cols + [label_col])
    for _ in range(int(n_iters)):
        ref = ray.put(w)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({'g': pd.Series(dtype=object),
                                     'n': pd.Series(dtype='int64')})
            wv = get_broadcast(ref)
            x = _design(batch, cols)
            y = batch[label_col].to_numpy(dtype=np.float64)
            err = _sigmoid(x @ wv) - y
            return pd.DataFrame({'g': [x.T @ err], 'n': [len(x)]})

        p = collect_pandas(proj.map_batches(partials, batch_format='pandas',
                                            batch_size=8192))
        n = int(p['n'].sum())
        if not n:
            break
        grad = np.sum(np.stack(list(p['g'])), axis=0) / n
        if l2:
            grad = grad + l2 * np.concatenate([[0.0], w[1:]])
        w = w - lr * grad
    return w


def logreg_score(ds, weights: np.ndarray, feature_cols: Sequence[str],
                 out_col: str = 'p', keep_cols: Optional[List[str]] = None):
    """Score a Dataset with trained weights (one stateless pass):
    appends σ(xw) as ``out_col``."""
    import ray

    from ..state.broadcast import get_broadcast
    cols = list(feature_cols)
    ref = ray.put(np.asarray(weights, dtype=np.float64))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch if keep_cols is None else batch[list(keep_cols)].copy()
        if not len(batch):
            out[out_col] = pd.Series(dtype='float64')
            return out
        wv = get_broadcast(ref)
        out[out_col] = _sigmoid(_design(batch, cols) @ wv)
        return out

    return ds.map_batches(score, batch_format='pandas', batch_size=8192)


def train_quality_classifier(docs_ds, label_fn=None,
                             n_iters: int = 100, lr: float = 0.5
                             ) -> Tuple[np.ndarray, List[str]]:
    """The quality-filter application: featurize documents with the
    existing quality/repetition stats, label with ``label_fn`` (a
    DataFrame → 0/1 Series rule — distant supervision; e.g. 'looks like
    reference text'), train the classifier. Returns (weights, feature
    column names); score the corpus with ``logreg_score``."""
    from .relational import shuffle_join
    from .textstats import quality_scores, repetition_stats

    q = quality_scores(docs_ds)
    r = repetition_stats(docs_ds)
    # both sides are doc-scale: skip the gate's measuring materialization
    feats = shuffle_join(q, r, left_on='doc_id', right_on='doc_id',
                         right_hint='fact')
    cols = ['n_tokens', 'n_uniq_tokens', 'avg_token_len', 'stopword_ratio',
            'top_bigram_frac', 'dup_5gram_frac']
    if label_fn is None:
        def label_fn(df: pd.DataFrame) -> pd.Series:
            return (df['stopword_ratio'] >= 0.05).astype('int64')

    def add_label(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch['label'] = label_fn(batch)
        return batch

    labeled = feats.map_batches(add_label, batch_format='pandas')
    w = logreg_train(labeled, cols, 'label', n_iters=n_iters, lr=lr)
    return w, cols
