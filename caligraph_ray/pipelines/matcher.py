"""Matcher train/predict contract (reference matching/matcher.py:11-55).

The reference's ``Matcher`` owns MODE_TRAIN/EVAL/TEST/PREDICT, a
``train(corpus, eval_on_train)`` phase that fits model state then
optionally self-evaluates, and a ``test`` phase that predicts and scores
against the corpus alignment. This is that contract over Ray Datasets:

* A CORPUS is a Dataset with columns (mention_uid, label, gold) — gold is
  the wikilink-derived target entity, exactly the reference's
  distantly-supervised alignment source (data/listing.py). Corpora are
  evaluation artifacts (thousands of rows), so collecting predictions to
  the driver for metric computation is in-contract — the reference's
  MetricsCalculator does the same; PREDICTION over unbounded data goes
  through ``link_mentions_scored`` directly and never collects.
* ``ThresholdedScoredMatcher`` is the trainable instance: the full ED
  stack (embed → candidate top-k → cross-encoder rerank) scores every
  mention, and TRAINING fits (a) the entity dim from the train split's
  gold set and (b) the acceptance threshold that maximizes ME-F1 on the
  train split — the stand-in analogue of fitting encoder weights, behind
  the same seams (embedder_factory/reranker_factory swap in the real
  models, tests/test_tiny_transformer.py proves the swap).
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ..functions.metrics import me_prf


def corpus_gold(corpus_ds) -> Dict[int, str]:
    """Collect the corpus alignment (small by contract, see module doc)."""
    from ..stages.relational import collect_pandas
    df = collect_pandas(corpus_ds.select_columns(['mention_uid', 'gold']))
    return dict(zip(df['mention_uid'].astype(int), df['gold']))


def mention_corpus_from_sf(sf_dir: str, limit_docs: Optional[int] = None):
    """Build a (mention_uid, label, gold) corpus from the documents table:
    parse → explode mentions → keep wikilinked mentions (the distant
    supervision the reference trains on)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.alias import explode_mentions
    from ..stages.html_extract import items_view, parse_pages
    from ..stages.relational import read_table
    from .flagship import documents_to_pages

    docs = read_table(sf_dir, 'documents',
                      ['doc_id', 'text', 'lang', 'source'])
    if limit_docs:
        docs = docs.limit(limit_docs)
    mentions = explode_mentions(items_view(parse_pages(
        documents_to_pages(docs))))

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_kleene(
            pc.is_valid(t.column('name')),
            pc.not_equal(t.column('label'), pa.scalar(''))))
        return pa.Table.from_pydict({
            'mention_uid': t.column('mention_uid').cast(pa.int64()),
            'label': t.column('label'),
            'gold': t.column('name'),
        })

    return mentions.map_batches(project, batch_format='pyarrow')


class Matcher(ABC):
    """Train/test/predict lifecycle (reference matcher.py:11-55)."""

    MODE_TRAIN, MODE_EVAL, MODE_TEST, MODE_PREDICT = \
        'train', 'eval', 'test', 'predict'

    def __init__(self, matcher_id: str):
        self.id = matcher_id

    def _get_param_dict(self) -> dict:
        return {}

    def get_approach_name(self) -> str:
        return '_'.join([self.id] + [f'{k}={v}'
                                     for k, v in self._get_param_dict().items()])

    def train(self, train_corpus, eval_on_train: bool = False) -> Dict[str, dict]:
        self._train_model(train_corpus)
        if eval_on_train:
            return {self.MODE_TRAIN: self._evaluate(self.MODE_TRAIN,
                                                    train_corpus)}
        return {}

    @abstractmethod
    def _train_model(self, train_corpus) -> None:
        ...

    def test(self, test_corpus) -> Dict[str, dict]:
        return {self.MODE_TEST: self._evaluate(self.MODE_TEST, test_corpus)}

    def _evaluate(self, mode: str, corpus) -> dict:
        t0 = time.monotonic()
        pred = self.predict(mode, corpus)
        elapsed = time.monotonic() - t0
        metrics = me_prf(pred, corpus_gold(corpus))
        return {'approach': self.get_approach_name(), 'mode': mode,
                'metrics': metrics, 'predicted': len(pred),
                'prediction_time_s': round(elapsed, 3)}

    @abstractmethod
    def predict(self, mode: str, corpus) -> Dict[int, str]:
        ...


class ThresholdedScoredMatcher(Matcher):
    """Trainable ED matcher: fit entity dim + acceptance threshold on the
    train split, predict via the scored-linking stack with gold HIDDEN."""

    def __init__(self, matcher_id: str = 'scored',
                 entity_labels: Optional[List[str]] = None, k: int = 4,
                 embedder_factory=None, reranker_factory=None):
        super().__init__(matcher_id)
        self.k = k
        self.entity_labels = entity_labels
        self.embedder_factory = embedder_factory
        self.reranker_factory = reranker_factory
        self.threshold: Optional[float] = None

    def _get_param_dict(self) -> dict:
        d = {'k': self.k}
        if self.threshold is not None:
            d['t'] = round(self.threshold, 6)
        return d

    def _score(self, corpus) -> pd.DataFrame:
        """(mention_uid, entity, link_score) with gold hidden from the
        linker: the name column arrives null so every mention goes through
        candidate generation + rerank, never the wikilink shortcut."""
        from ..stages.ed import link_mentions_scored
        from ..stages.relational import collect_pandas

        def hide(df: pd.DataFrame) -> pd.DataFrame:
            out = df[['mention_uid', 'label']].copy()
            out['name'] = None
            return out

        hidden = corpus.map_batches(hide, batch_format='pandas')
        ents = self.entity_labels
        if ents is None:
            raise RuntimeError('entity dim not fitted: call train() first '
                               'or pass entity_labels')
        linked = link_mentions_scored(
            hidden, ents, k=self.k,
            embedder_factory=self.embedder_factory,
            reranker_factory=self.reranker_factory)
        return collect_pandas(
            linked.select_columns(['mention_uid', 'entity', 'link_score']))

    def _train_model(self, train_corpus) -> None:
        if self.entity_labels is None:
            # fit the entity dim from the train split's gold set
            self.entity_labels = sorted(
                set(corpus_gold(train_corpus).values()))
        df = self._score(train_corpus)
        gold = corpus_gold(train_corpus)
        correct = np.array([gold.get(int(m)) == e
                            for m, e in zip(df['mention_uid'], df['entity'])])
        scores = df['link_score'].to_numpy(dtype='float64')
        order = np.argsort(-scores, kind='stable')
        s_sorted, c_sorted = scores[order], correct[order]
        tp = np.cumsum(c_sorted)
        kcnt = np.arange(1, len(df) + 1, dtype='float64')
        # threshold sweep: accepting the top-i scores gives P=tp/i,
        # R=tp/|gold|; only cuts at distinct score boundaries are valid
        prec = tp / kcnt
        rec = tp / max(len(gold), 1)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
        boundary = np.ones(len(df), dtype=bool)
        boundary[:-1] = s_sorted[:-1] > s_sorted[1:]
        f1 = np.where(boundary, f1, -1.0)
        if len(df) == 0:
            self.threshold = 1.0
            return
        best = int(np.argmax(f1))
        self.threshold = float(s_sorted[best])

    def predict(self, mode: str, corpus) -> Dict[int, str]:
        if self.threshold is None:
            raise RuntimeError('matcher not trained: call train() first')
        df = self._score(corpus)
        keep = df[(df['entity'].notna())
                  & (df['link_score'] >= self.threshold)]
        return dict(zip(keep['mention_uid'].astype(int), keep['entity']))
