"""Entity-disambiguation stack: bi-encoder embedding, BM25 / ANN candidate
generation, cross-encoder reranking (reference ST4/ST7/ST8 + J7:
…/matching/biencoder.py:15-112, …/matching/lexical.py:22-90,
…/matching/crossencoder.py:81-104).

Every model is a DETERMINISTIC stand-in behind the exact actor interface
the real model would use — state loaded once in ``__init__``, batched
``__call__`` — so swapping in SentenceTransformer / a HF cross-encoder is
a constructor change, not a pipeline change (no GPU in this environment):

* ``HashEmbedder``      — feature-hashing text embedder (ST4 stand-in;
  reference biencoder batch 384, all-MiniLM-L12-v2)
* ``BM25Index``         — exact Okapi BM25 over tokenized labels (ST8;
  reference uses fastbm25, same formula, k1=1.5 b=0.75)
* ``CrossEncoderReranker`` — pair scorer keeping argmax entity per mention
  (ST7 stand-in; reference distilbert pair scorer, batch 128, top-4)

Execution shapes: embeddings are added per batch in an actor-pool
``map_batches``; candidate generation broadcasts the (small) entity matrix
once and does one matmul per batch (ME candidates) or groups by surface
(MM candidates, J7's shared-group-key self-join); reranking is a stateless
pair-scoring pass + per-mention argmax shuffle.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import AGG_BATCH_SIZE
from ..functions.hashing import stable_hash64


def _pool_size() -> Tuple[int, int]:
    """Default actor-pool bounds scaled to the cluster (a real model pool is
    sized by accelerator count instead — pass concurrency explicitly)."""
    try:
        cpus = int(ray.cluster_resources().get('CPU', 8))
    except Exception:
        cpus = 8
    return (1, max(8, cpus))


# --- ST4: bi-encoder stand-in ----------------------------------------------

def hash_embed(text: str, dim: int = 64) -> np.ndarray:
    """Deterministic feature-hashing embedding: each token hashes to a
    (position, sign) pair; the result is L2-normalized. Similar token sets
    → similar vectors, which is the property the ED stack needs."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        h = stable_hash64(tok)
        v[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class HashEmbedder:
    """Actor-pool embedder (ST4 interface): 'model' prepared once per actor
    in __init__ (the real path loads SentenceTransformer here — reference
    biencoder.py:15-112); __call__ embeds one batch."""

    def __init__(self, text_col: str = 'label', out_col: str = 'embedding',
                 dim: int = 64):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim

    def embed_batch(self, texts) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim))
        return np.stack([hash_embed(t or '', self.dim) for t in texts])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = list(self.embed_batch(list(batch[self.text_col])))
        return batch


def embed_texts(ds, text_col: str, out_col: str = 'embedding', dim: int = 64,
                concurrency: Optional[Tuple[int, int]] = None, batch_size: int = 384,
                embedder_cls: type = HashEmbedder,
                num_gpus: Optional[float] = None):
    """Add an embedding column (actor pool; batch 384 mirrors the reference
    bi-encoder batch size, entity_disambiguation/__init__.py:54).
    ``embedder_cls``: any (text_col, out_col, dim) actor class — the
    constructor-swap seam (functions.tiny_transformer.TransformerEmbedder
    is the proved real-model instance). ``num_gpus``: per-actor GPU share
    forwarded to the pool (the reference's hot path is GPU batch
    inference, mention_detection/__init__.py:41-46 — on a GPU cluster set
    num_gpus=1 and size concurrency to accelerator count; pinned by
    tests/test_gpu_seam.py)."""
    kw = {} if num_gpus is None else {'num_gpus': num_gpus}
    return ds.map_batches(
        embedder_cls,
        fn_constructor_kwargs={'text_col': text_col, 'out_col': out_col, 'dim': dim},
        batch_format='pandas', batch_size=batch_size,
        concurrency=concurrency or _pool_size(), **kw)


# --- ST8: BM25 --------------------------------------------------------------

BM25_K1 = 1.5
BM25_B = 0.75


class BM25Index:
    """Exact Okapi BM25 over a tokenized corpus (ST8; reference
    lexical.py:61-90 uses fastbm25 with defaults — same scoring here,
    idf = ln((N - df + .5)/(df + .5) + 1))."""

    def __init__(self, ids: List, texts: List[str]):
        self.ids = list(ids)
        self.docs = [t.lower().split() for t in texts]
        self.doc_len = np.array([len(d) for d in self.docs], dtype=np.float64)
        self.avgdl = float(self.doc_len.mean()) if len(self.docs) else 0.0
        self.n = len(self.docs)
        df: Counter = Counter()
        self.tf: List[Dict[str, int]] = []
        for d in self.docs:
            c = Counter(d)
            self.tf.append(dict(c))
            for tok in c:
                df[tok] += 1
        self.idf = {t: math.log((self.n - f + 0.5) / (f + 0.5) + 1)
                    for t, f in df.items()}

    def score(self, query_tokens: List[str], doc_idx: int) -> float:
        tf = self.tf[doc_idx]
        dl = self.doc_len[doc_idx]
        s = 0.0
        for t in query_tokens:
            f = tf.get(t)
            if not f:
                continue
            s += self.idf[t] * (f * (BM25_K1 + 1)) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dl / self.avgdl))
        return s

    def topk(self, query: str, k: int) -> List[Tuple[object, float]]:
        qt = query.lower().split()
        scores = [(self.score(qt, i), self.ids[i]) for i in range(self.n)]
        scores = [(s, i) for s, i in scores if s > 0]
        scores.sort(key=lambda x: (-x[0], x[1]))
        return [(i, s) for s, i in scores[:k]]


def bm25_topk(queries_ds, corpus_ids: List, corpus_texts: List[str],
              query_col: str = 'label', k: int = 4,
              concurrency: Optional[Tuple[int, int]] = None):
    """Per-query BM25 top-k: the index is built ONCE PER ACTOR from the
    broadcast corpus (reference builds fastbm25 once; per-actor replication
    is the documented ST8 scale answer — shard the corpus per actor when the
    label dim outgrows one object)."""
    corpus_ref = ray.put((list(corpus_ids), list(corpus_texts)))

    class Searcher:
        def __init__(self):
            ids, texts = ray.get(corpus_ref)
            self.index = BM25Index(ids, texts)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out_q, out_id, out_s = [], [], []
            for q in batch[query_col]:
                for did, s in self.index.topk(q, k):
                    out_q.append(q)
                    out_id.append(did)
                    out_s.append(round(s, 6))
            return pd.DataFrame({query_col: out_q, 'doc_id': out_id,
                                 'bm25': out_s})

    return queries_ds.map_batches(Searcher, batch_format='pandas',
                                  batch_size=AGG_BATCH_SIZE,
                                  concurrency=concurrency or _pool_size())


# --- J7: candidate generation ----------------------------------------------

def _topk_idx(scores: np.ndarray, tiebreak: np.ndarray, k: int) -> np.ndarray:
    """Top-k indices by (score desc, tiebreak asc) — identical result to a
    full ``np.lexsort((tiebreak, -scores))[:k]`` at O(E + t log t) instead
    of O(E log E) per call (t = k + boundary ties): argpartition to the
    k-th value, keep every score ≥ it (so boundary ties break exactly like
    the full sort), lexsort only that slice."""
    n = len(scores)
    if k >= n:
        cand = np.arange(n)
    else:
        kth = np.partition(-scores, k - 1)[k - 1]
        cand = np.where(-scores <= kth)[0]
    return cand[np.lexsort((tiebreak[cand], -scores[cand]))][:k]

def me_candidates_topk(mentions_ds, entity_ids: np.ndarray,
                       entity_mat: np.ndarray, k: int = 4,
                       mention_vec_col: str = 'embedding',
                       mention_id_col: str = 'mention_uid',
                       min_score: float = 0.0):
    """Mention→entity candidates: top-k entities by cosine per mention
    (reference ANN ME candidates, transformer_util.py:75-89 — here the
    normalized entity matrix is broadcast once and each batch does one
    matmul; an ANN index per actor is the same interface). Emits
    (mention_id, entity_id, score) with score ≥ min_score."""
    from ..state.broadcast import get_broadcast
    mat = np.asarray(entity_mat, dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    state = ray.put((np.asarray(entity_ids), mat))

    eid_dtype = np.asarray(entity_ids).dtype

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            # derive dtypes from the inputs — hardcoded int64 would emit
            # schema-divergent blocks for string/other id columns
            mdt = batch[mention_id_col].dtype \
                if mention_id_col in batch.columns else 'int64'
            return pd.DataFrame({mention_id_col: pd.Series(dtype=mdt),
                                 'entity_id': pd.Series(dtype=eid_dtype),
                                 'score': pd.Series(dtype='float64')})
        ids, emat = get_broadcast(state)
        q = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch[mention_vec_col]])
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ emat.T
        out_m, out_e, out_s = [], [], []
        kk = min(k, sims.shape[1])
        mids = batch[mention_id_col].to_numpy()
        for i in range(sims.shape[0]):
            idx = _topk_idx(sims[i], ids, kk)
            for j in idx:
                if sims[i][j] >= min_score:
                    out_m.append(mids[i])
                    out_e.append(ids[j])
                    out_s.append(round(float(sims[i][j]), 6))
        return pd.DataFrame({mention_id_col: out_m, 'entity_id': out_e,
                             'score': np.array(out_s, dtype=np.float64)})

    return mentions_ds.map_batches(score_batch, batch_format='pandas',
                                   batch_size=AGG_BATCH_SIZE)


def mm_candidates(mentions_ds, group_col: str = 'norm_surface',
                  id_col: str = 'mention_uid'):
    """Mention↔mention candidates via shared group key (J7, reference
    lexical.py:22-58): per-surface star pairs to the min mention — n−1
    edges per group, so the star to ALL members is already linear and the
    component semantics are exact. (An earlier max_group cap silently
    orphaned members past the cap into singleton components.)"""
    from .relational import grouped_map

    def star(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        uids = np.sort(g[id_col].unique())
        if len(uids) < 2:
            return None
        return pd.DataFrame({'a': np.full(len(uids) - 1, uids[0], dtype=np.int64),
                             'b': uids[1:].astype(np.int64)})

    return grouped_map(mentions_ds.select_columns([group_col, id_col]),
                       [group_col], star)


# --- ST7: cross-encoder rerank ----------------------------------------------

class CrossEncoderReranker:
    """Pair-scoring actor (ST7 interface; reference crossencoder.py:81-104:
    distilbert pair scorer, batch 128). The deterministic stand-in scores a
    (mention_label, entity_label) pair by hash-embedding cosine with an
    exact-match bonus — monotone in label agreement, so argmax behavior
    matches what the real scorer would be trained toward."""

    def __init__(self, mention_col: str = 'label', entity_col: str = 'entity_label',
                 dim: int = 64):
        self.mention_col = mention_col
        self.entity_col = entity_col
        self.dim = dim
        # per-actor embedding memo: the linker scores each mention against
        # k candidates (k redundant mention embeds) and entity labels
        # repeat across every batch (the dim is bounded) — same floats,
        # just computed once. Capped so unbounded mention streams cannot
        # grow actor heap; eviction clears wholesale (regrows in one batch)
        self._memo: dict = {}

    def _emb(self, text: str) -> np.ndarray:
        v = self._memo.get(text)
        if v is None:
            if len(self._memo) >= 65536:
                self._memo.clear()
            v = self._memo[text] = hash_embed(text, self.dim)
        return v

    def score_pair(self, mention_label: str, entity_label: str) -> float:
        if not mention_label or not entity_label:
            return 0.0
        if mention_label.lower() == entity_label.lower():
            return 1.0
        cos = float(self._emb(mention_label) @ self._emb(entity_label))
        return round(0.5 + 0.5 * max(cos, -1.0) * 0.99, 6)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch['ce_score'] = [self.score_pair(m, e)
                             for m, e in zip(batch[self.mention_col],
                                             batch[self.entity_col])]
        return batch


def rerank_candidates(pairs_ds, mention_id_col: str = 'mention_uid',
                      mention_col: str = 'label',
                      entity_col: str = 'entity_label',
                      concurrency: Optional[Tuple[int, int]] = None,
                      batch_size: int = 128,
                      reranker_cls: type = CrossEncoderReranker,
                      num_gpus: Optional[float] = None):
    """Score every candidate pair (actor pool, batch 128 as the reference)
    then keep the argmax entity per mention (ties → lexicographically first
    entity label). Returns (mention_id, entity_label, ce_score).
    ``reranker_cls``: any (mention_col, entity_col) pair-scoring actor —
    the constructor-swap seam (TransformerCrossScorer is the proved
    real-model instance). ``num_gpus``: per-actor GPU share (the
    reference's cross-encoder runs batch 128 on GPU,
    matching/crossencoder.py:81-104)."""
    from .relational import bucketed_map
    kw = {} if num_gpus is None else {'num_gpus': num_gpus}
    scored = pairs_ds.map_batches(
        reranker_cls,
        fn_constructor_kwargs={'mention_col': mention_col, 'entity_col': entity_col},
        batch_format='pandas', batch_size=batch_size,
        concurrency=concurrency or _pool_size(), **kw)

    def argmax(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sort_values([mention_id_col, 'ce_score', entity_col],
                               ascending=[True, False, True], kind='mergesort')
        s = s.drop_duplicates(subset=[mention_id_col], keep='first')
        return s[[mention_id_col, entity_col, 'ce_score']]

    return bucketed_map(scored, [mention_id_col], argmax)


# --- full scored-linking path ----------------------------------------------

def link_mentions_scored(mentions_ds, entity_labels: List[str], k: int = 4,
                         dim: int = 64,
                         embedder_factory=None, reranker_factory=None):
    """The complete ED stack as a linking stage: embed mentions (ST4) →
    ME candidate top-k vs the broadcast entity matrix (J7/ST5) → cross-
    encoder rerank argmax (ST7) → (entity, link_score) columns with the
    ``link_mentions`` output contract. Wikilinked mentions keep their
    target (score 1.0); a mention stays NIL only when the entity dim is
    empty or its label is empty (score_pair 0.0 beats nothing) — every
    other unlinked mention carries its argmax candidate with its RAW ce
    score. Acceptance thresholding is downstream (me_threshold in
    canonicalize, .95 as the reference), exactly as the reference scores
    all pairs and thresholds later; consumers must not treat a returned
    entity as accepted without applying their threshold.

    ``entity_labels``: the known-entity dim (small side, broadcast once).

    ``embedder_factory`` / ``reranker_factory``: zero-arg callables
    returning an ``embed_batch(texts) -> (n, d)`` embedder and a
    ``score_pair(m, e) -> float`` scorer — the constructor-swap seam. The
    defaults are the deterministic stand-ins; the factories run once on
    the driver (to embed the small entity dim) and once per ACTOR, so a
    real model loads per worker, never per batch. The swap is proved
    end-to-end in tests/test_tiny_transformer.py with a real numpy
    transformer (multi-head attention forward pass)."""
    if embedder_factory is None:
        embedder_factory = lambda: HashEmbedder(dim=dim)   # noqa: E731
    if reranker_factory is None:
        reranker_factory = lambda: CrossEncoderReranker(dim=dim)   # noqa: E731
    ents = sorted(set(e for e in entity_labels if e))
    if not ents:
        # no known-entity dim: wikilinked mentions still keep their target
        # at score 1.0 (the documented contract); only unlinked go NIL
        def nil(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            linked = out['name'].notna()
            out['entity'] = out['name'].where(linked, None)
            out['link_score'] = np.where(linked, 1.0, 0.0)
            return out
        return mentions_ds.map_batches(nil, batch_format='pandas')

    emat = embedder_factory().embed_batch(ents)
    emat = emat / np.maximum(np.linalg.norm(emat, axis=1, keepdims=True), 1e-12)
    labels_arr = np.array(ents, dtype=object)
    state = ray.put((labels_arr, emat))

    class ScoredLinker:
        """One actor = embedder + candidate matmul + reranker (fused: the
        stand-ins are cheap; with real models wire the three actor-pool
        stages — embed_texts → me_candidates_topk → rerank_candidates —
        yourself; ce-score ties break to the lexicographically-first
        entity label, the same rule rerank_candidates applies)."""

        def __init__(self):
            self.labels, self.emat = ray.get(state)
            self.emb = embedder_factory()
            self.rr = reranker_factory()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                out = batch.copy()
                out['entity'] = pd.Series(dtype=object)
                out['link_score'] = pd.Series(dtype='float64')
                return out
            q = self.emb.embed_batch(list(batch['label']))
            sims = q @ self.emat.T
            entities: List[Optional[str]] = []
            scores: List[float] = []
            kk = min(k, sims.shape[1])
            for i, (name, label) in enumerate(zip(batch['name'], batch['label'])):
                if name is not None and not (isinstance(name, float) and np.isnan(name)):
                    entities.append(name)
                    scores.append(1.0)
                    continue
                idx = _topk_idx(sims[i], self.labels, kk)
                best_e, best_s = None, 0.0
                for j in idx:
                    ce = self.rr.score_pair(label or '', str(self.labels[j]))
                    if ce > best_s or (ce == best_s and best_e is not None
                                       and str(self.labels[j]) < best_e):
                        best_e, best_s = str(self.labels[j]), ce
                entities.append(best_e)
                scores.append(round(best_s, 6) if best_e is not None else 0.0)
            batch['entity'] = entities
            batch['link_score'] = scores
            return batch

    return mentions_ds.map_batches(ScoredLinker, batch_format='pandas',
                                   batch_size=AGG_BATCH_SIZE,
                                   concurrency=_pool_size())


def link_mentions_scored_sharded(mentions_ds, names_ds, k: int = 4,
                                 dim: int = 64, embedder_factory=None,
                                 reranker_factory=None,
                                 max_cached_shards: int = 8):
    """``link_mentions_scored`` for an entity-name dim too large to collect
    to the driver: the DISTINCT names stay in the object store as block
    shards (``names_ds`` — one globally-distinct ``name`` column), and each
    linker actor streams mention batches against the shards, merging
    per-shard top-k into the exact global top-k (same (score desc, label
    asc) comparator as ``_topk_idx``, so the candidate SET — and therefore
    every emitted link — is bit-identical to the broadcast variant; pinned
    by tests).

    Shard embeddings are PRECOMPUTED: one distributed pass embeds each
    name shard exactly once (one remote task per shard — an embed-call
    counter pins this in tests) and ray.puts the normalized (labels, emat)
    pair, so linker actors only ever FETCH embedded shards from the object
    store — never re-embed. Before this, shards beyond the LRU budget were
    re-embedded per mention batch: O(batches × shards) embed calls in
    exactly the over-budget regime that exists because the corpus is huge.
    Per-actor heap stays bounded by ``max_cached_shards`` embedded shards
    (LRU); evicted shards cost a re-FETCH (plasma, zero-copy float64), not
    a re-embed. At 10^12 rows prefer the IVF/LSH candidate path
    (similarity.py) when approximate candidates are acceptable."""
    if embedder_factory is None:
        embedder_factory = lambda: HashEmbedder(dim=dim)   # noqa: E731
    if reranker_factory is None:
        reranker_factory = lambda: CrossEncoderReranker(dim=dim)   # noqa: E731

    mat = names_ds.materialize()
    n_names = mat.count()
    if n_names == 0:
        def nil(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            linked = out['name'].notna()
            out['entity'] = out['name'].where(linked, None)
            out['link_score'] = np.where(linked, 1.0, 0.0)
            return out
        return mentions_ds.map_batches(nil, batch_format='pandas')
    # block refs only — the driver never holds the names themselves; the
    # refs are captured in the actor closure (Ray refcounts nested refs)
    shard_refs = mat.to_pandas_refs()
    kk = min(k, n_names)

    @ray.remote
    def _embed_shard(df: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
        emb = embedder_factory()
        labels = df['name'].to_numpy(dtype=object)
        if not len(labels):
            return labels, np.empty((0, dim), dtype=np.float64)
        emat = emb.embed_batch([str(x) for x in labels])
        emat = emat / np.maximum(
            np.linalg.norm(emat, axis=1, keepdims=True), 1e-12)
        return labels, emat

    # ONE embed per shard, cluster-wide; the returned refs live in plasma
    # and are captured (and refcounted) in the actor closure below
    embedded_refs = [_embed_shard.remote(r) for r in shard_refs]

    class ShardedScoredLinker:
        def __init__(self):
            self.emb = embedder_factory()
            self.rr = reranker_factory()
            self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
            self._lru: List[int] = []

        def _shard(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
            got = self._cache.get(i)
            if got is not None:
                self._lru.remove(i)
                self._lru.append(i)
                return got
            labels, emat = ray.get(embedded_refs[i])
            if len(self._lru) >= max_cached_shards:
                self._cache.pop(self._lru.pop(0), None)
            self._cache[i] = (labels, emat)
            self._lru.append(i)
            return labels, emat

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                out = batch.copy()
                out['entity'] = pd.Series(dtype=object)
                out['link_score'] = pd.Series(dtype='float64')
                return out
            q = self.emb.embed_batch(list(batch['label']))
            n = len(batch)
            # running global top-k per mention across shards: merging each
            # shard's top-k under the same comparator yields exactly the
            # full-matrix top-k (any global winner wins its shard too)
            cand_s = [np.empty(0, dtype=np.float64) for _ in range(n)]
            cand_l = [np.empty(0, dtype=object) for _ in range(n)]
            need = np.array([x is None or (isinstance(x, float) and np.isnan(x))
                             for x in batch['name']], dtype=bool)
            for si in range(len(shard_refs)):
                labels, emat = self._shard(si)
                if not len(labels):
                    continue
                sims = q @ emat.T
                ks = min(kk, len(labels))
                for i in np.where(need)[0]:
                    idx = _topk_idx(sims[i], labels, ks)
                    s = np.concatenate([cand_s[i], sims[i][idx]])
                    l = np.concatenate([cand_l[i], labels[idx]])
                    keep = np.lexsort((l, -s))[:kk]
                    cand_s[i], cand_l[i] = s[keep], l[keep]
            entities: List[Optional[str]] = []
            scores: List[float] = []
            for i, (name, label) in enumerate(zip(batch['name'],
                                                  batch['label'])):
                if not need[i]:
                    entities.append(name)
                    scores.append(1.0)
                    continue
                best_e, best_s = None, 0.0
                for lab in cand_l[i]:
                    ce = self.rr.score_pair(label or '', str(lab))
                    if ce > best_s or (ce == best_s and best_e is not None
                                       and str(lab) < best_e):
                        best_e, best_s = str(lab), ce
                entities.append(best_e)
                scores.append(round(best_s, 6) if best_e is not None else 0.0)
            batch['entity'] = entities
            batch['link_score'] = scores
            return batch

    return mentions_ds.map_batches(ShardedScoredLinker, batch_format='pandas',
                                   batch_size=AGG_BATCH_SIZE,
                                   concurrency=_pool_size())


def md_predict_tokens(items_ds, model_weights=None, head=None,
                      tokens_col: str = 'tokens',
                      out_col: str = 'md_tags', concurrency=None,
                      batch_size: int = 500,
                      num_gpus: Optional[float] = None):
    """Distributed mention-detection inference with the TRAINED token
    classifier (the GPU-batch-inference slot of the reference,
    mention_detection/__init__.py:90-101, PREDICTION_BATCH_SIZE=500):
    an actor pool whose workers rebuild the TokenClassifier ONCE in
    ``__init__`` from the broadcast trained weights (``model_weights`` =
    the TinyTransformer state dict from ``snapshot_weights``; ``head`` =
    the trained (D, 2) readout) and tag every item's tokens per batch.
    Adds ``out_col``: list<int64> of 0/1 subject-token tags per row."""
    import ray as _ray

    from ..functions.train_transformer import (TokenClassifier,
                                               restore_weights)
    ref = _ray.put((model_weights, head))

    class MdTagger:
        def __init__(self):
            from ..state.broadcast import get_broadcast
            weights, hd = get_broadcast(ref)
            model = restore_weights(weights)
            if hd is None:   # untrained seam: seeded readout
                rng = np.random.RandomState(14)
                hd = rng.randn(model.dim, 2) / np.sqrt(model.dim)
            self.clf = TokenClassifier(model, np.asarray(hd))

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            out[out_col] = self.clf.predict_batch(
                [list(t) for t in batch[tokens_col]])
            return out

    kw = {} if num_gpus is None else {'num_gpus': num_gpus}
    return items_ds.map_batches(MdTagger, batch_format='pandas',
                                batch_size=batch_size,
                                concurrency=concurrency or _pool_size(),
                                **kw)
