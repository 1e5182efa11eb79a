"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (SURVEY.md §2.7 + training-data additions).

Shapes:
* exact      — content-hash column → hash-partition groupby → min-id rep
* minhash    — signature per doc (actor pool) → explode (band, bucket) rows
               → bucket groupby → candidate pairs → Jaccard verify →
               connected components → (doc_id, dup_group)
* simhash    — 64-bit signature → bucket by 4×16-bit sub-keys (hamming≤3
               guarantees a shared sub-key) → verify hamming → CC
* ngram      — exact shingle-set Jaccard on minhash-candidate pairs
* embedding  — brute-force cosine pairs over broadcast matrix (scale path:
               LSH random-hyperplane buckets, same groupby shape)
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import (AGG_BATCH_SIZE, EMBEDDING_DUP_COSINE, MINHASH_BANDS,
                      MINHASH_NUM_PERM, MINHASH_SHINGLE_SIZE,
                      NGRAM_JACCARD_THRESHOLD, SIMHASH_HAMMING_THRESHOLD)
from ..functions.hashing import MinHasher, hamming64, jaccard, simhash64, stable_hash64
from .canonicalize import _UnionFind


def exact_dedup(docs_ds, id_col: str = 'doc_id', text_col: str = 'text'):
    """(text_hash, rep_id): one representative (min id) per identical text.
    Per-batch partial min bounds shuffle volume; coarse-bucket final merge."""
    import hashlib
    from .relational import two_phase_pandas_agg

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            'text_hash': [hashlib.md5(t.encode('utf-8')).hexdigest() for t in batch[text_col]],
            id_col: batch[id_col],
        })

    hashed = docs_ds.map_batches(add_hash, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
    return two_phase_pandas_agg(hashed, ['text_hash'], {'rep_id': (id_col, 'min')})


class _MinhashSigner:
    """Actor: permutation params built once, signatures per batch."""

    def __init__(self, id_col: str, text_col: str):
        self.mh = MinHasher(MINHASH_NUM_PERM, MINHASH_SHINGLE_SIZE, MINHASH_BANDS)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in batch[self.text_col]:
            sig = self.mh.signature([t for t in text.split(' ') if t])
            sigs.append(sig.astype(np.int64))
        return pd.DataFrame({self.id_col: batch[self.id_col], 'sig': sigs})


def minhash_signatures(docs_ds, id_col: str = 'doc_id', text_col: str = 'text'):
    return docs_ds.map_batches(
        _MinhashSigner, fn_constructor_kwargs={'id_col': id_col, 'text_col': text_col},
        batch_format='pandas', batch_size=AGG_BATCH_SIZE, concurrency=(1, 4))


_EMPTY_PAIRS = {'a': np.array([], dtype=np.int64),
                'b': np.array([], dtype=np.int64),
                'score': np.array([], dtype=np.float64)}


def _candidate_pairs_from_buckets(sig_ds, id_col: str, band_fn, verify_fn,
                                  max_bucket: int = 1000):
    """Shared LSH shape: explode (bucket_key, id, payload) → coarse-bucket
    grouped_map → per-bucket pairwise verify. Buckets are capped (sorted by
    id, deterministic): an over-full bucket means a degenerate key; only the
    first max_bucket members pair up — same contract as salting a hot key."""
    from .relational import grouped_map

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        all_keys = [band_fn(row) for _, row in batch.iterrows()]
        counts = np.fromiter((len(k) for k in all_keys), dtype=np.int64,
                             count=len(all_keys))
        return pd.DataFrame({
            id_col: np.repeat(batch[id_col].to_numpy(), counts),
            'bucket': np.concatenate(all_keys) if len(all_keys) else np.array([], dtype=object),
            'sig': [s for s, c in zip(batch['sig'], counts) for _ in range(c)],
        })

    exploded = sig_ds.map_batches(explode, batch_format='pandas', batch_size=AGG_BATCH_SIZE)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return None
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        sigs = list(g['sig'])
        a_out, b_out, score_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ok, score = verify_fn(sigs[i], sigs[j])
                if ok:
                    a_out.append(int(ids[i])); b_out.append(int(ids[j])); score_out.append(score)
        return pd.DataFrame({'a': np.array(a_out, dtype=np.int64),
                             'b': np.array(b_out, dtype=np.int64),
                             'score': np.array(score_out, dtype=np.float64)})

    found = grouped_map(exploded, ['bucket'], pairs)
    # cross-band duplicates of the same pair → keep one (coarse bucketed dedup)
    from .relational import bucketed_map
    return bucketed_map(found, ['a', 'b'],
                        lambda b: b.drop_duplicates(subset=['a', 'b']))


def minhash_candidate_pairs(docs_ds, id_col: str = 'doc_id', text_col: str = 'text',
                            jaccard_threshold: float = NGRAM_JACCARD_THRESHOLD):
    """MinHash-LSH near-dup candidate pairs verified by estimated Jaccard."""
    mh = MinHasher(MINHASH_NUM_PERM, MINHASH_SHINGLE_SIZE, MINHASH_BANDS)
    sigs = minhash_signatures(docs_ds, id_col, text_col)

    def band_fn(row):
        return [f'{i}:{h}' for i, h in enumerate(mh.band_hashes(np.asarray(row['sig'], dtype=np.uint64)))]

    def verify(sa, sb):
        est = MinHasher.estimate_jaccard(np.asarray(sa), np.asarray(sb))
        return est >= jaccard_threshold, est

    return _candidate_pairs_from_buckets(sigs, id_col, band_fn, verify)


def pairs_to_groups(pairs_ds, all_ids: Optional[List[int]] = None) -> pd.DataFrame:
    """Candidate pairs → (id, group) via union-find; group = min member id.
    Driver-side tail of the distributed CC (pairs are already heavily
    pruned); unpaired ids become singleton groups when all_ids given."""
    uf = _UnionFind()
    for r in pairs_ds.take_all():
        uf.union(int(r['a']), int(r['b']))
    members = set(uf.parent) | (set(all_ids) if all_ids else set())
    rows = sorted((i, uf.find(i)) for i in members)
    return pd.DataFrame({'doc_id': [r[0] for r in rows], 'group': [r[1] for r in rows]})


def simhash_dedup_pairs(docs_ds, id_col: str = 'doc_id', text_col: str = 'text',
                        max_hamming: int = SIMHASH_HAMMING_THRESHOLD):
    """SimHash near-dup pairs: 4×16-bit sub-key bucketing (pigeonhole over
    hamming≤3) + exact hamming verify."""
    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [np.int64(simhash64([t for t in txt.split(' ') if t]) - (1 << 63))
                for txt in batch[text_col]]
        return pd.DataFrame({id_col: batch[id_col], 'sig': sigs})

    sig_ds = docs_ds.map_batches(sign, batch_format='pandas', batch_size=AGG_BATCH_SIZE)

    def band_fn(row):
        h = int(np.uint64(np.int64(row['sig']) + (1 << 63)))
        return [f'{i}:{(h >> (16 * i)) & 0xFFFF}' for i in range(4)]

    def verify(sa, sb):
        ha = int(np.uint64(np.int64(sa) + (1 << 63)))
        hb = int(np.uint64(np.int64(sb) + (1 << 63)))
        d = hamming64(ha, hb)
        return d <= max_hamming, float(64 - d) / 64

    return _candidate_pairs_from_buckets(sig_ds, id_col, band_fn, verify)


def ngram_jaccard_pairs(docs_ds, id_col: str = 'doc_id', text_col: str = 'text',
                        n: int = MINHASH_SHINGLE_SIZE,
                        threshold: float = NGRAM_JACCARD_THRESHOLD):
    """Exact n-gram Jaccard near-dup pairs. Candidate generation via exact
    shingle-anchor buckets (rarest-shingle sampling), verification exact."""
    def shingle_sets(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in batch[text_col]:
            toks = [t for t in text.split(' ') if t]
            if len(toks) < n:
                sh = {stable_hash64(' '.join(toks))}
            else:
                sh = {stable_hash64(' '.join(toks[i:i + n])) for i in range(len(toks) - n + 1)}
            sigs.append(np.array(sorted(sh), dtype=np.int64))
        return pd.DataFrame({id_col: batch[id_col], 'sig': sigs})

    sig_ds = docs_ds.map_batches(shingle_sets, batch_format='pandas', batch_size=AGG_BATCH_SIZE)

    def band_fn(row):
        sh = np.asarray(row['sig'])
        k = max(1, int(len(sh) * (1 - threshold)) + 1)  # pigeonhole: dup pair shares one of k smallest
        return [f's:{int(h)}' for h in sh[:k]]

    def verify(sa, sb):
        a, b = set(map(int, sa)), set(map(int, sb))
        j = jaccard(a, b)
        return j >= threshold, j

    return _candidate_pairs_from_buckets(sig_ds, id_col, band_fn, verify)


def embedding_near_dup_pairs(emb_ds, id_col: str = 'vec_id', vec_col: str = 'embedding',
                             threshold: float = EMBEDDING_DUP_COSINE):
    """Cosine ≥ threshold pairs (a<b). The full normalized matrix is
    broadcast once; each batch does one matmul against it — O(N·B) flops per
    batch, zero shuffle. Scale path: random-hyperplane LSH buckets feeding
    the same verify (documented, not needed at driver scales)."""
    rows = emb_ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            q = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = q @ self.mat.T
            qa, qb, sc = [], [], []
            qids = batch[id_col].to_numpy()
            for i, qid in enumerate(qids):
                hits = np.where(sims[i] >= threshold)[0]
                for h in hits:
                    other = int(self.ids[h])
                    if other > int(qid):
                        qa.append(int(qid)); qb.append(other)
                        sc.append(round(float(sims[i][h]), 6))
            return pd.DataFrame({'a': np.array(qa, dtype=np.int64),
                                 'b': np.array(qb, dtype=np.int64),
                                 'cosine': np.array(sc, dtype=np.float64)})

    return emb_ds.map_batches(PairFinder, batch_format='pandas',
                              batch_size=1024, concurrency=(1, 4))
