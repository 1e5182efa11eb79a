"""Similarity search over embedding columns (SURVEY.md additions; analogue of
the reference's ANN/exact top-k search ST5/ST6, transformer_util.py:48-89).

* brute-force cosine top-k: broadcast query matrix, per-batch matmul +
  partial top-k, final merge of (batches × k) partials on the driver —
  the exact baseline.
* LSH-bucketed variant: random-hyperplane signatures shrink the candidate
  set; same verify; approximate (documented recall/efficiency trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def brute_force_topk(emb_ds, query_vecs: np.ndarray, k: int = 10,
                     id_col: str = 'vec_id', vec_col: str = 'embedding',
                     round_decimals: int = 6) -> pd.DataFrame:
    """Exact cosine top-k per query. Returns (query_idx, vec_id, score)
    sorted by (query_idx, -score, vec_id); ties broken by vec_id asc."""
    from ..state.broadcast import get_broadcast
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put(q)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                                 id_col: pd.Series(dtype='int64'),
                                 'score': pd.Series(dtype='float64')})
        qm = get_broadcast(qref)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        mat = _normalize(mat)
        sims = qm @ mat.T                         # (n_queries, batch)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # stable partial top-k: score desc, id asc
            idx = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx])
            out_s.extend(sims[qi][idx])
        return pd.DataFrame({'query_idx': np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_id, dtype=np.int64),
                             'score': np.array(out_s, dtype=np.float64)})

    # stateless tasks + process-local broadcast cache: no actor-pool cap,
    # parallelism follows the block count up to every core available
    partials = emb_ds.map_batches(partial_topk, batch_format='pandas',
                                  batch_size=4096)
    from .relational import collect_pandas
    df = collect_pandas(partials)
    if df.empty:
        return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                             id_col: pd.Series(dtype='int64'),
                             'score': pd.Series(dtype='float64')})
    df = df.sort_values(['query_idx', 'score', id_col],
                        ascending=[True, False, True], kind='mergesort')
    df = df.groupby('query_idx', group_keys=False).head(k).reset_index(drop=True)
    df['score'] = df['score'].round(round_decimals)
    return df


class HyperplaneLSH:
    """Random-hyperplane signatures for cosine LSH (seeded). Planes are
    unit-normalized and the sign test runs on the ROUNDED (6-decimal)
    projection of a normalized input — i.e. the bit is
    ``round(cos(v̂, ŵ), 6) > 0`` — so an engine replaying the planes as
    constants (the lsh_topk SQL oracle uses list_cosine_similarity)
    computes the identical signature with no last-ulp sign flips."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11):
        rng = np.random.RandomState(seed)
        planes = rng.normal(size=(n_planes, dim))
        self.planes = planes / np.linalg.norm(planes, axis=1, keepdims=True)

    def signature(self, mat: np.ndarray) -> np.ndarray:
        """``mat`` rows must be unit-normalized (the rounded-sign contract
        is not scale-invariant, unlike the raw sign)."""
        bits = np.round(mat @ self.planes.T, 6) > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return bits.astype(np.int64) @ weights


class LshIndex:
    """An ACTUAL sub-linear LSH index (ST5, the hnswlib role): corpus
    vectors grouped into signature buckets once; a query probes only its
    own signature plus every signature within ``probe_hamming`` bit flips
    (multi-probe), scoring just those candidates — work per query scales
    with bucket sizes, not corpus size. Built once per actor/process from
    the broadcast corpus (reference builds hnswlib once,
    transformer_util.py:75-89; shard the corpus per actor when it outgrows
    one object)."""

    def __init__(self, ids: np.ndarray, mat: np.ndarray, n_planes: int = 12,
                 seed: int = 11):
        self.lsh = HyperplaneLSH(mat.shape[1], n_planes, seed)
        self.n_planes = n_planes
        self.ids = np.asarray(ids)
        self.mat = _normalize(np.asarray(mat, dtype=np.float64))
        sigs = self.lsh.signature(self.mat)
        order = np.argsort(sigs, kind='stable')
        sorted_sigs = sigs[order]
        uniq, starts = np.unique(sorted_sigs, return_index=True)
        bounds = np.append(starts, len(sorted_sigs))
        self.buckets = {int(s): order[bounds[i]:bounds[i + 1]]
                        for i, s in enumerate(uniq)}

    def _probe_sigs(self, sig: int, probe_hamming: int):
        from itertools import combinations
        yield sig
        for r in range(1, probe_hamming + 1):
            for flips in combinations(range(self.n_planes), r):
                m = 0
                for f in flips:
                    m |= 1 << f
                yield sig ^ m

    def query(self, vec: np.ndarray, k: int, probe_hamming: int = 1):
        """(ids, scores) of the top-k among probed buckets (score desc,
        id asc)."""
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        sig = int(self.lsh.signature(v[None, :])[0])
        cand_idx = [self.buckets[s] for s in self._probe_sigs(sig, probe_hamming)
                    if s in self.buckets]
        if not cand_idx:
            return np.array([], dtype=self.ids.dtype), np.array([])
        cand = np.unique(np.concatenate(cand_idx))
        # rank on the ROUNDED similarity (engine-independent tie-breaks,
        # same 6-decimal rule as ivf_topk)
        sims = np.round(self.mat[cand] @ v, 6)
        order = np.lexsort((self.ids[cand], -sims))[:k]
        return self.ids[cand][order], sims[order]


# process-level cache: one LshIndex build per worker PROCESS (a
# closure-local dict would be reserialized per task, rebuilding the index
# for every task and voiding the sub-linearity claim). ONE entry only —
# keyed caching would retain a full corpus copy per distinct corpus ever
# queried in every long-lived worker, a monotonic leak.
_IDX_CACHE: dict = {}


def _cached_index(key: str, build):
    if _IDX_CACHE.get('key') != key:
        _IDX_CACHE['key'] = key
        _IDX_CACHE['idx'] = build()
    return _IDX_CACHE['idx']


def lsh_index_topk(emb_ds, query_vecs: np.ndarray, k: int = 10,
                   n_planes: int = 12, id_col: str = 'vec_id',
                   vec_col: str = 'embedding', round_decimals: int = 6,
                   probe_hamming: int = 1) -> pd.DataFrame:
    """Approximate cosine top-k through the ACTUAL LshIndex: the corpus is
    broadcast once, each worker process builds the bucket index once
    (process-local cache), and queries probe buckets — per-query work is
    sub-linear in corpus size. Output shape matches brute_force_topk."""
    import ray
    from ..state.broadcast import get_broadcast
    from .relational import collect_rows
    rows = collect_rows(emb_ds.select_columns([id_col, vec_col]))
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    corpus_ref = ray.put((ids, mat))
    q = np.asarray(query_vecs, dtype=np.float64)
    qref = ray.put(q)
    import ray.data as rd
    queries = rd.from_pandas(pd.DataFrame({'query_idx': np.arange(len(q))}))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        def build():
            cids, cmat = get_broadcast(corpus_ref)
            return LshIndex(cids, cmat, n_planes)
        index = _cached_index(corpus_ref.hex(), build)
        qm = get_broadcast(qref)
        out_q, out_id, out_s = [], [], []
        for qi in batch['query_idx']:
            hit_ids, scores = index.query(qm[int(qi)], k, probe_hamming)
            out_q.extend([int(qi)] * len(hit_ids))
            out_id.extend(hit_ids)
            out_s.extend(np.round(scores, round_decimals))
        return pd.DataFrame({'query_idx': np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_id, dtype=np.int64),
                             'score': np.array(out_s, dtype=np.float64)})

    return queries.map_batches(probe, batch_format='pandas').to_pandas() \
        .sort_values(['query_idx', 'score', id_col],
                     ascending=[True, False, True],
                     kind='mergesort').reset_index(drop=True)


def lsh_topk(emb_ds, query_vecs: np.ndarray, k: int = 10, n_planes: int = 12,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             round_decimals: int = 6, probe_hamming: int = 1) -> pd.DataFrame:
    """Approximate cosine top-k, scan form: only corpus vectors whose
    hyperplane signature is within `probe_hamming` bits of the query
    signature are scored — O(N) per query batch but fully distributed with
    no index object. Prefer ``lsh_index_topk`` (sub-linear probing) when
    the corpus fits the broadcast budget. Same output shape (recall < 1)."""
    from ..state.broadcast import get_broadcast
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = q.shape[1]
    lsh = HyperplaneLSH(dim, n_planes)
    qsig = lsh.signature(q)
    state = ray.put((q, qsig, lsh.planes))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                                 id_col: pd.Series(dtype='int64'),
                                 'score': pd.Series(dtype='float64')})
        qm, qsigs, planes = get_broadcast(state)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        mat = _normalize(mat)
        bits = np.round(mat @ planes.T, 6) > 0   # same sign rule as LshIndex
        sig = bits.astype(np.int64) @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            ham = np.array([bin(int(s) ^ int(qsigs[qi])).count('1') for s in sig])
            cand = np.where(ham <= probe_hamming)[0]
            if len(cand) == 0:
                continue
            sims = np.round(mat[cand] @ qm[qi], 6)
            kk = min(k, len(cand))
            idx = np.lexsort((ids[cand], -sims))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[cand][idx])
            out_s.extend(sims[idx])
        return pd.DataFrame({'query_idx': np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_id, dtype=np.int64),
                             'score': np.array(out_s, dtype=np.float64)})

    partials = emb_ds.map_batches(score_batch, batch_format='pandas',
                                  batch_size=4096)
    from .relational import collect_pandas
    df = collect_pandas(partials)
    if df.empty:   # typed empty frame, same schema as the other topk fns
        return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                             id_col: pd.Series(dtype='int64'),
                             'score': pd.Series(dtype='float64')})
    df = df.sort_values(['query_idx', 'score', id_col],
                        ascending=[True, False, True], kind='mergesort')
    df = df.groupby('query_idx', group_keys=False).head(k).reset_index(drop=True)
    df['score'] = df['score'].round(round_decimals)
    return df


def ivf_topk(emb_ds, query_vecs: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             round_decimals: int = 4) -> pd.DataFrame:
    """IVF-style approximate top-k: the scale path of the ANN family.

    Deterministic coarse quantizer so the whole algorithm is replayable in
    SQL: the centroids are the corpus vectors with the ``n_centroids``
    smallest ids; every corpus vector is assigned to its argmax-cosine
    centroid (ties → smaller centroid id) building inverted lists; a query
    probes its ``nprobe`` best centroids and scans ONLY their lists —
    per-query work is |corpus| × nprobe / n_centroids on average. A real
    deployment swaps the id-prefix centroids for k-means centroids; the
    distributed shape (broadcast centroids + one assignment map + masked
    partial top-k per batch, no shuffle) is identical.

    Output shape matches brute_force_topk: (query_idx, vec_id, score)."""
    import ray

    from ..state.broadcast import get_broadcast
    from .relational import collect_pandas, collect_rows

    crows = collect_rows(
        emb_ds.map_batches(
            lambda t: t.filter(pa.compute.less(t.column(id_col),
                                               pa.scalar(n_centroids))),
            batch_format='pyarrow').select_columns([id_col, vec_col]))
    if not crows:
        raise ValueError(
            f'ivf_topk centroid contract: no corpus rows with {id_col} < '
            f'{n_centroids} — the deterministic quantizer takes the id-prefix '
            'vectors as centroids; re-id the corpus or lower n_centroids')
    crows.sort(key=lambda r: r[id_col])
    cids = np.array([r[id_col] for r in crows], dtype=np.int64)
    cmat = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                                for r in crows]))
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    # probe set per query: top-nprobe centroids by (cosine desc, cid asc).
    # All similarities that feed an argmax / rank / cut are rounded to 6
    # decimals FIRST, identically to the SQL oracle: a last-ulp float64
    # difference between numpy matmul and an engine's cosine kernel near an
    # assignment tie must not flip inverted-list membership or the top-k
    # row set (tie-breaks then resolve by id on both sides)
    probes = []
    qsims = np.round(q @ cmat.T, 6)
    for qi in range(len(q)):
        order = np.lexsort((cids, -qsims[qi]))[:nprobe]
        probes.append(frozenset(int(cids[i]) for i in order))
    state_ref = ray.put((cids, cmat, q, probes))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                                 id_col: pd.Series(dtype='int64'),
                                 'score': pd.Series(dtype='float64')})
        cids_, cmat_, qm, probes_ = get_broadcast(state_ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                   for v in batch[vec_col]]))
        # assignment: argmax of ROUNDED cosine, ties → smaller centroid id
        # (cids are sorted asc so argmax picks the first = smallest on ties)
        assign = cids_[np.argmax(np.round(mat @ cmat_.T, 6), axis=1)]
        sims = np.round(qm @ mat.T, 6)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            mask = np.isin(assign, list(probes_[qi]))
            if not mask.any():
                continue
            ids_m, sims_m = ids[mask], sims[qi][mask]
            idx = np.lexsort((ids_m, -sims_m))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids_m[idx])
            out_s.extend(sims_m[idx])
        return pd.DataFrame({'query_idx': np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_id, dtype=np.int64),
                             'score': np.array(out_s, dtype=np.float64)})

    partials = emb_ds.map_batches(scan, batch_format='pandas', batch_size=4096)
    df = collect_pandas(partials)
    if df.empty:
        return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                             id_col: pd.Series(dtype='int64'),
                             'score': pd.Series(dtype='float64')})
    df = df.sort_values(['query_idx', 'score', id_col],
                        ascending=[True, False, True], kind='mergesort')
    df = df.groupby('query_idx', group_keys=False).head(k).reset_index(drop=True)
    df['score'] = df['score'].round(round_decimals)
    return df


def kmeans_centroids(emb_ds, n_centroids: int = 8, n_iters: int = 2,
                     id_col: str = 'vec_id', vec_col: str = 'embedding'):
    """Distributed Lloyd iterations for IVF centroid TRAINING (the 'real
    deployment swaps the id-prefix centroids for k-means centroids' path
    the ivf_topk docstring promises). Cosine assignment, element-wise-mean
    update:

    * init = the ``n_centroids`` smallest-id corpus vectors (deterministic,
      same contract as ivf_topk's quantizer);
    * each iteration is ONE stateless ``map_batches`` pass: per batch,
      assign rows to argmax ROUNDED cosine (6dp, ties → smaller centroid
      index — the ivf tie rule) and emit per-centroid partial (sum, n)
      rows; the K×D partials reduce on the driver (K is dim-sized);
    * empty clusters keep their previous centroid.

    Returns (centroids ndarray [K×D], assign_fn) where assign_fn(batch
    DataFrame) → int64 centroid indices — feed the matrix to ivf_topk-style
    probing or use ``kmeans_assignments`` for the labeled Dataset."""
    import ray

    from ..state.broadcast import get_broadcast
    from .relational import collect_pandas, collect_rows

    crows = collect_rows(
        emb_ds.map_batches(
            lambda t: t.filter(pa.compute.less(t.column(id_col),
                                               pa.scalar(n_centroids))),
            batch_format='pyarrow').select_columns([id_col, vec_col]))
    if not crows:
        raise ValueError('kmeans init contract: need corpus rows with '
                         f'{id_col} < {n_centroids}')
    crows.sort(key=lambda r: r[id_col])
    cmat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in crows])

    def assign_rounded(mat: np.ndarray, cm: np.ndarray) -> np.ndarray:
        sims = np.round(_normalize(mat) @ _normalize(cm).T, 6)
        return np.argmax(sims, axis=1)   # ties → smaller index (first max)

    for _ in range(int(n_iters)):
        ref = ray.put(cmat)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({'c': pd.Series(dtype='int64'),
                                     's': pd.Series(dtype=object),
                                     'n': pd.Series(dtype='int64')})
            cm = get_broadcast(ref)
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in batch[vec_col]])
            a = assign_rounded(mat, cm)
            rows = []
            for j in np.unique(a):
                sel = mat[a == j]
                rows.append({'c': int(j), 's': sel.sum(axis=0),
                             'n': int(len(sel))})
            return pd.DataFrame(rows)

        p = collect_pandas(emb_ds.map_batches(partials,
                                              batch_format='pandas',
                                              batch_size=4096))
        new = cmat.copy()
        for j in range(len(cmat)):
            rows = p[p['c'] == j]
            if len(rows):
                total = np.sum(np.stack(list(rows['s'])), axis=0)
                new[j] = total / rows['n'].sum()
        cmat = new

    def assign_fn(batch: pd.DataFrame) -> np.ndarray:
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in batch[vec_col]])
        return assign_rounded(mat, cmat).astype(np.int64)

    return cmat, assign_fn


def kmeans_assignments(emb_ds, n_centroids: int = 8, n_iters: int = 2,
                       id_col: str = 'vec_id', vec_col: str = 'embedding'):
    """(id, centroid) Dataset after ``n_iters`` Lloyd iterations — the
    trained inverted-list membership (one final stateless pass)."""
    import ray

    from ..state.broadcast import get_broadcast
    cmat, _ = kmeans_centroids(emb_ds, n_centroids, n_iters,
                               id_col=id_col, vec_col=vec_col)
    ref = ray.put(cmat)

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({id_col: pd.Series(dtype='int64'),
                                 'centroid': pd.Series(dtype='int64')})
        cm = get_broadcast(ref)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in batch[vec_col]])
        sims = np.round(_normalize(mat) @ _normalize(cm).T, 6)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            'centroid': np.argmax(sims, axis=1).astype(np.int64)})

    return emb_ds.map_batches(label, batch_format='pandas', batch_size=4096)


# --- int8 quantized similarity (scale path: 4x smaller resident corpus) -----

def quantize_int8(mat: np.ndarray) -> np.ndarray:
    """Exact-integer int8 quantization of the L2-NORMALIZED vector,
    computed entirely in integer space so any engine replays it
    bit-identically (no float rounding-mode divergence — the ivf/lsh
    lesson applied upfront).

        m_i  = floor(|v_i| * 1e6)                 (exact single IEEE ops)
        s    = isqrt(Σ m_i²)                      (exact integer sqrt)
        q_i  = sign(v_i) * (m_i * 127 // max(s, 1))   ∈ [-127, 127]

    Scaling by the integer L2 norm (not the earlier per-vector max-abs)
    makes q ≈ 127 · v/‖v‖, so int dot products approximate 127²·cosine
    with NO per-vector scale factor — max-abs scaling multiplied every
    corpus vector's score by its own ‖·‖₂/‖·‖∞ ratio, which systematically
    re-ranked clustered corpora (recall@10 collapsed to ~0.12 on a
    16-cluster corpus; ~0.95+ after this fix — tools/ann_recall.py).
    The isqrt is float sqrt + a one-step integer correction, exact for
    Σ m_i² < 2⁵³ (64-dim unit-ish vectors: ~5e17 at |v_i| ≤ 90 — inside
    int64 and correctable); the SQL twin replays the same correction.
    A zero vector quantizes to all zeros."""
    m64 = np.asarray(mat, dtype=np.float64)
    m = np.floor(np.abs(m64) * 1e6).astype(np.int64)
    n2 = (m * m).sum(axis=1, keepdims=True)
    s = np.floor(np.sqrt(n2.astype(np.float64))).astype(np.int64)
    s = s - (s * s > n2).astype(np.int64) \
        + ((s + 1) * (s + 1) <= n2).astype(np.int64)
    q = (m * 127) // np.maximum(s, 1)
    return (np.sign(m64).astype(np.int64) * q)


def quantized_topk(emb_ds, query_vecs: np.ndarray, k: int = 10,
                   id_col: str = 'vec_id', vec_col: str = 'embedding'
                   ) -> pd.DataFrame:
    """Brute-force top-k over int8-quantized vectors with EXACT int64 dot
    products — the memory-bound scale path (a 100 TB embedding corpus
    resident at 1/4 the bytes, integer SIMD matmuls). Same operator shape
    as brute_force_topk: broadcast quantized query matrix, per-batch
    partial top-k, driver merge of (blocks × k) partials. Ties: score
    desc, id asc. Returns (query_idx, vec_id, score:int64)."""
    import ray
    from ..state.broadcast import get_broadcast
    qq = quantize_int8(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put(qq)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                                 id_col: pd.Series(dtype='int64'),
                                 'score': pd.Series(dtype='int64')})
        qm = get_broadcast(qref)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in batch[vec_col]])
        dq = quantize_int8(mat)
        scores = qm @ dq.T                        # exact int64 matmul
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        kk = min(k, scores.shape[1])
        for qi in range(scores.shape[0]):
            idx = np.lexsort((ids, -scores[qi]))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx])
            out_s.extend(scores[qi][idx])
        return pd.DataFrame({'query_idx': np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_id, dtype=np.int64),
                             'score': np.array(out_s, dtype=np.int64)})

    partials = emb_ds.map_batches(partial_topk, batch_format='pandas',
                                  batch_size=4096)
    from .relational import collect_pandas
    df = collect_pandas(partials)
    if df.empty:
        return pd.DataFrame({'query_idx': pd.Series(dtype='int64'),
                             id_col: pd.Series(dtype='int64'),
                             'score': pd.Series(dtype='int64')})
    df = df.sort_values(['query_idx', 'score', id_col],
                        ascending=[True, False, True], kind='mergesort')
    return df.groupby('query_idx', group_keys=False).head(k) \
             .reset_index(drop=True)
