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
    df = partials.to_pandas()
    df = df.sort_values(['query_idx', 'score', id_col],
                        ascending=[True, False, True], kind='mergesort')
    df = df.groupby('query_idx', group_keys=False).head(k).reset_index(drop=True)
    df['score'] = df['score'].round(round_decimals)
    return df


class HyperplaneLSH:
    """Random-hyperplane signatures for cosine LSH (seeded)."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return bits.astype(np.int64) @ weights


def lsh_topk(emb_ds, query_vecs: np.ndarray, k: int = 10, n_planes: int = 12,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             round_decimals: int = 6, probe_hamming: int = 1) -> pd.DataFrame:
    """Approximate cosine top-k: only corpus vectors whose hyperplane
    signature is within `probe_hamming` bits of the query signature are
    scored. Same output shape as brute_force_topk (recall < 1)."""
    from ..state.broadcast import get_broadcast
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = q.shape[1]
    lsh = HyperplaneLSH(dim, n_planes)
    qsig = lsh.signature(q)
    state = ray.put((q, qsig, lsh.planes))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qsigs, planes = get_broadcast(state)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        mat = _normalize(mat)
        bits = (mat @ planes.T) > 0
        sig = bits.astype(np.int64) @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            ham = np.array([bin(int(s) ^ int(qsigs[qi])).count('1') for s in sig])
            cand = np.where(ham <= probe_hamming)[0]
            if len(cand) == 0:
                continue
            sims = mat[cand] @ qm[qi]
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
    df = partials.to_pandas()
    if df.empty:
        return df
    df = df.sort_values(['query_idx', 'score', id_col],
                        ascending=[True, False, True], kind='mergesort')
    df = df.groupby('query_idx', group_keys=False).head(k).reset_index(drop=True)
    df['score'] = df['score'].round(round_decimals)
    return df
