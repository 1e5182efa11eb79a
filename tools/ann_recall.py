"""ANN recall characterization: recall@k of the approximate search paths
(IVF inverted lists, LSH multi-probe, int8-quantized) against brute-force
cosine top-k on the embeddings table — the published operating-point table
the hnswlib-based reference implies (ef=50 / M=64,
…/matching/transformer_util.py:75-89) but never measures.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
Prints a markdown table (paste into BASELINE.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def recall_at_k(exact, approx, k: int) -> float:
    """Mean |approx∩exact|/k over queries (by query_idx)."""
    ex = exact.groupby('query_idx')['vec_id'].apply(set)
    ap = approx.groupby('query_idx')['vec_id'].apply(lambda s: set(s.head(k)))
    qs = ex.index
    return float(np.mean([len(ex[q] & ap.get(q, set())) / min(k, len(ex[q]))
                          for q in qs]))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=8, include_dashboard=False,
                 logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from caligraph_ray.stages import similarity as sim
    from caligraph_ray.stages.relational import read_table

    if sf_dir == 'clustered':
        # deterministic clustered corpus — the shape REAL text embeddings
        # have (the testdata vectors are near-orthogonal noise, ANN's
        # worst case: every "neighbor" is arbitrary, so bucket pruning
        # necessarily loses them)
        import pandas as pd
        import ray.data as rd
        rng = np.random.RandomState(7)
        n, dim, n_clusters = 2000, 64, 16
        centers = rng.randn(n_clusters, dim) * 4
        vecs = centers[np.arange(n) % n_clusters] + rng.randn(n, dim)
        emb = rd.from_pandas(pd.DataFrame(
            {'vec_id': np.arange(n, dtype=np.int64),
             'embedding': list(vecs)})).repartition(8).materialize()
    else:
        emb = read_table(sf_dir, 'embeddings', ['vec_id', 'embedding']) \
            .materialize()
    qdf = emb.take(n_queries)
    queries = np.stack([np.asarray(r['embedding'], dtype=np.float64)
                        for r in qdf])

    exact = sim.brute_force_topk(emb, queries, k=k)
    rows = []
    for nprobe in (1, 2, 4, 8, 16):
        ap = sim.ivf_topk(emb, queries, k=k, n_centroids=16, nprobe=nprobe)
        rows.append(('ivf', f'nprobe={nprobe}/16',
                     recall_at_k(exact, ap, k)))
    for ph in (0, 1, 2, 3):
        ap = sim.lsh_index_topk(emb, queries, k=k, n_planes=12,
                                probe_hamming=ph)
        rows.append(('lsh', f'probe_hamming={ph} (12 planes)',
                     recall_at_k(exact, ap, k)))
    ap = sim.quantized_topk(emb, queries, k=k)
    rows.append(('int8', 'quantized full scan', recall_at_k(exact, ap, k)))

    print(f'| path | operating point | recall@{k} |')
    print('|---|---|---|')
    for path, op, r in rows:
        print(f'| {path} | {op} | {r:.3f} |')
    print(json.dumps({'sf_dir': sf_dir, 'k': k, 'n_queries': n_queries,
                      'recall': {f'{p}:{o}': round(r, 4)
                                 for p, o, r in rows}}))
    ray.shutdown()


if __name__ == '__main__':
    main()
