"""SemDeDup prune step vs a loop reference: given the (separately
oracle-gated and property-tested) k-means cluster labels, a vector is
dropped iff a same-cluster vector with a smaller id has rounded cosine
≥ threshold."""

import numpy as np
import pandas as pd


def test_semdedup_matches_loop_reference(ray_session):
    import ray

    from caligraph_ray.stages import similarity as sim
    from caligraph_ray.stages.dedup import semdedup_keep

    rng = np.random.RandomState(7)
    base = rng.randn(40, 8)
    base[30:40] = base[0:10] + rng.randn(10, 8) * 1e-3   # planted near-dups
    df = pd.DataFrame({'vec_id': np.arange(40, dtype='int64'),
                       'embedding': [list(r) for r in base]})
    ds = ray.data.from_pandas(df).repartition(3)

    out = semdedup_keep(ds, n_centroids=4, n_iters=2,
                        threshold=0.9).to_pandas()
    asg = sim.kmeans_assignments(ds, n_centroids=4, n_iters=2).to_pandas()
    cen = dict(zip(asg['vec_id'].astype(int), asg['centroid'].astype(int)))

    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = np.round(norm @ norm.T, 6)
    want = {i: 0 if any(cen[j] == cen[i] and sims[i, j] >= 0.9
                        for j in range(i)) else 1
            for i in range(40)}

    got = dict(zip(out['vec_id'].astype(int), out['kept'].astype(int)))
    assert got == want
    assert sum(1 for v in got.values() if v == 0) >= 8   # dups pruned
    assert dict(zip(out['vec_id'].astype(int),
                    out['centroid'].astype(int))) == cen
