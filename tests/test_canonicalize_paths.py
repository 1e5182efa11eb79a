"""Both mm-edge paths (broadcast-rep fast path vs salted-groupby fallback)
must produce identical connected components."""

import pandas as pd
import pytest

from caligraph_ray.stages.canonicalize import (_UnionFind,
                                               build_alignment_edges)


def _mentions_df():
    rows = []
    uid = 1
    for surf, n in [('united states', 40), ('john smith', 25), ('paris', 3), ('rareword', 1)]:
        for i in range(n):
            rows.append({'mention_uid': uid, 'norm_surface': surf,
                         'entity': 'United States' if surf == 'united states' and i % 2 == 0 else None,
                         'link_score': 1.0 if surf == 'united states' and i % 2 == 0 else 0.0})
            uid += 1
    return pd.DataFrame(rows)


def _components(edge_rows):
    uf = _UnionFind()
    for r in edge_rows:
        uf.union(int(r['src']), int(r['dst']))
    nodes = sorted(set(uf.parent))
    return {n: uf.find(n) for n in nodes}


def test_fast_and_salted_paths_agree(ray_session):
    import ray.data as rd
    df = _mentions_df()
    ds = rd.from_pandas(df).repartition(4)

    fast = build_alignment_edges(ds, total_rows=len(df)).take_all()
    # force the salted fallback: pretend volume exceeds the broadcast limit
    # and make 'united states' a hot key (threshold 10 < 40 occurrences)
    salted = build_alignment_edges(ds, total_rows=10**9, hot_threshold=10).take_all()

    comp_fast = _components(fast)
    comp_salted = _components(salted)
    # identical partition of the node universe (labels may differ)
    def partition(comp):
        groups = {}
        for n, c in comp.items():
            groups.setdefault(c, set()).add(n)
        return sorted(frozenset(g) for g in groups.values())
    assert partition(comp_fast) == partition(comp_salted)
    # hot surface was actually salted: fallback emits bridge edges
    assert len(salted) >= len(fast)
