"""Integer fixed-point PageRank: distributed vs single-process reference."""

import pandas as pd
import pytest


def _pagerank_reference(edges, iters, scale=1_000_000_000_000):
    """Single-process replay of the exact integer contract."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    ow = {}
    for s, _, w in edges:
        ow[s] = ow.get(s, 0) + w
    r = {v: scale // n for v in nodes}
    tele = (15 * scale) // (100 * n)
    for _ in range(iters):
        nxt = {v: tele for v in nodes}
        for s, d, w in edges:
            nxt[d] += (r[s] * 85 * w) // (100 * ow[s])
        r = nxt
    return r


def test_pagerank_matches_reference(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.graph import pagerank_int
    edges = [('a', 'b', 3), ('b', 'c', 1), ('c', 'a', 2), ('a', 'c', 1),
             ('d', 'a', 5)]   # d is dangling-in only; a is the hub
    df = pd.DataFrame({'src': [e[0] for e in edges],
                       'dst': [e[1] for e in edges],
                       'w': pd.Series([e[2] for e in edges], dtype='int64')})
    for iters in (1, 3):
        out = pagerank_int(rd.from_pandas(df).repartition(2),
                           iters=iters).to_pandas()
        got = dict(zip(out['node'], out['rank_q'].astype(int)))
        assert got == _pagerank_reference(edges, iters)
    # the hub out-ranks the unreferenced node
    assert got['a'] > got['d']


def test_transition_edges_lead_semantics(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.graph import transition_edges
    ev = pd.DataFrame({
        'user_id': pd.Series([1, 1, 1, 2, 2, 3], dtype='int64'),
        'ts': pd.to_datetime(['2024-01-01', '2024-01-02', '2024-01-03',
                              '2024-01-01', '2024-01-01', '2024-01-05']),
        'event_id': pd.Series([10, 11, 12, 20, 21, 30], dtype='int64'),
        'event_type': ['x', 'y', 'x', 'y', 'y', 'z'],
    })
    out = transition_edges(rd.from_pandas(ev).repartition(2)).to_pandas()
    got = {(r['src'], r['dst']): int(r['w']) for _, r in out.iterrows()}
    # user 1: x->y, y->x; user 2 same-ts tie broken by event_id: y->y;
    # user 3: single event, no edge
    assert got == {('x', 'y'): 1, ('y', 'x'): 1, ('y', 'y'): 1}


def test_pagerank_empty_edges(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.graph import pagerank_int
    df = pd.DataFrame({'src': pd.Series([], dtype='object'),
                       'dst': pd.Series([], dtype='object'),
                       'w': pd.Series([], dtype='int64')})
    out = pagerank_int(rd.from_pandas(df), iters=2).to_pandas()
    assert out.empty


def _brute_triangles(edges):
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = set()
    for x in nodes:
        for y in adj[x]:
            if y <= x:
                continue
            for z in adj[x] & adj[y]:
                if z > y:
                    out.add((x, y, z))
    return sorted(out)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_triangles_match_brute_force(ray_session, seed):
    import numpy as np
    import ray.data as rd
    from caligraph_ray.stages.graph import triangles, undirected_edges
    rng = np.random.RandomState(seed)
    nodes = [f'n{i}' for i in range(14)]
    raw = [(nodes[rng.randint(14)], nodes[rng.randint(14)])
           for _ in range(60)]
    df = pd.DataFrame({'src': [a for a, _ in raw],
                       'dst': [b for _, b in raw],
                       'w': 1})
    got = triangles(undirected_edges(rd.from_pandas(df))).to_pandas()
    got_set = sorted(map(tuple, got[['x', 'y', 'z']].to_numpy()))
    assert got_set == _brute_triangles(raw)


def test_triangles_trianglefree_and_clique(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.graph import triangles, undirected_edges
    # 4-cycle: no triangles
    cyc = pd.DataFrame({'src': ['a', 'b', 'c', 'd'],
                        'dst': ['b', 'c', 'd', 'a'], 'w': 1})
    assert triangles(undirected_edges(rd.from_pandas(cyc))).count() == 0
    # K4: C(4,3) = 4 triangles
    k4e = [(a, b) for i, a in enumerate('abcd') for b in 'abcd'[i + 1:]]
    k4 = pd.DataFrame({'src': [a for a, _ in k4e],
                       'dst': [b for _, b in k4e], 'w': 1})
    assert triangles(undirected_edges(rd.from_pandas(k4))).count() == 4


def test_bfs_hops_matches_reference_bfs(ray_session):
    import numpy as np
    import ray.data as rd
    from collections import deque
    from caligraph_ray.stages.graph import bfs_hops
    rng = np.random.RandomState(9)
    nodes = [f'n{i}' for i in range(12)]
    raw = {(nodes[rng.randint(12)], nodes[rng.randint(12)])
           for _ in range(30)}
    df = pd.DataFrame({'src': [a for a, _ in raw],
                       'dst': [b for _, b in raw], 'w': 1})
    src = min(a for a, _ in raw)
    got = bfs_hops(rd.from_pandas(df), src, max_hops=3).to_pandas()
    got_map = dict(zip(got['node'], got['hops'].astype(int)))
    # reference BFS (directed, depth-capped)
    adj = {}
    for a, b in raw:
        adj.setdefault(a, []).append(b)
    exp, q = {src: 0}, deque([src])
    while q:
        u = q.popleft()
        if exp[u] >= 3:
            continue
        for v in adj.get(u, []):
            if v not in exp:
                exp[v] = exp[u] + 1
                q.append(v)
    assert got_map == exp


def test_bfs_hops_isolated_source(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.graph import bfs_hops
    df = pd.DataFrame({'src': ['a'], 'dst': ['b'], 'w': 1})
    out = bfs_hops(rd.from_pandas(df), 'zzz', max_hops=3).to_pandas()
    assert dict(zip(out['node'], out['hops'])) == {'zzz': 0}


def test_kcore_prune_matches_reference_peel(ray_session):
    import numpy as np
    import ray.data as rd
    from caligraph_ray.stages.graph import kcore_prune, undirected_edges
    rng = np.random.RandomState(4)
    nodes = [f'n{i}' for i in range(15)]
    raw = {(nodes[rng.randint(15)], nodes[rng.randint(15)])
           for _ in range(35)}
    df = pd.DataFrame({'src': [a for a, _ in raw],
                       'dst': [b for _, b in raw], 'w': 1})
    got = kcore_prune(undirected_edges(rd.from_pandas(df)), k=2,
                      rounds=3).to_pandas()
    got_map = dict(zip(got['node'], got['deg'].astype(int)))
    # reference: same bounded peel on canonical undirected edges
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    for _ in range(3):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        edges = {(a, b) for a, b in edges
                 if deg[a] >= 2 and deg[b] >= 2}
    exp = {}
    for a, b in edges:
        exp[a] = exp.get(a, 0) + 1
        exp[b] = exp.get(b, 0) + 1
    assert got_map == exp


def test_triangles_with_nul_bearing_names(ray_session):
    # node names containing NUL exercise the value-pure _col_hash contract
    # on the packed pair keys (the bug class fixed in round 3)
    import ray.data as rd
    from caligraph_ray.stages.graph import triangles, undirected_edges
    names = ['a\x00b', 'b\x00a', 'c\x00c', 'd']
    k4e = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    df = pd.DataFrame({'src': [a for a, _ in k4e],
                       'dst': [b for _, b in k4e], 'w': 1})
    assert triangles(undirected_edges(rd.from_pandas(df))).count() == 4


def test_personalized_pagerank_concentrates_on_seeds(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.graph import pagerank_int
    # chain a -> b -> c -> d: personalizing on 'a' must rank a highest
    # and d lowest, and an unreachable node gets rank 0
    df = pd.DataFrame({'src': ['a', 'b', 'c', 'x'],
                       'dst': ['b', 'c', 'd', 'y'], 'w': 1})
    out = pagerank_int(rd.from_pandas(df), iters=3,
                       seeds=['a']).to_pandas()
    r = dict(zip(out['node'], out['rank_q'].astype(int)))
    # exact 3-iteration transient (closed form: teleport 0.15 pins a;
    # 0.85-damped pulses travel the chain one hop per iteration)
    assert r == {'a': 150_000_000_000, 'b': 127_500_000_000,
                 'c': 108_375_000_000, 'd': 614_125_000_000,
                 'x': 0, 'y': 0}
    # uniform (non-personalized) differs: x gets teleport mass
    out2 = pagerank_int(rd.from_pandas(df), iters=3).to_pandas()
    r2 = dict(zip(out2['node'], out2['rank_q'].astype(int)))
    assert r2['x'] > 0


def test_label_propagation_matches_loop_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from caligraph_ray.stages.graph import label_propagation, undirected_edges

    rng = np.random.RandomState(4)
    # two planted cliques + random cross edges
    edges = []
    for base in (0, 10):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    for _ in range(5):
        edges.append((int(rng.randint(0, 6)), int(10 + rng.randint(0, 6))))
    df = pd.DataFrame(edges, columns=['src', 'dst']).astype('int64')
    und = undirected_edges(ray.data.from_pandas(df))
    got_df = label_propagation(und, iters=3).to_pandas()
    got = dict(zip(got_df['node'].astype(int), got_df['lab'].astype(int)))

    # synchronous loop reference: mode of neighbor labels, ties → min
    adj = {}
    for a, b in {(min(a, b), max(a, b)) for a, b in edges if a != b}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            from collections import Counter
            c = Counter(lab[v] for v in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = min(l for l, cnt in c.items() if cnt == best[1])
        lab = new
    assert got == lab
    # the planted cliques end up internally uniform
    assert len({got[n] for n in range(6)}) == 1
    assert len({got[n] for n in range(10, 16)}) == 1
