"""Canonicalization: salted surface grouping → connected components → cluster
splitting (north-star D4/D5; reference matching/greedy_clustering.py).

Graph model (NASTyLinker, reference greedy_clustering.py:26-94):
  * nodes: mention_uids (negative space: entity names hashed to ids)
  * mention→entity edges where link_score > me_threshold
  * mention→mention edges between mentions sharing a norm_surface
    (score mm_score > mm_threshold) — generated per surface group with hot
    surfaces salted into sub-buckets connected via a star to the bucket
    representative, so a head surface ('United States') never builds a
    quadratic group or a single giant task.

Connected components run as repeated block-local union-find contractions
(per-partition spanning forests, the distributed analogue of the
reference's bottom-up clustering D5, matching/bottomup_clustering.py:33-83):
each pass shrinks every block of edges to ≤ nodes-1 forest edges, a
shuffle-repartition remixes blocks, and the tail (provably ≤ #distinct
nodes - #components edges) finishes with driver union-find. Components with
more than one entity node are split NASTyLinker-style by multi-source
Dijkstra over edge weights with path score threshold (greedy_clustering.py:83-94).
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import (HOT_KEY_SALT_BUCKETS, HOT_KEY_THRESHOLD,
                      MENTION_ENTITY_THRESHOLD, MENTION_MENTION_THRESHOLD,
                      MM_SCORE, PATH_THRESHOLD, TOKEN_BATCH_SIZE)
from ..functions.hashing import stable_hash64

# mention volume up to which the per-surface representative dict is
# broadcast instead of a salted groupby (same budget class as ST9's alias
# index; beyond it the surface dim may not fit one object)
SURFACE_BROADCAST_LIMIT = 50_000_000

# driver-dim budget for the surface-collapsed closed form: the MEASURED
# number of per-surface stats rows (distinct surfaces + qualifying
# (surface, entity) pairs) that may be collected to the driver. Above it
# canonicalize_surface raises SurfaceDimOverBudget and callers route to the
# fully-distributed canonicalize() + labels-join path (flagship
# _assemble_triples does this automatically).
SURFACE_DIM_BUDGET = 20_000_000


class SurfaceDimOverBudget(Exception):
    """Measured surface-dim cardinality exceeds the driver-collect budget."""

    def __init__(self, measured: int, budget: int):
        self.measured, self.budget = measured, budget
        super().__init__(
            f'surface dim has {measured} rows > budget {budget}; use the '
            f'distributed canonicalize() + labels-join path')


def entity_node_id(name: str) -> int:
    """Entity nodes live in negative id space; mention_uids are ≥ 0."""
    return -stable_hash64('ent:' + name) - 1


# --- edge generation -------------------------------------------------------

EDGE_SCHEMA = pa.schema([('src', pa.int64()), ('dst', pa.int64()), ('weight', pa.float64())])


def _me_edges_batch(batch: pa.Table, me_threshold: float) -> pa.Table:
    """mention→entity edges from linked mentions (stateless, vectorized mask)."""
    df = batch.select(['mention_uid', 'entity', 'link_score']).to_pandas()
    df = df[(df['entity'].notna()) & (df['link_score'] > me_threshold)]
    return pa.Table.from_pydict({
        'src': df['mention_uid'].to_numpy(dtype=np.int64),
        'dst': np.fromiter((entity_node_id(e) for e in df['entity']), dtype=np.int64, count=len(df)),
        'weight': np.minimum(df['link_score'].to_numpy(), 1.0),
    }, schema=EDGE_SCHEMA)


def _mm_edges_group(group: pd.DataFrame, mm_score: float, hot_threshold: int) -> pd.DataFrame:
    """Per-(norm_surface[,salt]) group → star edges to the group's min
    mention_uid. A star (not a clique) keeps edge count linear while
    producing the same connected components; hot surfaces arrive pre-salted
    so no group exceeds ~hot_threshold rows."""
    uids = np.sort(group['mention_uid'].to_numpy(dtype=np.int64))
    if len(uids) < 2:
        return pd.DataFrame({'src': np.array([], dtype=np.int64),
                             'dst': np.array([], dtype=np.int64),
                             'weight': np.array([], dtype=np.float64)})
    rep = uids[0]
    others = uids[1:]
    return pd.DataFrame({'src': np.full(len(others), rep, dtype=np.int64),
                         'dst': others,
                         'weight': np.full(len(others), mm_score)})


def _salt_hot_surfaces(mentions_ds, hot_surfaces: Dict[str, int]):
    """Append a salt column: hot surfaces split into HOT_KEY_SALT_BUCKETS
    sub-keys by hash(mention_uid); cold surfaces use salt 0. Sub-buckets are
    re-connected afterwards via one star edge per bucket (two-phase merge)."""
    def add_salt(batch: pa.Table) -> pa.Table:
        surfs = batch.column('norm_surface').to_pylist()
        uids = batch.column('mention_uid').to_numpy()
        salt = np.zeros(len(surfs), dtype=np.int32)
        for i, s in enumerate(surfs):
            if s in hot_surfaces:
                salt[i] = int(uids[i]) % HOT_KEY_SALT_BUCKETS
        return batch.append_column('salt', pa.array(salt, pa.int32()))
    return mentions_ds.map_batches(add_salt, batch_format='pyarrow', batch_size=TOKEN_BATCH_SIZE)


def build_alignment_edges(linked_mentions_ds,
                          me_threshold: float = MENTION_ENTITY_THRESHOLD,
                          mm_threshold: float = MENTION_MENTION_THRESHOLD,
                          mm_score: float = MM_SCORE,
                          hot_threshold: int = HOT_KEY_THRESHOLD,
                          total_rows: Optional[int] = None):
    """linked mention rows → undirected edge Dataset (src, dst, weight).

    Pass ``total_rows`` (free on a materialized input) to skip the
    hot-surface detection shuffle entirely when no surface can exceed the
    salting threshold."""
    me = linked_mentions_ds.map_batches(
        lambda b: _me_edges_batch(b, me_threshold), batch_format='pyarrow',
        batch_size=TOKEN_BATCH_SIZE)
    if mm_score <= mm_threshold:
        return me

    # FAST PATH (surface dim fits the broadcast budget — same feasibility as
    # the alias index itself): per-surface min mention_uid via a two-phase
    # aggregate, then star edges emitted in a zero-shuffle map_batches.
    # Head surfaces cost one partial row per batch, so no salting is needed.
    if total_rows is None or total_rows <= SURFACE_BROADCAST_LIMIT:
        from .relational import collect_rows, two_phase_pandas_agg
        reps_rows = collect_rows(two_phase_pandas_agg(
            linked_mentions_ds.select_columns(['mention_uid', 'norm_surface']),
            ['norm_surface'], {'rep': ('mention_uid', 'min')}))
        reps = {r['norm_surface']: int(r['rep']) for r in reps_rows}
        reps_ref = ray.put(reps)

        def star_edges(batch: pa.Table) -> pa.Table:
            rd_ = ray.get(reps_ref)
            uids = batch.column('mention_uid').to_numpy()
            surfs = batch.column('norm_surface').to_pylist()
            src, dst = [], []
            for uid, s in zip(uids, surfs):
                rep = rd_.get(s)
                if rep is not None and rep != uid:
                    src.append(rep)
                    dst.append(int(uid))
            return pa.Table.from_pydict({
                'src': pa.array(src, pa.int64()),
                'dst': pa.array(dst, pa.int64()),
                'weight': pa.array([mm_score] * len(src), pa.float64()),
            }, schema=EDGE_SCHEMA)

        mm_fast = linked_mentions_ds.select_columns(['mention_uid', 'norm_surface']) \
            .map_batches(star_edges, batch_format='pyarrow', batch_size=TOKEN_BATCH_SIZE)
        return me.union(mm_fast)

    # LARGE-CARDINALITY PATH: salted groupby (hot keys split into sub-buckets
    # re-bridged by one star edge per bucket); detect hot surfaces with a
    # cheap two-phase count first
    from ray.data.aggregate import Sum

    from .relational import collect_rows

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.select(['norm_surface']).group_by('norm_surface').aggregate([([], 'count_all')])
        return g.rename_columns(['norm_surface', 'cnt'])

    counts = linked_mentions_ds.map_batches(partial_counts, batch_format='pyarrow') \
        .groupby('norm_surface').aggregate(Sum('cnt', alias_name='cnt'))
    from .relational import arrow_filter
    hot = {r['norm_surface']: int(r['cnt'])
           for r in collect_rows(arrow_filter(
               counts, lambda t: pc.greater(t['cnt'], hot_threshold)))}

    from .relational import grouped_map
    ds = linked_mentions_ds.select_columns(['mention_uid', 'norm_surface'])
    ds = _salt_hot_surfaces(ds, hot)
    mm = grouped_map(ds, ['norm_surface', 'salt'],
                     lambda g: _mm_edges_group(g, mm_score, hot_threshold))
    mm = mm.map_batches(lambda t: t.cast(EDGE_SCHEMA), batch_format='pyarrow')

    # star edges re-connecting salted sub-buckets of the same hot surface:
    # bucket representative = min mention_uid per (surface, salt) — link salt>0
    # reps to the salt-0 rep (driver-side tiny table)
    if hot:
        from ray.data.aggregate import Min
        reps = ds.groupby(['norm_surface', 'salt']).aggregate(Min('mention_uid', alias_name='rep'))
        rep_rows = [r for r in collect_rows(reps) if r['norm_surface'] in hot]
        by_surf: Dict[str, List[Tuple[int, int]]] = defaultdict(list)
        for r in rep_rows:
            by_surf[r['norm_surface']].append((r['salt'], int(r['rep'])))
        bridge_src, bridge_dst = [], []
        for surf, lst in by_surf.items():
            lst.sort()
            base = lst[0][1]
            for _, rep in lst[1:]:
                bridge_src.append(base)
                bridge_dst.append(rep)
        if bridge_src:
            import ray.data as rd
            bridges = rd.from_arrow(pa.Table.from_pydict({
                'src': pa.array(bridge_src, pa.int64()),
                'dst': pa.array(bridge_dst, pa.int64()),
                'weight': pa.array([mm_score] * len(bridge_src), pa.float64()),
            }, schema=EDGE_SCHEMA))
            mm = mm.union(bridges)
    return me.union(mm)


# --- connected components --------------------------------------------------

class _UnionFind:
    __slots__ = ('parent',)

    def __init__(self):
        self.parent: Dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if ra > rb:  # smaller id wins → deterministic component labels
            ra, rb = rb, ra
        self.parent[rb] = ra


def _contract_block(batch: pa.Table) -> pa.Table:
    """Block-local union-find → spanning-forest edges (node, root)."""
    uf = _UnionFind()
    src = batch.column('src').to_numpy()
    dst = batch.column('dst').to_numpy()
    for a, b in zip(src, dst):
        uf.union(int(a), int(b))
    nodes = set(map(int, src)) | set(map(int, dst))
    out_src, out_dst = [], []
    for n in nodes:
        r = uf.find(n)
        if r != n:
            out_src.append(n)
            out_dst.append(r)
    return pa.Table.from_pydict({'src': pa.array(out_src, pa.int64()),
                                 'dst': pa.array(out_dst, pa.int64())})


def _distinct_edges(ds):
    """Two-phase distinct over (src, dst): per-batch dedup, then one
    key-bucketed exchange dedup — removes the (node → same root) duplicates
    a node accumulates by appearing in several blocks."""
    from .relational import bucketed_map

    def dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    return bucketed_map(ds.map_batches(dd, batch_format='pandas'),
                        ['src', 'dst'], dd)


def connected_components_ds(edges_ds, max_rounds: int = 64):
    """(node, comp) DATASET via min-label propagation — the fully
    distributed CC for the regime the dict-returning
    ``connected_components`` refuses with "consume components
    distributed": when even the node→component MAP is too large for the
    driver, this is that consumer. ``comp`` = min node id of the
    component, so labels equal the union-find labels exactly
    (hypothesis-pinned against ``_UnionFind``).

    Shape per round: one labels ⋈ symmetric-edges ``shuffle_join``, a
    node-keyed two-phase min, and one compare-join whose CHANGED count is
    the only value reaching the driver. Plain min propagation converges
    in O(component diameter) rounds — single digits on web host graphs
    and near-dup clusters, the graphs this serves; a pathological
    path-graph chain needs O(n) rounds, which ``max_rounds`` bounds with
    a raise carrying the per-round changed counts (switch such graphs to
    the contraction-based ``connected_components``, whose passes halve
    chains geometrically). Isolated nodes (absent from edges) are absent
    from the output — callers left-join their node dim and default
    comp = own id, exactly as with the dict variant's ``.get(n, n)``."""
    from .relational import (arrow_filter, pin_arrow, shuffle_join,
                             two_phase_count, two_phase_pandas_agg)

    def sym(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            'node': pd.concat([batch['src'], batch['dst']],
                              ignore_index=True),
            'nbr': pd.concat([batch['dst'], batch['src']],
                             ignore_index=True)})

    sym_ds = pin_arrow(edges_ds.map_batches(sym, batch_format='pandas'),
                       node='int', nbr='int').materialize()
    labels = pin_arrow(
        two_phase_count(sym_ds.map_batches(lambda df: df[['node']],
                                           batch_format='pandas'),
                        ['node'], alias='_c').drop_columns(['_c'])
        .map_batches(lambda t: pa.Table.from_pydict(
            {'node': t.column('node'), 'lab': t.column('node')}),
            batch_format='pyarrow'),
        node='int', lab='int').materialize()

    lineage: List[int] = []
    for _ in range(max_rounds):
        as_dim = labels.map_batches(
            lambda t: pa.Table.from_pydict({'ln': t.column('node'),
                                            'nlab': t.column('lab')}),
            batch_format='pyarrow')
        j = shuffle_join(sym_ds, as_dim, left_on='nbr', right_on='ln',
                         how='inner')
        votes = pin_arrow(j, node='int', nlab='int')
        own = labels.map_batches(
            lambda t: pa.Table.from_pydict({'node': t.column('node'),
                                            'nlab': t.column('lab')}),
            batch_format='pyarrow')
        new_labels = pin_arrow(
            two_phase_pandas_agg(own.union(votes), ['node'],
                                 {'nlab': ('nlab', 'min')})
            .map_batches(lambda df: df.rename(columns={'nlab': 'lab'}),
                         batch_format='pandas'),
            node='int', lab='int').materialize()
        old_dim = labels.map_batches(
            lambda t: pa.Table.from_pydict({'onode': t.column('node'),
                                            'olab': t.column('lab')}),
            batch_format='pyarrow')
        cmp = shuffle_join(new_labels, old_dim, left_on='node',
                           right_on='onode', how='inner')
        changed = arrow_filter(
            pin_arrow(cmp, lab='int', olab='int'),
            lambda t: pc.not_equal(t['lab'], t['olab'])).count()
        labels = new_labels
        lineage.append(int(changed))
        if changed == 0:
            return labels.map_batches(
                lambda t: pa.Table.from_pydict(
                    {'node': t.column('node'), 'comp': t.column('lab')}),
                batch_format='pyarrow')
    raise RuntimeError(
        f'connected_components_ds did not converge in {max_rounds} '
        f'min-propagation rounds (per-round changed counts: {lineage}); '
        f'the graph has a very long path — use the contraction-based '
        f'connected_components instead.')


def connected_components(edges_ds, contraction_passes: int = 2,
                         driver_limit: int = 5_000_000,
                         fan_in: Optional[int] = None,
                         max_passes: int = 32) -> Dict[int, int]:
    """Edge Dataset → {node: component_label} (label = min node id).

    Distributed contraction passes bound the driver tail to ≤ (#nodes -
    #components) forest edges; each pass halves the partition count
    (geometric fan-in from ``fan_in``, default = current block count), so
    chains collapse geometrically (pointer-jumping analogue).

    ADAPTIVE: after the mandatory ``contraction_passes``, the tail is
    measured each pass (edge count, then distinct-edge count — a node seen
    in several blocks carries duplicate forest edges that a two-phase
    distinct removes without any driver state). Passes continue until the
    deduped tail fits ``driver_limit``; the per-pass lineage counters are
    carried in the error raised only when the tail stops shrinking above
    budget (the true forest is ≥ #nodes − #components edges, and the
    RETURNED node map is the same size — a tail genuinely over budget means
    the caller must raise ``driver_limit`` or consume components
    distributed) or ``max_passes`` is exhausted."""
    ds = edges_ds.select_columns(['src', 'dst'])
    if fan_in is None:
        try:
            fan_in = max(2, ds.num_blocks())
        except Exception:
            fan_in = 8
    parts = fan_in
    lineage: List[int] = []
    passes = 0
    prev_dedup: Optional[int] = None
    while True:
        ds = ds.map_batches(_contract_block, batch_format='pyarrow')
        parts = max(2, parts // 2)
        ds = ds.repartition(parts, shuffle=True)
        passes += 1
        if passes < contraction_passes:
            continue
        ds = ds.materialize()
        n = ds.count()
        lineage.append(n)
        if n <= driver_limit:
            break
        ds = _distinct_edges(ds).materialize()
        nd = ds.count()
        lineage.append(nd)
        if nd <= driver_limit:
            break
        stalled = prev_dedup is not None and nd >= prev_dedup
        prev_dedup = nd
        if passes >= max_passes or stalled:
            raise RuntimeError(
                f'connected_components forest tail does not fit the driver '
                f'after {passes} passes (per-pass edge counts: {lineage}; '
                f'limit {driver_limit}). The deduped tail stopped shrinking '
                f'— it is (close to) the true forest, and the returned node '
                f'map would be the same size: raise driver_limit or consume '
                f'components distributed.')
    from .relational import collect_rows
    rows = collect_rows(ds)
    uf = _UnionFind()
    for r in rows:
        uf.union(int(r['src']), int(r['dst']))
    return {n: uf.find(n) for n in list(uf.parent)}


# --- NASTyLinker component splitting --------------------------------------

def _split_component(nodes: List[int], edges: List[Tuple[int, int, float]],
                     path_threshold: float) -> Dict[int, int]:
    """Reference greedy_clustering.py:83-94: multi-source Dijkstra from the
    entity nodes over -log2(weight) distances; mentions whose best path
    score 2^-d stays > threshold join that entity's cluster, the rest are
    re-clustered among themselves. Returns node → cluster label."""
    ents = [n for n in nodes if n < 0]
    if len(ents) <= 1:
        label = min(nodes)
        return {n: label for n in nodes}
    adj: Dict[int, List[Tuple[int, float]]] = defaultdict(list)
    for a, b, w in edges:
        d = -math.log2(max(min(w, 1.0), 1e-12))
        adj[a].append((b, d))
        adj[b].append((a, d))
    dist: Dict[int, float] = {e: 0.0 for e in ents}
    source: Dict[int, int] = {e: e for e in ents}
    heap = [(0.0, e, e) for e in ents]
    heapq.heapify(heap)
    while heap:
        d, n, s = heapq.heappop(heap)
        if d > dist.get(n, float('inf')):
            continue
        for m, w in adj[n]:
            nd = d + w
            if nd < dist.get(m, float('inf')):
                dist[m] = nd
                source[m] = s
                heapq.heappush(heap, (nd, m, s))
    assignment: Dict[int, int] = {}
    unassigned: List[int] = []
    for n in nodes:
        score = 2 ** (-dist[n]) if n in dist else 0.0
        if n < 0:
            assignment[n] = source.get(n, n)
        elif score > path_threshold:
            assignment[n] = source[n]
        else:
            unassigned.append(n)
    # re-cluster unassigned mentions among themselves (CC of induced subgraph)
    if unassigned:
        un = set(unassigned)
        uf = _UnionFind()
        for a, b, _ in edges:
            if a in un and b in un:
                uf.union(a, b)
        for n in unassigned:
            assignment[n] = uf.find(n)
    return assignment


def split_components(edges_with_labels: pd.DataFrame, path_threshold: float = PATH_THRESHOLD) -> pd.DataFrame:
    """Per-component splitting (map_groups body): input columns
    (src, dst, weight, component) of ONE component → (node, cluster)."""
    edges = list(zip(edges_with_labels['src'].astype(np.int64),
                     edges_with_labels['dst'].astype(np.int64),
                     edges_with_labels['weight'].astype(float)))
    nodes = sorted({n for e in edges for n in e[:2]})
    assignment = _split_component(nodes, edges, path_threshold)
    return pd.DataFrame({'node': list(assignment.keys()),
                         'cluster': list(assignment.values())})


def canonicalize_surface(linked_mentions_ds,
                         me_threshold: float = MENTION_ENTITY_THRESHOLD,
                         mm_threshold: float = MENTION_MENTION_THRESHOLD,
                         mm_score: float = MM_SCORE,
                         path_threshold: float = PATH_THRESHOLD,
                         total_rows: Optional[int] = None,
                         surface_budget: Optional[int] = None):
    """Surface-collapsed canonicalization — the mention-level semantics of
    ``canonicalize`` (verified by the flagship oracle test) at a fraction of
    the cost, exact up to score ties: on an exact path-score tie the closed
    form resolves deterministically (lexicographically-first entity; direct
    link preferred over the via-rep path), while the Dijkstra in
    ``_split_component`` resolves equal-distance ties by heap pop order.
    With the constant star weights both orders are deterministic, but they
    can differ on ties — the closed form's ordering is the contract.

    Key observation: the mention-mention edges are per-surface stars, so a
    connected component's mention set is fully determined by its member
    *surfaces*. CC therefore runs on the collapsed graph whose nodes are
    surface representatives (= per-surface min mention_uid, so min-node
    component labels are IDENTICAL to mention-level labels) plus entity
    nodes, with one edge per distinct (surface, entity>threshold) pair —
    thousands of nodes instead of all mentions. Only components holding ≥2
    entities (ambiguous surfaces) run the NASTyLinker mention-level Dijkstra
    split, over just their member mentions.

    Returns (surf_label, multi_info):
      * surf_label: dict surface → cluster label for single-entity
        components (broadcast downstream; mentions resolve by lookup)
      * multi_info: dict surface → (rep_uid, S_rep, src_entity, rep_assigned)
        for surfaces inside multi-entity components; per-mention assignment
        is closed-form from this plus the mention's own direct link:
          S_direct = link_score (if > me_threshold)
          S_via    = S_rep × mm_score
          assigned to src (or direct entity) iff max(S) > path_threshold,
          else clustered under the surface rep (if the rep is unassigned)
          or left a singleton — exactly the NASTyLinker Dijkstra result on
          the star-structured alignment graph.
    """
    from .relational import bucketed_map, two_phase_pandas_agg

    if mm_score <= mm_threshold:
        raise ValueError('canonicalize_surface requires mention-mention edges '
                         '(mm_score > mm_threshold); use canonicalize() otherwise')
    ds = linked_mentions_ds

    # ONE pass over all mentions computing every per-surface statistic the
    # collapsed algorithm needs: representative uid + count (surface rows,
    # entity='') and per-(surface, entity>threshold) best link score + the
    # representative's own link (pair rows). Long format → one shuffle.
    _MAXU = (1 << 62)

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values('mention_uid', kind='mergesort')
        srows = b.drop_duplicates('norm_surface', keep='first') \
            [['norm_surface', 'mention_uid', 'entity', 'link_score']] \
            .rename(columns={'mention_uid': 'rep', 'entity': 'rep_entity',
                             'link_score': 'rep_score'})
        counts = batch['norm_surface'].value_counts(sort=False)
        srows['n'] = srows['norm_surface'].map(counts).astype('int64')
        srows['rep_entity'] = srows['rep_entity'].fillna('')
        srows['entity'] = ''
        srows['best'] = 0.0
        m = batch[(batch['entity'].notna()) & (batch['link_score'] > me_threshold)]
        prows = m.groupby(['norm_surface', 'entity'], sort=False)['link_score'] \
            .max().rename('best').reset_index()
        prows['rep'] = _MAXU
        prows['n'] = 0
        prows['rep_entity'] = ''
        prows['rep_score'] = 0.0
        cols = ['norm_surface', 'entity', 'rep', 'n', 'rep_entity', 'rep_score', 'best']
        return pd.concat([srows[cols], prows[cols]], ignore_index=True)

    def stats_final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket[bucket['entity'] == '']
        s = s.sort_values(['norm_surface', 'rep'], kind='mergesort')
        s2 = s.groupby('norm_surface', sort=False).agg(
            rep=('rep', 'min'), n=('n', 'sum'),
            rep_entity=('rep_entity', 'first'),      # row of the global min rep
            rep_score=('rep_score', 'first')).reset_index()
        s2['entity'] = ''
        s2['best'] = 0.0
        p = bucket[bucket['entity'] != ''].groupby(['norm_surface', 'entity'],
                                                   sort=False)['best'].max().reset_index()
        p['rep'] = _MAXU
        p['n'] = 0
        p['rep_entity'] = ''
        p['rep_score'] = 0.0
        cols = ['norm_surface', 'entity', 'rep', 'n', 'rep_entity', 'rep_score', 'best']
        return pd.concat([s2[cols], p[cols]], ignore_index=True)

    from ..config import AGG_BATCH_SIZE
    from .relational import bucketed_map as _bmap, default_coarse
    # ``total_rows`` (free on a materialized input) scales the stats
    # exchange with mention volume (~4M mentions per coarse bucket) instead
    # of the CPU-derived default. The collected result is per-SURFACE (one
    # row per distinct surface + per qualifying (surface, entity) pair) —
    # sublinear in mentions and the same driver/object-store budget class
    # as the alias index; that dim, not the mention count, bounds this
    # algorithm. Beyond it, use canonicalize() + a labels join.
    coarse = None if total_rows is None else \
        max(default_coarse(), min(4096, int(total_rows) // 4_000_000))
    partials = ds.select_columns(['mention_uid', 'norm_surface', 'entity', 'link_score']) \
        .map_batches(stats_partial, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
    from .relational import collect_rows as _crows
    stats_ds = _bmap(partials, ['norm_surface'], stats_final, coarse=coarse)
    if surface_budget is not None:
        # gate on the MEASURED dim cardinality (distinct surfaces +
        # qualifying pairs), not on the mention count — the dim is what the
        # driver actually holds. count() on the materialized stats is block
        # metadata, not a second execution.
        stats_ds = stats_ds.materialize()
        measured = stats_ds.count()
        if measured > surface_budget:
            raise SurfaceDimOverBudget(measured, surface_budget)
    stat_rows = _crows(stats_ds)

    reps: Dict[str, int] = {}
    surf_n: Dict[str, int] = {}
    rep_link: Dict[str, Tuple[str, float]] = {}
    pair_rows: List[dict] = []
    for r in stat_rows:
        if r['entity'] == '':
            s = r['norm_surface']
            reps[s] = int(r['rep'])
            surf_n[s] = int(r['n'])
            rep_link[s] = (r['rep_entity'], float(r['rep_score']))
        else:
            pair_rows.append(r)

    # driver CC over the collapsed graph (tiny: |surfaces| + |entities|).
    # mm edges are guaranteed on (the function raises otherwise), so every
    # ≥2-mention surface forms a star component; an me edge joins rep and
    # entity regardless of surface size — ONE unconditional union.
    uf = _UnionFind()
    for surf, n in surf_n.items():
        if n >= 2:
            uf.find(reps[surf])  # surfaces with stars always form a component
    for r in pair_rows:
        uf.union(reps[r['norm_surface']], entity_node_id(r['entity']))
    comp_entities: Dict[int, set] = defaultdict(set)
    for r in pair_rows:
        comp_entities[uf.find(reps[r['norm_surface']])].add(r['entity'])
    comp_of_surface = {}
    for surf, n in surf_n.items():
        rep = reps[surf]
        if rep in uf.parent or n >= 2:
            comp_of_surface[surf] = uf.find(rep)

    multi_comps = {c for c, ents in comp_entities.items() if len(ents) >= 2}
    surf_label: Dict[str, int] = {}
    multi_surfaces = set()
    for surf, comp in comp_of_surface.items():
        if comp in multi_comps:
            multi_surfaces.add(surf)
        else:
            ents = comp_entities.get(comp, ())
            surf_label[surf] = entity_node_id(next(iter(ents))) if ents else comp

    # Multi-entity components: NASTyLinker split in CLOSED FORM.
    # Shortest paths from the entity source set never pass through an entity
    # (every entity is itself a source at distance 0) and mention-mention
    # connectivity is only the per-surface star, so the best path score to a
    # mention is max(direct me score, S_rep(surface) × mm_score), where
    # S_rep(s) = max over entities e of max(rep's direct score to e,
    # mm_score × best member score to e). No Dijkstra, no join — per-surface
    # maxima from one distributed aggregate, then a broadcast dict.
    multi_info: Dict[str, tuple] = {}
    if multi_surfaces:
        by_surface: Dict[str, List[tuple]] = defaultdict(list)
        for r in pair_rows:
            s = r['norm_surface']
            if s in multi_surfaces:
                ent = r['entity']
                rl_ent, rl_score = rep_link.get(s, ('', 0.0))
                rep_sc = rl_score if (rl_ent == ent and rl_score > me_threshold) else 0.0
                by_surface[s].append((ent, float(r['best']), rep_sc))
        for s in multi_surfaces:
            cands = by_surface.get(s, [])
            s_rep, src = 0.0, None
            for ent, best, rep_sc in sorted(cands):
                sc = max(min(rep_sc, 1.0), mm_score * min(best, 1.0))
                if sc > s_rep:  # strict: ties keep the lexicographically first entity
                    s_rep, src = sc, ent
            rep_assigned = s_rep > path_threshold and src is not None
            multi_info[s] = (reps[s], s_rep, src, rep_assigned)
    return surf_label, multi_info


def edin_clusters(linked_mentions_ds,
                  me_threshold: float = MENTION_ENTITY_THRESHOLD,
                  mm_threshold: float = MENTION_MENTION_THRESHOLD,
                  cluster_threshold: float = 0.5,
                  total_rows: Optional[int] = None):
    """EDIN-style clustering (D7, reference greedy_clustering.py:105-137):
    mention-mention CC only; a cluster keeps an entity iff that entity is
    the top link for ≥ cluster_threshold of its mentions. Returns
    (node, cluster, entity|None) rows."""
    from .relational import bucketed_map

    # mention-mention components (no entity nodes in the graph)
    mm_only = build_alignment_edges(linked_mentions_ds, me_threshold=2.0,
                                    mm_threshold=mm_threshold,
                                    total_rows=total_rows)
    labels = connected_components(mm_only)
    labels_ref = ray.put(labels)

    def tag(batch: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        uids = batch.column('mention_uid').to_numpy()
        comp = np.fromiter((lab.get(int(u), int(u)) for u in uids), dtype=np.int64,
                           count=len(uids))
        return batch.append_column('component', pa.array(comp, pa.int64()))

    tagged = linked_mentions_ds.select_columns(
        ['mention_uid', 'entity', 'link_score']).map_batches(
        tag, batch_format='pyarrow', batch_size=TOKEN_BATCH_SIZE)

    def vote(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for comp, g in bucket.groupby('component', sort=False):
            voters = g[(g['entity'].notna()) & (g['link_score'] > me_threshold)]
            ent = None
            if not voters.empty:
                # stable sort over the entity-sorted groupby output: vote
                # ties resolve to the lexicographically smallest entity
                # (quicksort would leave tie order unspecified)
                top = voters.groupby('entity').size() \
                    .sort_values(ascending=False, kind='mergesort')
                if top.iloc[0] / len(g) >= cluster_threshold:
                    ent = top.index[0]
            for uid in g['mention_uid']:
                out.append({'node': int(uid), 'cluster': int(comp), 'entity': ent})
        return pd.DataFrame(out, columns=['node', 'cluster', 'entity'])

    return bucketed_map(tagged, ['component'], vote)


def canonicalize(linked_mentions_ds,
                 me_threshold: float = MENTION_ENTITY_THRESHOLD,
                 mm_threshold: float = MENTION_MENTION_THRESHOLD,
                 path_threshold: float = PATH_THRESHOLD,
                 total_rows: Optional[int] = None):
    """Full canonicalization: edges → CC → per-component split → cluster map.

    Returns a Dataset (node:int64, cluster:int64, entity:string|null) where
    entity is the linked entity name for entity-labeled clusters and null
    for NEW_ENTITY clusters (reference entity_disambiguation/__init__.py:26-33:
    new ids assigned past the known-id space).
    """
    import ray
    import ray.data as rd

    edges = build_alignment_edges(linked_mentions_ds, me_threshold, mm_threshold,
                                  total_rows=total_rows)
    edges = edges.materialize()  # reused twice (CC + split); bounded by mention count
    labels = connected_components(edges)
    if not labels:
        return rd.from_arrow(pa.Table.from_pydict(
            {'node': pa.array([], pa.int64()), 'cluster': pa.array([], pa.int64()),
             'entity': pa.array([], pa.string())}))
    labels_ref = ray.put(labels)

    def tag_component(batch: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        src = batch.column('src').to_numpy()
        comp = np.fromiter((lab.get(int(s), int(s)) for s in src), dtype=np.int64,
                           count=len(src))
        return batch.append_column('component', pa.array(comp, pa.int64()))

    from .relational import arrow_filter, grouped_map
    tagged = edges.map_batches(tag_component, batch_format='pyarrow')
    clusters = grouped_map(tagged, ['component'],
                           lambda g: split_components(g, path_threshold))

    # entity-labeled clusters carry the entity NODE id (negative space, see
    # _split_component); resolve it to the entity name so the matcher
    # contract matches edin_clusters' (node, cluster, entity|null) schema
    import pyarrow.compute as pc
    ents = set(arrow_filter(linked_mentions_ds,
                            lambda t: pc.is_valid(t['entity'])).unique('entity'))
    name_ref = ray.put({entity_node_id(e): e for e in ents if e})

    def add_entity(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import get_broadcast
        m = get_broadcast(name_ref)
        names = [m.get(c) for c in batch.column('cluster').to_pylist()]
        return batch.append_column('entity', pa.array(names, pa.string()))

    return clusters.map_batches(add_entity, batch_format='pyarrow')
