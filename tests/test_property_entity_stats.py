"""Property-based checks for the entity-store statistics (A8/A9): the
distributed joins + two-phase counts under property_frequencies_per_type
and tag_probabilities must reproduce dict-and-loop references, including
the documented transitive-rollup and parent-fallback quirks."""

from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_ENTS = ['e0', 'e1', 'e2', 'e3']
_TYPES = ['t0', 't1', 't2', 't3']
_TAGS = ['PER', 'ORG', 'LOC']


@st.composite
def stats_world(draw):
    nt = draw(st.integers(min_value=1, max_value=10))
    types = pd.DataFrame({
        'entity': [draw(st.sampled_from(_ENTS)) for _ in range(nt)],
        'type': [draw(st.sampled_from(_TYPES)) for _ in range(nt)]})
    np_ = draw(st.integers(min_value=1, max_value=10))
    props = pd.DataFrame({
        'entity': [draw(st.sampled_from(_ENTS + ['other'])) for _ in range(np_)],
        'pred': [draw(st.sampled_from(['p1', 'p2'])) for _ in range(np_)],
        'value': [draw(st.sampled_from(['v1', 'v2'])) for _ in range(np_)]})
    # random DAG over the type names: parent index < child index
    ne = draw(st.integers(min_value=0, max_value=5))
    edges = set()
    for _ in range(ne):
        i, j = draw(st.integers(0, 3)), draw(st.integers(0, 3))
        if i != j:
            edges.add((_TYPES[min(i, j)], _TYPES[max(i, j)]))
    return types, props, sorted(edges)


def _ref_prop_freqs(types, props, edges, min_support):
    from caligraph_ray.stages.taxonomy import Hierarchy
    ent_count = Counter(types['type'])
    direct = {}
    for t, g in types.groupby('type'):
        c = Counter()
        for _, mrow in g.iterrows():
            sub = props[props['entity'] == mrow['entity']]
            for _, f in sub.iterrows():
                c[(f['pred'], f['value'])] += 1
        direct[t] = c
    h = None
    if edges is not None:
        h = Hierarchy()
        for p, c in edges:
            h.add_edge(p, c)
    trans_ec, trans_pc = {}, {}
    if h is not None:
        from caligraph_ray.stages.taxonomy import ROOT
        for node in reversed([n for n in h._topo_order() if n != ROOT]):
            trans_ec[node] = ent_count.get(node, 0)
            trans_pc[node] = direct.get(node, Counter()).copy()
            if ent_count.get(node, 0) < min_support:
                for c in h.children(node):
                    trans_ec[node] += trans_ec.get(c, 0)
                    trans_pc[node] = trans_pc[node] + trans_pc.get(c, Counter())
    out = {}
    for t in set(ent_count) | set(trans_ec):
        n = ent_count.get(t, 0)
        counts = direct.get(t, Counter())
        if n < min_support and h is not None:
            n = trans_ec.get(t, n)
            counts = trans_pc.get(t, counts)
        if n <= 0:
            continue
        out[t] = {pv: c / n for pv, c in counts.items()}
    return out, h


@SETTINGS
@given(stats_world(), st.sampled_from([1, 3]), st.booleans())
def test_property_frequencies_matches_reference(ray_session, w, min_support,
                                                use_hier):
    import ray.data as rd
    from caligraph_ray.stages.entity_stats import property_frequencies_per_type
    types, props, edges = w
    want, h = _ref_prop_freqs(types, props, edges if use_hier else None,
                              min_support)
    got = property_frequencies_per_type(
        rd.from_pandas(types).repartition(2),
        rd.from_pandas(props).repartition(2),
        hierarchy=h, min_support=min_support)
    assert got == want


@SETTINGS
@given(stats_world())
def test_tag_probabilities_matches_reference(ray_session, w):
    import ray.data as rd
    from caligraph_ray.stages.entity_stats import tag_probabilities
    types, props, _ = w
    tagged = props.rename(columns={'pred': 'tag'}).drop(columns=['value'])
    tagged['tag'] = [_TAGS[hash(v) % 3] for v in tagged['tag']]
    got = tag_probabilities(rd.from_pandas(tagged).repartition(2),
                            rd.from_pandas(types).repartition(2))
    tag_counter, total = {}, Counter()
    for _, r in tagged.iterrows():
        for _, trow in types[types['entity'] == r['entity']].iterrows():
            tag_counter.setdefault(trow['type'], Counter())[r['tag']] += 1
            total[trow['type']] += 1
    want = {t: {tag: c / total[t] for tag, c in tags.items()}
            for t, tags in tag_counter.items()}
    assert got == want


def test_valid_tags_parent_fallback():
    from caligraph_ray.stages.entity_stats import valid_tags_for_types
    from caligraph_ray.stages.taxonomy import Hierarchy
    h = Hierarchy()
    h.add_edge('a', 'b')
    h.add_edge('b', 'c')
    h.add_edge('x', 'c')
    probas = {'a': {'PER': 0.9, 'ORG': 0.1},
              'b': {'LOC': 0.2},          # below threshold → inherits a
              'c': {'ORG': 0.05}}         # inherits via b (a) but NOT via
                                          # absent x (climb stops there)
    got = valid_tags_for_types(probas, hierarchy=h, threshold=0.35)
    assert got['a'] == {'PER'}
    assert got['b'] == {'PER'}
    assert got['c'] == {'PER'}
