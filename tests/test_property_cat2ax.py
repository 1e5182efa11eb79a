"""Property-based check for category_statistics — the distributed
membership × facts hash join + two-phase counting behind Cat2Ax — against
a dict-and-loop reference of its documented contract: per category,
n = membership row count, type/prop frequencies = joined fact count / n
(duplicates multiply through the join, literal facts included)."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_CATS = ['Cat A', 'Cat B']
_MEMBERS = ['m0', 'm1', 'm2', 'm3']
_PREDS = ['rdf:type', 'born in', 'height']
_OBJS = ['T One', 'T Two', 'v1', '42']


@st.composite
def world(draw):
    nm = draw(st.integers(min_value=1, max_value=10))
    membership = pd.DataFrame({
        'cat_name': [draw(st.sampled_from(_CATS)) for _ in range(nm)],
        'member': [draw(st.sampled_from(_MEMBERS)) for _ in range(nm)]})
    nf = draw(st.integers(min_value=1, max_value=12))
    facts = pd.DataFrame({
        'subj': [draw(st.sampled_from(_MEMBERS + ['other']))
                 for _ in range(nf)],
        'pred': [draw(st.sampled_from(_PREDS)) for _ in range(nf)],
        'obj': [draw(st.sampled_from(_OBJS)) for _ in range(nf)]})
    facts['is_literal'] = facts['obj'].str.match(r'^[v\d]')
    return membership, facts


def _ref_stats(membership, facts):
    out = {}
    for cat, g in membership.groupby('cat_name'):
        n = len(g)
        types, props = {}, {}
        for _, mrow in g.iterrows():
            for _, f in facts[facts['subj'] == mrow['member']].iterrows():
                if f['pred'] == 'rdf:type':
                    types[f['obj']] = types.get(f['obj'], 0) + 1
                else:
                    k = (f['pred'], f['obj'])
                    props[k] = props.get(k, 0) + 1
        out[cat] = {'n': n,
                    'types': {t: c / n for t, c in types.items()},
                    'props': {k: c / n for k, c in props.items()}}
    return out


@SETTINGS
@given(world())
def test_category_statistics_matches_reference(ray_session, w):
    import ray.data as rd
    from caligraph_ray.stages.cat2ax import category_statistics
    membership, facts = w
    got = category_statistics(rd.from_pandas(membership).repartition(2),
                              rd.from_pandas(facts).repartition(2))
    assert got == _ref_stats(membership, facts)
