"""build_context's two scale regimes must agree: the broadcast-dict path
(facts_ref) and the co-partitioned shuffle-join path (facts_ds) produce
identical context rows — page typing, per-entity type lists and
rels-to-page flags — over random subjects/facts incl. NIL entities,
entities without facts, and literal facts (excluded from props)."""

import numpy as np
import pandas as pd
import ray
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_ENTS = ['E0', 'E1', 'E2']
_PAGES = ['Page One', 'Page Two']


@st.composite
def subjects_and_facts(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    subs = pd.DataFrame({
        'url': [f'http://x/wiki/{draw(st.sampled_from(_PAGES)).replace(" ", "_")}'
                for _ in range(n)],
        'page_id': np.arange(n, dtype='int64'),
        'topsection': ['top'] * n,
        'section': ['s'] * n,
        'entity': [draw(st.sampled_from([None] + _ENTS)) for _ in range(n)]})
    nf = draw(st.integers(min_value=0, max_value=12))
    facts = pd.DataFrame({
        'subj': [draw(st.sampled_from(_ENTS)) for _ in range(nf)],
        'pred': [draw(st.sampled_from(['rdf:type', 'part of', 'height']))
                 for _ in range(nf)],
        'obj': [draw(st.sampled_from(['T1', 'Page One', '42']))
                for _ in range(nf)]})
    facts['is_literal'] = facts['pred'] == 'height'
    return subs, facts.drop_duplicates()


def _canon(df):
    return sorted(
        (r['url'], int(r['page_id']), r['page_type'], r['page_entity'],
         r['entity'] if pd.notna(r['entity']) else None,
         tuple(r['ent_types']), tuple(r['rels_to_page']))
        for _, r in df.iterrows())


@SETTINGS
@given(subjects_and_facts())
def test_build_context_paths_agree(ray_session, world):
    import ray.data as rd
    from caligraph_ray.stages.listing_rules import build_context
    subs, facts = world
    via_join = build_context(rd.from_pandas(subs).repartition(2),
                             facts_ds=rd.from_pandas(facts).repartition(2)
                             if len(facts) else
                             rd.from_pandas(pd.DataFrame(
                                 {'subj': ['\x00none'], 'pred': ['p'],
                                  'obj': ['o'], 'is_literal': [False]}))
                             ).to_pandas()
    tbe, pbe = {}, {}
    for _, f in facts.iterrows():
        if f['pred'] == 'rdf:type':
            tbe.setdefault(f['subj'], set()).add(f['obj'])
        elif not f['is_literal']:
            pbe.setdefault(f['subj'], set()).add((f['pred'], f['obj']))
    ref = ray.put((tbe, pbe))
    via_bcast = build_context(rd.from_pandas(subs).repartition(2),
                              facts_ref=ref).to_pandas()
    assert _canon(via_join) == _canon(via_bcast)
