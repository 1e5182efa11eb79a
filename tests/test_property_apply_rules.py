"""apply_rules (J4) ≡ a loop reference: matching listings assert the rule
target on every subject entity that LACKS it (type rules → rdf:type,
relation rules → predicate to the page entity); entities already carrying
the target, NIL entities and non-matching rule keys emit nothing."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_KEYS = [('List', 'top', 's1'), ('List', 'mid', 's2'), ('Cat', 'top', 's1')]
_TYPES = ['T1', 'T2']
_PREDS = ['born in', 'part of']


@st.composite
def ctx_and_rules(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    rows = []
    for i in range(n):
        pt, top, sec = draw(st.sampled_from(_KEYS))
        rows.append({
            'entity': draw(st.sampled_from([None, '', f'E{i % 3}'])),
            'page_type': pt, 'topsection': top, 'section': sec,
            'ent_types': draw(st.lists(st.sampled_from(_TYPES), max_size=2,
                                       unique=True)),
            'rels_to_page': draw(st.lists(st.sampled_from(_PREDS), max_size=2,
                                          unique=True)),
            'page_entity': f'Page{i % 2}'})
    def rules(targets):
        out = []
        for key in draw(st.lists(st.sampled_from(_KEYS), max_size=2,
                                 unique=True)):
            for t in draw(st.lists(st.sampled_from(targets), min_size=1,
                                   max_size=2, unique=True)):
                out.append(dict(zip(('page_type', 'topsection', 'section'),
                                    key)) | {'target': t})
        cols = ['page_type', 'topsection', 'section', 'target']
        return pd.DataFrame(out, columns=cols)
    return pd.DataFrame(rows), rules(_TYPES), rules(_PREDS)


@SETTINGS
@given(ctx_and_rules())
def test_apply_rules_matches_reference(ray_session, world):
    import ray.data as rd
    from caligraph_ray.stages.listing_rules import apply_rules
    ctx, trules, rrules = world
    got_df = apply_rules(rd.from_pandas(ctx).repartition(2),
                         trules, rrules).to_pandas()
    got = sorted((r['subj'], r['pred'], r['obj'], bool(r['is_literal']))
                 for _, r in got_df.iterrows())

    want = []
    for _, r in ctx.iterrows():
        if not r['entity']:
            continue
        key = (r['page_type'], r['topsection'], r['section'])
        for _, tr in trules.iterrows():
            if (tr['page_type'], tr['topsection'], tr['section']) == key \
                    and tr['target'] not in set(r['ent_types']):
                want.append((r['entity'], 'rdf:type', tr['target'], False))
        for _, rr in rrules.iterrows():
            if (rr['page_type'], rr['topsection'], rr['section']) == key \
                    and rr['target'] not in set(r['rels_to_page']):
                want.append((r['entity'], rr['target'], r['page_entity'], False))
    assert got == sorted(want)
