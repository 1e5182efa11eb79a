"""Property-based checks for the KB heuristics (A1/A10/A11): the
distributed explode + two-phase counting under hypernym_counts,
domain_range and type_disjointness vs loop references."""

from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_ENTS = ['e0', 'e1', 'e2', 'e3']
_TYPES = ['Person', 'Place', 'Work']
_PREDS = ['born in', 'located in', 'wrote']


@st.composite
def facts_world(draw):
    nf = draw(st.integers(min_value=1, max_value=14))
    facts = pd.DataFrame({
        'subj': [draw(st.sampled_from(_ENTS)) for _ in range(nf)],
        'pred': [draw(st.sampled_from(_PREDS)) for _ in range(nf)],
        'obj': [draw(st.sampled_from(_ENTS + ['lit'])) for _ in range(nf)]})
    facts['is_literal'] = facts['obj'] == 'lit'
    tbe = {e: sorted(draw(st.sets(st.sampled_from(_TYPES), max_size=2)))
           for e in _ENTS}
    return facts, tbe


@SETTINGS
@given(facts_world(), st.sampled_from([0.5, 0.96]))
def test_domain_range_matches_reference(ray_session, w, threshold):
    import ray.data as rd
    from caligraph_ray.stages.heuristics import domain_range
    facts, tbe = w
    got_df = domain_range(rd.from_pandas(facts).repartition(2), tbe,
                          domain_threshold=threshold,
                          range_threshold=threshold)
    got = {r['pred']: (r['domain'], r['range']) for _, r in got_df.iterrows()}

    want = {}
    for pred, g in facts[~facts['is_literal']].groupby('pred'):
        row, any_typed = [], False
        for col_ents in (g['subj'], g['obj']):
            counts, inst = Counter(), 0
            for e in col_ents:
                ts = tbe.get(e, ())
                if ts:
                    inst += 1
                    for t in ts:
                        counts[t] += 1
            best = None
            if counts and inst:
                any_typed = True
                top_cnt = max(counts.values())
                t = min(t for t, c in counts.items() if c == top_cnt)
                if counts[t] / inst >= threshold:
                    best = t
            row.append(best)
        if any_typed:   # predicates with no typed endpoint emit no row
            want[pred] = tuple(row)
    assert got == want


@SETTINGS
@given(facts_world(), st.sampled_from([0.132, 0.6]))
def test_type_disjointness_matches_reference(ray_session, w, threshold):
    import ray.data as rd
    from caligraph_ray.stages.heuristics import type_disjointness
    facts, tbe = w
    got_df = type_disjointness(rd.from_pandas(facts).repartition(2), tbe,
                               threshold=threshold)
    got = {(r['type_a'], r['type_b']): float(r['cosine'])
           for _, r in got_df.iterrows()}

    counts = Counter()
    for _, r in facts.iterrows():
        for t in tbe.get(r['subj'], ()):
            counts[(t, r['pred'])] += 1
    types = sorted({t for t, _ in counts})
    preds = sorted({p for _, p in counts})
    if not types:
        assert got == {}
        return
    mat = np.array([[counts.get((t, p), 0) for p in preds] for t in types],
                   dtype=np.float64)
    dfw = np.log(len(types) / np.maximum((mat > 0).sum(axis=0), 1))
    weighted = mat * dfw
    norms = np.linalg.norm(weighted, axis=1)
    want_must, want_may = set(), set()
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            if norms[i] <= 1e-12 or norms[j] <= 1e-12:
                continue
            cos = float(weighted[i] @ weighted[j] / (norms[i] * norms[j]))
            if cos <= threshold - 1e-9:
                want_must.add((types[i], types[j]))
            if cos <= threshold + 1e-9:
                want_may.add((types[i], types[j]))
            if (types[i], types[j]) in got:
                assert abs(got[(types[i], types[j])] - cos) < 1e-4
    assert want_must <= set(got) <= want_may


@SETTINGS
@given(st.lists(st.sampled_from([
    'cities such as Paris and Berlin',
    'animals such as cats',
    'writers including Goethe',
    'no pattern here',
    'fruits , especially apples and pears',
]), min_size=1, max_size=8))
def test_hypernym_counts_matches_counter(ray_session, texts):
    import ray.data as rd
    from caligraph_ray.stages.heuristics import hearst_matches, hypernym_counts
    df = pd.DataFrame({'text': texts})
    got_df = hypernym_counts(rd.from_pandas(df).repartition(2)).to_pandas()
    got = {} if got_df.empty else \
        {(r['sub'], r['hyper']): int(r['freq']) for _, r in got_df.iterrows()}
    want = Counter()
    for t in texts:
        for sub, hyper in hearst_matches(t):
            want[(sub.lower(), hyper.lower())] += 1   # A1 lowercases pairs
    assert got == dict(want)
