"""Listing-rule mining goldens (reference extract.py two-level aggregation
semantics on a hand-built context fixture)."""

import pandas as pd
import pytest

from caligraph_ray.stages.listing_rules import (apply_rules, build_context,
                                                mine_relation_rules,
                                                mine_type_rules)


def _subject_rows():
    """Subject entities on two 'List of people from X' pages (type Person,
    birthPlace = page city for most) and one unrelated page."""
    rows = []
    for city, pid in [('Paris', 1), ('Berlin', 2)]:
        url = f'https://ex.org/wiki/List_of_people_from_{city}'
        for i in range(4):
            rows.append({'url': url, 'page_id': pid, 'topsection': 'Notable people',
                         'section': 'Notable people', 'entity': f'P{city}{i}'})
        rows.append({'url': url, 'page_id': pid, 'topsection': 'Notable people',
                     'section': 'Notable people', 'entity': f'New{city}'})
    url = 'https://ex.org/wiki/Random_page'
    for i in range(3):
        rows.append({'url': url, 'page_id': 9, 'topsection': 'Stuff',
                     'section': 'Stuff', 'entity': f'X{i}'})
    return pd.DataFrame(rows)


def _facts():
    types_by_ent, props_by_ent = {}, {}
    for city in ['Paris', 'Berlin']:
        for i in range(4):
            e = f'P{city}{i}'
            types_by_ent[e] = ['Person']
            props_by_ent[e] = [('birthPlace', f'List of people from {city}')]
    # page-entity value must equal the page title for the relation evidence;
    # use titles directly (the miner compares v == page title)
    return types_by_ent, props_by_ent


def test_mine_and_apply_rules(ray_session):
    import ray
    import ray.data as rd
    subjects = rd.from_pandas(_subject_rows())
    facts_ref = ray.put(_facts())
    ctx = build_context(subjects, page_type_fn=lambda url: url.rsplit('/', 1)[-1].split('_')[0],
                        facts_ref=facts_ref).materialize()

    trules = mine_type_rules(ctx, mean_threshold=0.6, min_pages=2).to_pandas()
    assert len(trules) == 1
    r = trules.iloc[0]
    assert r['page_type'] == 'List' and r['target'] == 'Person'
    assert r['n_pages'] == 2 and r['mean_share'] == 0.8  # 4 of 5 subjects typed
    # faithful two-level statistics (reference extract.py:90-147):
    # micro = 8 hits / 10 subjects; macro = (0.8+0.8)/2; std = 0 (equal confs)
    assert r['micro_mean'] == 0.8 and r['macro_mean'] == 0.8
    assert r['micro_std'] == 0.0 and r['page_count'] == 2

    rrules = mine_relation_rules(ctx, mean_threshold=0.6, min_pages=2).to_pandas()
    assert len(rrules) == 1 and rrules.iloc[0]['target'] == 'birthPlace'

    new_triples = apply_rules(ctx, trules, rrules).to_pandas()
    got = set(zip(new_triples['subj'], new_triples['pred'], new_triples['obj']))
    # the untyped subject on each list page gains the type + relation
    assert ('NewParis', 'rdf:type', 'Person') in got
    assert ('NewBerlin', 'rdf:type', 'Person') in got
    assert ('NewParis', 'birthPlace', 'List of people from Paris') in got
    # already-typed subjects are not re-asserted (anti-join semantics)
    assert ('PParis0', 'rdf:type', 'Person') not in got
    # the unrelated page matches no rule
    assert not any(s.startswith('X') for s, _, _ in got)


def test_micro_std_zero_fill(ray_session):
    """A page lacking the target contributes |micro_mean - 0| through the
    zero-fill term (reference micro_std, extract.py:133-137)."""
    import ray
    import ray.data as rd
    rows = []
    # page 1: 4/4 typed; page 2: 4/4 typed; page 3: 0/4 typed (active via
    # another target so it stays in the section's page set)
    for pid, city in [(1, 'A'), (2, 'B'), (3, 'C')]:
        url = f'https://ex.org/wiki/List_of_people_from_{city}'
        for i in range(4):
            rows.append({'url': url, 'page_id': pid, 'topsection': 'T',
                         'section': 'S', 'entity': f'E{pid}{i}'})
    tbe = {f'E{p}{i}': ['Person'] for p in (1, 2) for i in range(4)}
    tbe.update({f'E3{i}': ['Other'] for i in range(4)})
    ctx = build_context(rd.from_pandas(pd.DataFrame(rows)),
                        page_type_fn=lambda u: 'List',
                        facts_ref=ray.put((tbe, {}))).materialize()
    out = mine_type_rules(ctx, mean_threshold=0.0, min_pages=1).to_pandas()
    person = out[out['target'] == 'Person'].iloc[0]
    # micro_mean = 8/12; conf = [1, 1]; page_count = 3 (page 3 active via 'Other')
    mm = 8 / 12
    assert abs(person['micro_mean'] - round(mm, 6)) < 1e-9
    assert abs(person['macro_mean'] - round(2 / 3, 6)) < 1e-6
    want_std = (2 * abs(mm - 1.0) + (3 - 2) * mm) / 3
    assert abs(person['micro_std'] - want_std) < 1e-6
    assert person['page_count'] == 3 and person['n_pages'] == 2
    # a std_threshold below want_std suppresses the rule
    strict = mine_type_rules(ctx, mean_threshold=0.0, min_pages=1,
                             std_threshold=want_std - 1e-6).to_pandas()
    got_targets = set(strict['target']) if 'target' in strict.columns else set()
    assert 'Person' not in got_targets
