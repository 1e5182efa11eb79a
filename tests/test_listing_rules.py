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
