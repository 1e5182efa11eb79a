"""Cat2Ax axiom induction goldens (reference cat2ax.py semantics on the
synthetic category/fact universe)."""

import pandas as pd
import pytest

from caligraph_ray.stages.cat2ax import (apply_patterns_to_label,
                                         build_pattern_tries,
                                         build_type_lexicalisations,
                                         category_sets, category_statistics,
                                         extract_axioms, extract_patterns,
                                         axioms_to_triples, find_child_sets,
                                         _detect)
from caligraph_ray.functions.strings import tokenize


def _fixture_frames():
    """Small category universe with a clean 'People from X' pattern."""
    cities = ['Paris', 'Berlin', 'London', 'Tokyo']
    cat_rows, mem_rows, fact_rows = [], [], []
    for ci, city in enumerate(cities):
        cat = f'People from {city}'
        cat_rows.append({'cat_name': cat, 'parent_cat': 'People by city'})
        for pi in range(3):
            person = f'Person{ci}_{pi}'
            mem_rows.append({'cat_name': cat, 'member': person})
            fact_rows.append({'subj': person, 'pred': 'rdf:type', 'obj': 'Person', 'is_literal': False})
            fact_rows.append({'subj': person, 'pred': 'birthPlace', 'obj': city, 'is_literal': False})
    # a category outside the pattern (no shared affix evidence)
    cat_rows.append({'cat_name': 'Miscellanea', 'parent_cat': 'Main topic classifications'})
    mem_rows.append({'cat_name': 'Miscellanea', 'member': 'Thing1'})
    for city in cities:
        fact_rows.append({'subj': city, 'pred': 'rdf:type', 'obj': 'City', 'is_literal': False})
    return pd.DataFrame(cat_rows), pd.DataFrame(mem_rows), pd.DataFrame(fact_rows)


def test_find_child_sets_affix_grouping():
    docs = {c: tokenize(c) for c in
            ['People from Paris', 'People from Berlin', 'People from London']}
    sets_ = find_child_sets('People by city', docs)
    assert len(sets_) == 1
    assert sets_[0]['first_words'] == ['People', 'from']
    assert sets_[0]['last_words'] == []
    assert sorted(sets_[0]['children']) == sorted(docs)


def test_find_child_sets_back_pattern():
    docs = {c: tokenize(c) for c in
            ['Paris songs', 'Berlin songs', 'London songs', 'Tokyo songs']}
    sets_ = find_child_sets('Songs', docs)
    assert len(sets_) == 1
    assert sets_[0]['last_words'] == ['songs']


def test_cat2ax_end_to_end(ray_session):
    import ray.data as rd
    cats, mems, facts = _fixture_frames()
    cats_ds, mems_ds, facts_ds = (rd.from_pandas(x) for x in (cats, mems, facts))

    axioms = extract_axioms(cats_ds, mems_ds, facts_ds).to_pandas()
    assert not axioms.empty
    by_cat = {c: g for c, g in axioms.groupby('cat_name')}
    for city in ['Paris', 'Berlin', 'London', 'Tokyo']:
        g = by_cat[f'People from {city}']
        kinds = dict(zip(g['axiom'], zip(g['pred'], g['value'])))
        assert kinds.get('type') == ('rdf:type', 'Person')
        assert kinds.get('prop') == ('birthPlace', city)
    assert 'Miscellanea' not in by_cat

    triples = axioms_to_triples(rd.from_pandas(axioms), mems_ds).to_pandas()
    got = set(zip(triples['subj'], triples['pred'], triples['obj']))
    assert ('Person0_0', 'birthPlace', 'Paris') in got
    assert ('Person0_0', 'rdf:type', 'Person') in got
    assert not any(s == 'Thing1' for s, _, _ in got)


def test_pattern_trie_detection():
    cats, mems, facts = _fixture_frames()
    lex = {'people': 'Person', 'person': 'Person'}
    stats = {
        f'People from {c}': {'n': 3, 'types': {'Person': 1.0},
                             'props': {('birthPlace', c): 1.0}}
        for c in ['Paris', 'Berlin', 'London', 'Tokyo']}
    sets_rows = [{'parent': 'People by city',
                  'children': list(stats), 'first_words': ['People', 'from'],
                  'last_words': []}]
    patterns = extract_patterns(sets_rows, stats, lex)
    assert (('People', 'from'), ()) in patterns
    tries = build_pattern_tries(patterns)
    ap, lengths = _detect(tries[0], ['People', 'from', 'Madrid'])
    assert ap is not None and lengths == (2, 0)
    # unseen city but stats present → axiom still applies through the pattern
    stats['People from Madrid'] = {'n': 2, 'types': {'Person': 1.0},
                                   'props': {('birthPlace', 'Madrid'): 1.0}}
    axioms = apply_patterns_to_label('People from Madrid', tries,
                                     stats['People from Madrid'], lex)
    kinds = {a['axiom']: (a['pred'], a['value']) for a in axioms}
    assert kinds['prop'] == ('birthPlace', 'Madrid')
    assert kinds['type'] == ('rdf:type', 'Person')


def test_type_lexicalisations():
    import ray.data as rd
    import pandas as pd
    facts = pd.DataFrame([
        {'subj': 'x', 'pred': 'rdf:type', 'obj': 'Person', 'is_literal': False},
        {'subj': 'y', 'pred': 'rdf:type', 'obj': 'City', 'is_literal': False},
        {'subj': 'z', 'pred': 'rdf:type', 'obj': 'Company', 'is_literal': False},
    ])
    lex = build_type_lexicalisations(rd.from_pandas(facts))
    assert lex['people'] == 'Person'
    assert lex['cities'] == 'City'
    assert lex['companies'] == 'Company'
