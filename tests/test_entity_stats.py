"""A8/A9/Cali2Ax goldens: property frequencies with transitive fallback,
tag probabilities with parent fallback, pattern reuse on output types."""

import pandas as pd
import pytest

from caligraph_ray.stages.taxonomy import ROOT, Hierarchy


@pytest.fixture(scope='module')
def rd(ray_session):
    import ray.data
    return ray.data


def test_property_frequencies_direct(ray_session, rd):
    from caligraph_ray.stages.entity_stats import property_frequencies_per_type
    types = pd.DataFrame({'entity': ['e1', 'e2', 'e3', 'e1'],
                          'type': ['City', 'City', 'Person', 'Settlement']})
    props = pd.DataFrame({'entity': ['e1', 'e1', 'e2', 'e3'],
                          'pred': ['country', 'mayor', 'country', 'born'],
                          'value': ['France', 'Anne', 'France', 'Paris']})
    out = property_frequencies_per_type(rd.from_pandas(types), rd.from_pandas(props))
    assert out['City'][('country', 'France')] == 1.0     # 2 of 2
    assert out['City'][('mayor', 'Anne')] == 0.5
    assert out['Person'][('born', 'Paris')] == 1.0


def test_property_frequencies_transitive_fallback(ray_session, rd):
    """A parent type with < 5 direct entities uses rolled-up descendant
    counts (reference entity.py:335-352)."""
    from caligraph_ray.stages.entity_stats import property_frequencies_per_type
    h = Hierarchy()
    h.add_edge(ROOT, 'Place')
    h.add_edge('Place', 'City')
    # Place has 1 direct entity; City has 5 (>= min_support)
    rows_t = [{'entity': 'p0', 'type': 'Place'}]
    rows_p = [{'entity': 'p0', 'pred': 'a', 'value': 'x'}]
    for i in range(5):
        rows_t.append({'entity': f'c{i}', 'type': 'City'})
        rows_p.append({'entity': f'c{i}', 'pred': 'country', 'value': 'France'})
    out = property_frequencies_per_type(rd.from_pandas(pd.DataFrame(rows_t)),
                                        rd.from_pandas(pd.DataFrame(rows_p)),
                                        hierarchy=h)
    # City: direct (5 entities) → country 5/5
    assert out['City'][('country', 'France')] == 1.0
    # Place: 1 direct entity < 5 → transitive: 6 entities, country 5/6, a 1/6
    assert abs(out['Place'][('country', 'France')] - 5 / 6) < 1e-9
    assert abs(out['Place'][('a', 'x')] - 1 / 6) < 1e-9


def test_tag_probabilities_and_valid_tags(ray_session, rd):
    from caligraph_ray.stages.entity_stats import (tag_probabilities,
                                                   valid_tags_for_types)
    mentions = pd.DataFrame({
        'entity': ['e1'] * 3 + ['e2'] * 2 + ['e3'],
        'tag': ['PER', 'PER', 'LOC', 'PER', 'PER', 'ORG'],
    })
    types = pd.DataFrame({'entity': ['e1', 'e2', 'e3'],
                          'type': ['Person', 'Person', 'Company']})
    probas = tag_probabilities(rd.from_pandas(mentions), rd.from_pandas(types))
    assert abs(probas['Person']['PER'] - 4 / 5) < 1e-9
    assert abs(probas['Person']['LOC'] - 1 / 5) < 1e-9
    assert probas['Company']['ORG'] == 1.0
    # threshold 0.35 keeps PER for Person, drops LOC
    h = Hierarchy()
    h.add_edge(ROOT, 'Person')
    h.add_edge('Person', 'Politician')
    probas['Politician'] = {}   # type with no surviving tags
    valid = valid_tags_for_types(probas, hierarchy=h)
    assert valid['Person'] == {'PER'}
    assert valid['Politician'] == {'PER'}   # parent fallback
    assert valid['Company'] == {'ORG'}


def test_cali2ax_reuses_patterns_on_types(ray_session, rd):
    """Patterns mined from 'People from X' categories apply to an OUTPUT
    type with the same label shape, using the type's property freqs."""
    from caligraph_ray.stages.entity_stats import (cali2ax_axioms,
                                                   cali2ax_triples)
    cats, members, facts = [], [], []
    cities = ['Paris', 'Berlin', 'Rome']
    for c in cities:
        cat = f'People from {c}'
        cats.append({'cat_name': cat, 'parent_cat': 'People by city'})
        for i in range(3):
            e = f'P{c}{i}'
            members.append({'cat_name': cat, 'member': e})
            facts.append({'subj': e, 'pred': 'birthPlace', 'obj': c,
                          'is_literal': False})
            facts.append({'subj': e, 'pred': 'rdf:type', 'obj': 'Person',
                          'is_literal': False})
    # output type with the same label family + its own entities
    type_ents = pd.DataFrame({'entity': [f'N{i}' for i in range(3)],
                              'type': ['People from Madrid'] * 3})
    facts += [{'subj': f'N{i}', 'pred': 'birthPlace', 'obj': 'Madrid',
               'is_literal': False} for i in range(3)]
    axioms = cali2ax_axioms(
        rd.from_pandas(pd.DataFrame(cats)),
        rd.from_pandas(pd.DataFrame(members)),
        rd.from_pandas(pd.DataFrame(facts)),
        rd.from_pandas(type_ents),
        type_labels={'People from Madrid': 'People from Madrid'}).to_pandas()
    assert len(axioms) == 1
    ax = axioms.iloc[0]
    assert (ax['type'], ax['pred'], ax['value']) == \
        ('People from Madrid', 'birthPlace', 'Madrid')
    triples = cali2ax_triples(rd.from_pandas(axioms),
                              rd.from_pandas(type_ents)).to_pandas()
    got = set(zip(triples['subj'], triples['pred'], triples['obj']))
    assert got == {(f'N{i}', 'birthPlace', 'Madrid') for i in range(3)}


def test_cali2ax_literal_axiom_keeps_literal_flag(ray_session, rd):
    """An axiom mined from literal-valued facts must materialize literal
    triples (is_literal=True), exactly as the fact table states them."""
    from caligraph_ray.stages.entity_stats import (cali2ax_axioms,
                                                   cali2ax_triples)
    cats, members, facts = [], [], []
    for c in ['1990', '1991', '1992']:
        cat = f'People from {c}'
        cats.append({'cat_name': cat, 'parent_cat': 'People by year'})
        for i in range(3):
            e = f'P{c}{i}'
            members.append({'cat_name': cat, 'member': e})
            facts.append({'subj': e, 'pred': 'birthYear', 'obj': c,
                          'is_literal': True})
            facts.append({'subj': e, 'pred': 'rdf:type', 'obj': 'Person',
                          'is_literal': False})
    type_ents = pd.DataFrame({'entity': ['N0', 'N1'],
                              'type': ['People from 1995'] * 2})
    facts += [{'subj': n, 'pred': 'birthYear', 'obj': '1995',
               'is_literal': True} for n in ['N0', 'N1']]
    axioms = cali2ax_axioms(
        rd.from_pandas(pd.DataFrame(cats)),
        rd.from_pandas(pd.DataFrame(members)),
        rd.from_pandas(pd.DataFrame(facts)),
        rd.from_pandas(type_ents),
        type_labels={'People from 1995': 'People from 1995'}).to_pandas()
    assert len(axioms) == 1 and bool(axioms.iloc[0]['is_literal'])
    triples = cali2ax_triples(rd.from_pandas(axioms),
                              rd.from_pandas(type_ents)).to_pandas()
    assert len(triples) == 2 and triples['is_literal'].all()
