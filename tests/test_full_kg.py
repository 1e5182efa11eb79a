"""Full KG pipeline: flagship + Cat2Ax + listing rules over the synthetic
corpus with its companion category/fact tables."""

import pytest

from caligraph_ray.corpus import (category_edges_table, facts_table,
                                  generate_pages_table)


def test_full_kg_includes_axiom_triples(ray_session):
    import ray.data as rd
    from caligraph_ray.pipelines.full_kg import run_full_kg
    n = 120
    pages = rd.from_arrow(generate_pages_table(n)).repartition(4)
    cats = rd.from_arrow(category_edges_table(n))
    facts = rd.from_arrow(facts_table(n))
    triples = run_full_kg(pages, cats, facts)
    rows = {(r['subj'], r['pred'], r['obj']) for r in triples.take_all()}
    preds = {p for _, p, _ in rows}
    # flagship streams
    assert 'mentionedIn' in preds and 'subject' in preds
    # Cat2Ax axioms materialized onto members: persons typed + birthPlace
    typed = {(s, o) for s, p, o in rows if p == 'rdf:type'}
    assert any(o == 'Person' for _, o in typed), 'expected Person type axioms'
    bp = {(s, o) for s, p, o in rows if p == 'birthPlace'}
    assert bp, 'expected birthPlace axioms from People-from-X categories'
    # axiom values must be the city of the category, consistent with facts
    from caligraph_ray.corpus import CITY_COUNTRY
    cities = set(CITY_COUNTRY)
    assert all(o in cities for _, o in bp)
    # taxonomy streams: subClassOf edges from the category hierarchy and
    # rdf:type closure onto members (page titles typed with their category
    # node and its ancestors)
    sub_edges = {(s, o) for s, p, o in rows if p == 'rdfs:subClassOf'}
    assert sub_edges, 'expected rdfs:subClassOf triples from the taxonomy'
    # 'People from <city>' categories merge/attach under a People-headed node
    people_children = {s for s, o in sub_edges if s.startswith('People from ')}
    assert people_children, 'expected People-from-X classes in the taxonomy'
    # members got closure types: some member typed with a parent-level class
    closure_objs = {o for _, o in typed}
    assert any(o in {'People by city', 'People', 'Births by year',
                     'Cities by country'} for o in closure_objs), \
        'expected transitive parent types on members'
