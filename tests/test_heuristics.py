"""Hearst matcher, hypernym counts, domain/range, disjointness, EDIN vote,
sampling, sunburst (M17/A1/A10/A11/D7/O5/S9)."""

import pandas as pd
import pytest

from caligraph_ray.stages.heuristics import (domain_range, hearst_matches,
                                             hypernym_counts,
                                             type_disjointness)


def test_hearst_matches_patterns():
    pairs = hearst_matches('cities such as Paris and Berlin')
    assert ('Paris', 'cities') in pairs
    assert hearst_matches('such composers as Bach')[0] == ('Bach', 'composers')
    assert ('apples', 'fruits') in hearst_matches('fruits, including apples')
    assert ('Dijkstra', 'computer scientists') in \
        hearst_matches('Dijkstra and other computer scientists')
    assert ('Paris', 'city') in hearst_matches('Paris is a city')
    assert hearst_matches('nothing to see here') == []


def test_hypernym_counts(ray_session):
    import ray.data as rd
    docs = pd.DataFrame({'text': [
        'cities such as Paris', 'cities such as Paris', 'cities such as Berlin',
        'Paris is a city',
    ]})
    out = hypernym_counts(rd.from_pandas(docs)).to_pandas()
    got = {(r['sub'], r['hyper']): r['freq'] for _, r in out.iterrows()}
    assert got[('paris', 'cities')] == 2
    assert got[('berlin', 'cities')] == 1
    assert got[('paris', 'city')] == 1


def test_domain_range(ray_session):
    import ray.data as rd
    facts = pd.DataFrame([
        {'subj': f'P{i}', 'pred': 'birthPlace', 'obj': f'C{i % 3}', 'is_literal': False}
        for i in range(10)])
    types = {f'P{i}': ['Person'] for i in range(10)}
    types.update({f'C{i}': ['City'] for i in range(3)})
    # one noisy subject type that must not reach the 0.96 domain bar alone
    facts2 = pd.concat([facts, pd.DataFrame([
        {'subj': 'X', 'pred': 'birthPlace', 'obj': 'C0', 'is_literal': False}])])
    types['X'] = ['Company']
    out = domain_range(rd.from_pandas(facts2), types)
    row = out[out['pred'] == 'birthPlace'].iloc[0]
    assert row['domain'] is None  # 10/11 = 0.909 < 0.96
    assert row['range'] == 'City'  # 1.0 ≥ 0.77


def test_type_disjointness(ray_session):
    import ray.data as rd
    rows = []
    for i in range(5):
        rows.append({'subj': f'P{i}', 'pred': 'birthDate', 'obj': 'x', 'is_literal': True})
        rows.append({'subj': f'P{i}', 'pred': 'spouse', 'obj': 'y', 'is_literal': False})
        rows.append({'subj': f'L{i}', 'pred': 'population', 'obj': 'z', 'is_literal': True})
        rows.append({'subj': f'L{i}', 'pred': 'country', 'obj': 'w', 'is_literal': False})
        rows.append({'subj': f'A{i}', 'pred': 'birthDate', 'obj': 'x', 'is_literal': True})
        rows.append({'subj': f'A{i}', 'pred': 'spouse', 'obj': 'y', 'is_literal': False})
    types = {}
    for i in range(5):
        types[f'P{i}'] = ['Person']
        types[f'L{i}'] = ['Place']
        types[f'A{i}'] = ['Artist']
    out = type_disjointness(rd.from_pandas(pd.DataFrame(rows)), types)
    pairs = {frozenset((r['type_a'], r['type_b'])) for _, r in out.iterrows()}
    assert frozenset(('Person', 'Place')) in pairs     # orthogonal predicates
    assert frozenset(('Person', 'Artist')) not in pairs  # identical usage


def test_edin_clusters(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.canonicalize import edin_clusters
    rows = []
    # cluster A: 3 mentions of 'acme', 2 link to Acme strongly → entity kept
    for i in range(3):
        rows.append({'mention_uid': 10 + i, 'norm_surface': 'acme',
                     'entity': 'Acme' if i < 2 else None,
                     'link_score': 1.0 if i < 2 else 0.0})
    # cluster B: 2 mentions of 'zzz', no confident entity → NIL cluster
    for i in range(2):
        rows.append({'mention_uid': 20 + i, 'norm_surface': 'zzz',
                     'entity': None, 'link_score': 0.0})
    out = edin_clusters(rd.from_pandas(pd.DataFrame(rows)),
                        cluster_threshold=0.5).to_pandas()
    by_node = out.set_index('node')
    assert by_node.loc[10]['entity'] == 'Acme'
    assert by_node.loc[12]['entity'] == 'Acme'  # swept into the voted cluster
    assert by_node.loc[20]['entity'] is None or pd.isna(by_node.loc[20]['entity'])
    assert by_node.loc[20]['cluster'] == by_node.loc[21]['cluster']


def test_split_and_sample(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.relational import seeded_sample, train_val_test_split
    ds = rd.range(100)
    train, val, test = train_val_test_split(ds, (0.6, 0.2), seed=7)
    assert train.count() == 60 and val.count() == 20 and test.count() == 20
    s1 = sorted(r['id'] for r in seeded_sample(rd.range(100), 0.2, seed=3).take_all())
    s2 = sorted(r['id'] for r in seeded_sample(rd.range(100), 0.2, seed=3).take_all())
    assert s1 == s2 and 5 <= len(s1) <= 40


def test_sunburst_and_stats(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from caligraph_ray.stages.triples import (graph_statistics,
                                              sunburst_type_distribution)
    t = pa.Table.from_pydict({
        'subj': ['a', 'b', 'c', 'a'],
        'pred': ['rdf:type', 'rdf:type', 'rdf:type', 'label'],
        'obj': ['Person', 'Person', 'City', 'A'],
        'is_literal': [False, False, False, True],
    })
    ds = rd.from_arrow(t)
    sb = sunburst_type_distribution(ds)
    assert sb['children'][0] == {'name': 'Person', 'value': 2}
    stats = graph_statistics(ds)
    assert stats['n_triples'] == 4 and stats['n_subjects'] == 3
    assert stats['triples_per_predicate']['rdf:type'] == 3


def test_compute_hypernyms_evidence_merge():
    from caligraph_ray.stages.heuristics import compute_hypernyms, is_hypernym
    axiom = {'city': {'place': 12, 'area': 3}}           # place: weight 2
    wiki = {'city': {'settlement': 150, 'place': 40},    # settlement: weight 1
            'dog': {'animal': 200}}
    web = {'city': {'settlement': 0.9},                  # settlement: +1 → 2
           'dog': {'animal': 0.5}}                       # animal: 1+1 = 2
    h = compute_hypernyms(axiom, wiki, web)
    assert h['city'] == {'place', 'settlement'}   # axiom alone OR two sources
    assert 'area' in axiom['city'] and 'area' not in h['city']  # below threshold
    assert h['dog'] == {'animal'}
    assert is_hypernym(h, 'place', 'city')
    assert is_hypernym(h, 'city', 'city')         # identity
    assert not is_hypernym(h, 'animal', 'city')


def test_serialize_kg_result_files(ray_session, tmp_path):
    import json
    import os
    import ray.data as rd
    import pyarrow as pa
    from caligraph_ray.stages.triples import serialize_kg
    t = pa.Table.from_pydict({
        'subj': ['A', 'A', 'B', 'B', 'C'],
        'pred': ['rdf:type', 'label', 'rdfs:subClassOf', 'mentionedIn', 'bornIn'],
        'obj': ['City', 'A label', 'Place', 'Page1', 'Paris'],
        'is_literal': [False, True, False, False, False],
    })
    counts = serialize_kg(rd.from_arrow(t), str(tmp_path))
    assert counts == {'ontology': 1, 'types': 1, 'labels': 1,
                      'provenance': 1, 'relations': 1}
    stats = json.load(open(tmp_path / 'stats.json'))
    assert stats['n_triples'] == 5 and stats['files']['types'] == 1
    # every family dir holds NT lines
    line = open(os.path.join(tmp_path, 'types',
                             os.listdir(tmp_path / 'types')[0])).read()
    assert '<http://caligraph.org/resource/A>' in line and 'City' in line


def test_sunburst_nested_with_hierarchy(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from caligraph_ray.stages.taxonomy import ROOT, Hierarchy
    from caligraph_ray.stages.triples import sunburst_type_distribution
    t = pa.Table.from_pydict({
        'subj': ['a', 'b', 'c'],
        'pred': ['rdf:type'] * 3,
        'obj': ['City', 'City', 'Place'],
        'is_literal': [False] * 3,
    })
    h = Hierarchy()
    h.add_edge(ROOT, 'Place')
    h.add_edge('Place', 'City')
    out = sunburst_type_distribution(rd.from_arrow(t), hierarchy=h)
    assert out['name'] == 'Thing'
    place = out['children'][0]
    assert place['name'] == 'Place' and place['value'] == 1
    assert place['children'][0] == {'name': 'City', 'value': 2}


def test_domain_range_multi_type_instances(ray_session):
    # the share denominator is typed INSTANCES, not type rows: every
    # subject typed [Person, Agent, Thing] is 100% Person, so Person must
    # clear the 0.96 domain bar (dividing by summed type rows gave 1/3)
    import ray.data as rd
    facts = pd.DataFrame([
        {'subj': f'P{i}', 'pred': 'birthPlace', 'obj': f'C{i % 3}',
         'is_literal': False} for i in range(10)])
    types = {f'P{i}': ['Person', 'Agent', 'Thing'] for i in range(10)}
    types.update({f'C{i}': ['City', 'Place'] for i in range(3)})
    out = domain_range(rd.from_pandas(facts), types)
    row = out[out['pred'] == 'birthPlace'].iloc[0]
    # all three subject types tie at share 1.0; the deterministic
    # tie-break is alphabetical — the point is a domain IS found
    assert row['domain'] == 'Agent'
    assert row['range'] == 'City'


def test_type_disjointness_zero_vector_excluded(ray_session):
    # a type whose idf-damped vector is all-zero (only ubiquitous
    # predicates) has no discriminative evidence and must not be declared
    # disjoint from everything (the SQL replay's 0/0 → NULL excludes it)
    import ray.data as rd
    rows = []
    for t, preds in [('A', ['common', 'onlyA']),
                     ('B', ['common', 'onlyB']),
                     ('Z', ['common'])]:   # Z: ubiquitous-only → zero vector
        for i in range(5):
            for p in preds:
                rows.append({'subj': f'{t}{i}', 'pred': p})
    types = {f'{t}{i}': [t] for t in 'ABZ' for i in range(5)}
    facts = pd.DataFrame(rows)
    facts['obj'] = 'o'
    out = type_disjointness(rd.from_pandas(facts), types)
    pairs = {tuple(sorted((r['type_a'], r['type_b']))) for _, r in out.iterrows()}
    assert ('A', 'B') in pairs          # genuinely disjoint evidence
    assert not any('Z' in p for p in pairs)


def test_hearst_full_reference_inventory():
    """All 7 reference pattern types (hearst_matcher.py:6-36), incl. the
    round-3 additions: particularly, other-than, lemma-'be' is-a forms."""
    assert hearst_matches('sports, particularly football') == \
        [('football', 'sports')]
    assert hearst_matches('animals other than dogs') == [('dogs', 'animals')]
    assert hearst_matches('Beatles were a band') == [('Beatles', 'band')]
    assert hearst_matches('dogs are an example') == [('dogs', 'example')]
    assert hearst_matches('Bach was a composer') == [('Bach', 'composer')]
