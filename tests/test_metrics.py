"""Evaluation-harness goldens (NER scenarios, ED cluster metrics) and the
S5/S6 benchmark readers on synthetic fixture files."""

import json

import pytest

from caligraph_ray.functions.metrics import (ari, b_cubed, ceaf_e, ed_metrics,
                                             me_prf, muc, ner_span_metrics,
                                             nmi)


def test_ner_scenarios():
    gold = [(0, 2, 'PER'), (5, 7, 'LOC'), (10, 12, 'ORG')]
    pred = [(0, 2, 'PER'),    # strict correct
            (5, 6, 'LOC'),    # boundary off, type right
            (20, 22, 'MISC')]  # spurious
    m = ner_span_metrics(pred, gold)
    # strict: 1 correct, 1 incorrect, 1 spurious, 1 missed
    assert m['strict']['correct'] == 1 and m['strict']['incorrect'] == 1
    assert m['strict']['spurious'] == 1 and m['strict']['missed'] == 1
    assert abs(m['strict']['precision'] - 1 / 3) < 1e-9
    assert abs(m['strict']['recall'] - 1 / 3) < 1e-9
    # partial: boundary-off overlap counts 0.5
    assert m['partial']['partial'] == 1
    assert abs(m['partial']['precision'] - 1.5 / 3) < 1e-9
    # type: overlap with right type counts fully
    assert m['type']['correct'] == 2
    assert abs(m['type']['precision'] - 2 / 3) < 1e-9


def test_perfect_prediction_all_ones():
    gold = [(0, 2, 'PER'), (3, 4, 'LOC')]
    m = ner_span_metrics(gold, gold)
    for scen in ('strict', 'exact', 'partial', 'type'):
        assert m[scen]['f1'] == 1.0


def test_me_prf():
    gold = {1: 'A', 2: 'A', 3: 'B'}
    pred = {1: 'A', 2: 'B', 4: 'C'}
    m = me_prf(pred, gold)
    assert abs(m['precision'] - 1 / 3) < 1e-9
    assert abs(m['recall'] - 1 / 3) < 1e-9


def test_b_cubed_textbook():
    # classic example: gold {1,2,3,4,5} one cluster; pred splits {1,2}/{3,4,5}
    gold = {i: 'g' for i in range(1, 6)}
    pred = {1: 'a', 2: 'a', 3: 'b', 4: 'b', 5: 'b'}
    m = b_cubed(pred, gold)
    assert abs(m['precision'] - 1.0) < 1e-9
    # recall: 2 mentions see 2/5, 3 see 3/5 → (2*2/5 + 3*3/5)/5 = 13/25
    assert abs(m['recall'] - 13 / 25) < 1e-9


def test_muc_textbook():
    gold = {i: 'g' for i in range(1, 5)}        # one 4-cluster: 3 links
    pred = {1: 'a', 2: 'a', 3: 'b', 4: 'b'}     # two 2-clusters
    m = muc(pred, gold)
    # recall: key cluster of 4 partitioned into 2 → (4-2)/(4-1) = 2/3
    assert abs(m['recall'] - 2 / 3) < 1e-9
    # precision: each response cluster intact in key → (2-1)+(2-1) / (1+1) = 1
    assert abs(m['precision'] - 1.0) < 1e-9


def test_ceaf_e_perfect_and_split():
    gold = {1: 'g1', 2: 'g1', 3: 'g2'}
    assert ceaf_e(gold, gold)['f1'] == 1.0
    pred = {1: 'a', 2: 'b', 3: 'c'}   # fully split
    m = ceaf_e(pred, gold)
    # best alignment: {1}↔g1 (φ4 = 2*1/3), {3}↔g2 (2*1/2=1) → total 5/3
    assert abs(m['precision'] - (2 / 3 + 1.0) / 3) < 1e-9
    assert abs(m['recall'] - (2 / 3 + 1.0) / 2) < 1e-9


def test_nmi_ari_bounds():
    gold = {1: 'x', 2: 'x', 3: 'y', 4: 'y'}
    assert abs(nmi(gold, gold) - 1.0) < 1e-9
    assert ari(gold, gold) == 1.0
    flipped = {1: 'p', 2: 'q', 3: 'p', 4: 'q'}  # orthogonal clustering
    assert nmi(flipped, gold) < 0.01
    assert ari(flipped, gold) <= 0.0
    full = ed_metrics(gold, gold)
    assert full['me']['f1'] == 1.0 and full['b3']['f1'] == 1.0
    assert full['ceaf_e']['f1'] == 1.0 and full['muc']['f1'] == 1.0


def test_nilk_reader(ray_session, tmp_path):
    from caligraph_ray.sources.benchmarks import NEW_ENTITY_BASE, read_nilk_jsonl
    rows = [
        {'id': 'ex1', 'mention': 'Paris', 'context': 'born in Paris in 1990',
         'offset': 8, 'length': 5, 'wikipedia_page_id': 11,
         'wikidata_id': 'Q90', 'nil': False},
        {'id': 'ex2', 'mention': 'Foo', 'context': 'Foo is new',
         'offset': 0, 'length': 3, 'wikipedia_page_id': 12,
         'wikidata_id': 'Q999999', 'nil': True},
        {'id': 'ex3', 'mention': 'Gone', 'context': 'Gone page',
         'offset': 0, 'length': 4, 'wikipedia_page_id': 99,
         'wikidata_id': 'Q1', 'nil': False},
    ]
    p = tmp_path / 'nilk.jsonl'
    p.write_text('\n'.join(json.dumps(r) for r in rows))
    out = read_nilk_jsonl(str(p), known_page_ids={11, 12},
                          wikidata_to_ent={'Q90': 42}).to_pandas()
    assert len(out) == 2           # ex3 dropped: unknown page
    ex1 = out[out['example_id'] == 'ex1'].iloc[0]
    assert ex1['ent_id'] == 42 and ex1['left_text'] == 'born in'
    assert ex1['right_text'] == 'in 1990' and not ex1['is_nil']
    ex2 = out[out['example_id'] == 'ex2'].iloc[0]
    assert ex2['is_nil'] and ex2['ent_id'] >= NEW_ENTITY_BASE


def test_gold_ner_reader(ray_session, tmp_path):
    from caligraph_ray.sources.benchmarks import read_gold_ner_jsonl
    rows = [{'content': 'John Smith lives in Paris',
             'annotation': [
                 {'points': [{'start': 0, 'end': 9}], 'label': ['PER']},
                 {'points': [{'start': 20, 'end': 24}], 'label': ['LOC']}]}]
    p = tmp_path / 'gold.jsonl'
    p.write_text('\n'.join(json.dumps(r) for r in rows))
    out = read_gold_ner_jsonl(str(p)).to_pandas()
    assert len(out) == 1
    ents = [list(e) for e in out.iloc[0]['entities']]
    assert ents == [[0, 10, 'PER'], [20, 25, 'LOC']]   # end exclusive
