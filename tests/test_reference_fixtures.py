"""Replays of the reference's own unit fixtures (north-star gate:
'correctness is gated by pytest replaying the reference's extraction and
axiom-induction fixtures').

Sources: tests/unit/util/test_nlp.py (by-phrase + plural lexhead),
tests/unit/util/test_serialize.py (IRI / literal encoding). The
final-graph integration surface (tests/integration/caligraph/
test_final_graph.py) is replayed in tests/test_taxonomy.py; the axiom
fixtures in tests/test_cat2ax.py.

Note: the serialize resource fixture is a soft expectation the reference
itself cannot produce (its _resource_to_string splits the prefix at the
LAST '/', which lands inside the '12"/50' name); we assert the fixture's
stated expectation against our whole-name encoder.
"""

from caligraph_ray.functions.nlp import has_plural_head
from caligraph_ray.functions.strings import remove_by_phrase
from caligraph_ray.sources.nt import (encode_resource_name, escape_literal,
                                      name_to_uri)


def test_remove_by_phrase_reference_fixtures():
    # tests/unit/util/test_nlp.py:17-22 (compared lowercase, as there)
    cases = [
        ('Work by Roy Lichtenstein', 'Work by Roy Lichtenstein'),
        ('Work by L. J. Smith', 'Work by L. J. Smith'),
        ('Song recorded by ABBA', 'Song recorded by ABBA'),
        ('Alumni by university or college in Honduras', 'Alumni in Honduras'),
        ('Countries by GDP per capita', 'Countries'),
    ]
    for src, expected in cases:
        assert remove_by_phrase(src).lower() == expected.lower(), src


def test_remove_by_phrase_reference_quirks():
    # deliberate reference-parity quirks (components.py:83-89, 103), pinned
    # so a "fix" can't silently diverge from the reference:
    # 'from' overrides 'in' as the cut point → the in-clause is removed too
    assert remove_by_phrase(
        'Alumni by university in Honduras from 1990') == 'Alumni from 1990'
    # the cut point comes from the LAST by-phrase, so removing an earlier
    # 'by' spans through the later one
    assert remove_by_phrase('Books by author in France by decade') == 'Books'
    # the NNS guard scans to end-of-label: a plural in the kept in-clause
    # vetoes removal entirely
    assert remove_by_phrase(
        'Paintings by year in museums') == 'Paintings by year in museums'


def test_plural_lexhead_reference_fixtures():
    # tests/unit/util/test_nlp.py:31-36
    assert has_plural_head('Reptiles')
    assert has_plural_head('Princesses')
    assert has_plural_head('African musical instruments')
    assert not has_plural_head('London')


def test_resource_encoding_reference_fixture():
    # tests/unit/util/test_serialize.py:6-9
    assert (encode_resource_name('12"/50_caliber_Mark_8_gun')
            == '12%22%2F50_caliber_Mark_8_gun')
    assert (name_to_uri('12"/50 caliber Mark 8 gun', 'http://caligraph.org/resource/')
            == 'http://caligraph.org/resource/12%22%2F50_caliber_Mark_8_gun')


def test_label_encoding_reference_fixture():
    # tests/unit/util/test_serialize.py:12-15
    assert escape_literal('12"/50 caliber Mark 8 gun') == r'12\"/50 caliber Mark 8 gun'


def test_multi_subject_lexhead_reference_semantics():
    """Reference tag_lexical_head_subjects (components.py:47-68) collects
    ALL head subjects joined by and/or/',' and singularize_phrase
    (nlp.py:143-155) singularizes each plural one, turning the joining
    'and' into 'or'."""
    from caligraph_ray.functions.nlp import (has_plural_head,
                                             lexical_head_subjects,
                                             singularize_phrase)
    assert lexical_head_subjects('Cities and towns in France') == \
        ['Cities', 'towns']
    assert singularize_phrase('Cities and towns in France') == \
        'City or town in France'
    assert has_plural_head('Cities and towns in France')
    # a singular first subject stays, and its 'and' is NOT flipped
    # (deviation from the reference's string-level replace('and','or'),
    # which would corrupt 'Band' → 'Bor'; pinned here as token-level)
    assert singularize_phrase('Band and groups from London') == \
        'Band and group from London'
    assert singularize_phrase('Countries by GDP per capita') == \
        'Country by GDP per capita'
