"""Expanded M14-M16 golden set over REAL Wikipedia category-name
distributions (VERDICT r3 'what's missing' #3): the rule stand-ins for the
reference's spaCy stages (tag_lexical_head components.py:12-67,
has_plural_lexhead_subjects nlp.py:109-114, singularize_phrase
nlp.py:143-155 + inflection.singularize) must agree with the reference's
NET output on the naming patterns that dominate the category namespace —
participial postmodifiers ('People born in X', 'Companies based in Y'),
coordinated heads, attributive participles, hyphenated eras, and the
latinate/-oes/-ves plural families."""

import pytest

from caligraph_ray.functions.nlp import (has_plural_head, is_plural,
                                         lexical_head,
                                         lexical_head_subjects, singularize,
                                         singularize_phrase)

# (label, lexical_head, subjects, conceptual?) — heads per the reference's
# dependency-parse semantics: the noun the category classifies by
HEAD_GOLDENS = [
    # preposition boundary (the classic shapes)
    ('Countries in Europe', 'Countries', ['Countries'], True),
    ('Rivers of France', 'Rivers', ['Rivers'], True),
    ('Lists of rivers of Europe', 'Lists', ['Lists'], True),
    ('People from Paris', 'People', ['People'], True),
    ('Fauna of the United States', 'Fauna', ['Fauna'], False),
    # participial postmodifier of a plural head — the reference parse
    # attaches these as reduced relative clauses, head stays the noun
    ('People born in Paris', 'People', ['People'], True),
    ('Companies based in France', 'Companies', ['Companies'], True),
    ('Companies established in 1900', 'Companies', ['Companies'], True),
    ('Populated places established in the 19th century',
     'places', ['places'], True),
    ('Buildings and structures completed in 1900',
     'structures', ['Buildings', 'structures'], True),
    ('Songs written by Bob Dylan', 'Songs', ['Songs'], True),
    ('Films directed by Akira Kurosawa', 'Films', ['Films'], True),
    ('Albums produced by George Martin', 'Albums', ['Albums'], True),
    ('Species described in 1900', 'Species', ['Species'], True),
    ('States and territories established in 1900',
     'territories', ['States', 'territories'], True),
    ('Ships built in Glasgow', 'Ships', ['Ships'], True),
    ('People educated at Eton College', 'People', ['People'], True),
    ('Battles won by France', 'Battles', ['Battles'], True),
    # attributive participles / capitalized modifiers must NOT break
    ('Manchester United players', 'players', ['players'], True),
    ('Armed forces of Norway', 'forces', ['forces'], True),
    ('Self-published authors', 'authors', ['authors'], True),
    ('Horse racing venues', 'venues', ['venues'], True),
    ('Land speed record holders', 'holders', ['holders'], True),
    ('Abandoned buildings and structures',
     'structures', ['buildings', 'structures'], True),
    # no preposition at all
    ('21st-century American novelists', 'novelists', ['novelists'], True),
    ('Association football defenders', 'defenders', ['defenders'], True),
    # coordinated heads
    ('Cities and towns in France', 'towns', ['Cities', 'towns'], True),
    ('Museums and galleries in London',
     'galleries', ['Museums', 'galleries'], True),
    # singular head → not conceptual
    ('Paris', 'Paris', ['Paris'], False),
    ('History of France', 'History', ['History'], False),
    ('Economy of Japan', 'Economy', ['Economy'], False),
]


@pytest.mark.parametrize('label,head,subjects,conceptual', HEAD_GOLDENS)
def test_lexical_head_goldens(label, head, subjects, conceptual):
    assert lexical_head(label) == head
    assert lexical_head_subjects(label) == subjects
    assert has_plural_head(label) is conceptual


# net reference output = spaCy lemma for words it knows, else
# inflection.singularize — the realistic category-head plural families
SINGULARIZE_GOLDENS = {
    # -oes family ((o)es$ → o, with -oe stems keeping the e)
    'heroes': 'hero', 'volcanoes': 'volcano', 'potatoes': 'potato',
    'tomatoes': 'tomato', 'echoes': 'echo', 'torpedoes': 'torpedo',
    'mosquitoes': 'mosquito', 'shoes': 'shoe', 'canoes': 'canoe',
    'toes': 'toe', 'oboes': 'oboe',
    # -ves family
    'wolves': 'wolf', 'shelves': 'shelf', 'calves': 'calf',
    'thieves': 'thief', 'loaves': 'loaf', 'scarves': 'scarf',
    'knives': 'knife', 'wives': 'wife', 'lives': 'life',
    'leaves': 'leaf', 'halves': 'half', 'caves': 'cave',
    'graves': 'grave', 'waves': 'wave', 'olives': 'olive',
    'motives': 'motive', 'archives': 'archive',
    # latinate / greek
    'matrices': 'matrix', 'indices': 'index', 'vertices': 'vertex',
    'appendices': 'appendix', 'oxen': 'ox', 'crises': 'crisis',
    'theses': 'thesis', 'analyses': 'analysis', 'diagnoses': 'diagnosis',
    'hypotheses': 'hypothesis', 'parentheses': 'parenthesis',
    # -us / -uses
    'buses': 'bus', 'viruses': 'virus', 'statuses': 'status',
    'censuses': 'census', 'campuses': 'campus', 'geniuses': 'genius',
    'houses': 'house', 'blouses': 'blouse', 'spouses': 'spouse',
    'causes': 'cause',
    # sibilant endings
    'churches': 'church', 'beaches': 'beach', 'bushes': 'bush',
    'boxes': 'box', 'taxes': 'tax', 'prizes': 'prize', 'sizes': 'size',
    'quizzes': 'quiz', 'waltzes': 'waltz', 'aliases': 'alias',
    'gases': 'gas', 'lenses': 'lens', 'roses': 'rose',
    # -ies
    'countries': 'country', 'cities': 'city', 'companies': 'company',
    'universities': 'university', 'movies': 'movie', 'series': 'series',
    # irregular / compound
    'people': 'person', 'children': 'child', 'sportswomen': 'sportswoman',
    'businessmen': 'businessman', 'geese': 'goose', 'criteria': 'criterion',
    # invariant non-plurals stay put
    'species': 'species', 'physics': 'physics', 'news': 'news',
    'ethics': 'ethics', 'statistics': 'statistics', 'chess': 'chess',
    'campus': 'campus', 'status': 'status', 'abdomen': 'abdomen',
}


@pytest.mark.parametrize('plural,singular', sorted(SINGULARIZE_GOLDENS.items()))
def test_singularize_goldens(plural, singular):
    assert singularize(plural) == singular
    # casing transfer: capitalized input keeps its capital
    assert singularize(plural.capitalize()) == (
        singular.capitalize() if plural.lower() != singular.lower()
        or plural[0].lower() == singular[0].lower() else singular)


@pytest.mark.parametrize('word', ['lens', 'virus', 'crisis', 'basis',
                                  'campus', 'status', 'gas', 'series',
                                  'physics', 'chess'])
def test_not_plural(word):
    assert not is_plural(word)


PHRASE_GOLDENS = [
    ('Countries in Europe', 'Country in Europe'),
    ('Cities and towns in France', 'City or town in France'),
    ('People born in Paris', 'Person born in Paris'),
    ('Songs written by Bob Dylan', 'Song written by Bob Dylan'),
    ('Companies based in France', 'Company based in France'),
    ('Volcanoes of Chile', 'Volcano of Chile'),
    ('Wolves in folklore', 'Wolf in folklore'),
    ('Heroes of the Soviet Union', 'Hero of the Soviet Union'),
    ('Paris', 'Paris'),                      # no plural head: unchanged
    ('History of France', 'History of France'),
]


@pytest.mark.parametrize('label,expected', PHRASE_GOLDENS)
def test_singularize_phrase_goldens(label, expected):
    assert singularize_phrase(label) == expected
