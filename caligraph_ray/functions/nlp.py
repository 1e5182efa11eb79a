"""Deterministic lexical-head helpers (reference impl/util/nlp.py M14-M16
spaCy stages, re-expressed rule-based — no models in this environment).

* ``singularize`` — minimal English rules (the subset the reference gets
  from the ``inflection`` package for category head nouns).
* ``lexical_head`` — the head noun of a category-style label: last word of
  the phrase before the first preposition ('Countries by GDP' → 'Countries',
  'People from Paris' → 'People').
* ``has_plural_head`` — the conceptual-category filter (reference
  nlp.py:109-114 + category/graph.py:62-71): keep categories whose lexical
  head subject is plural ('Countries …' yes, 'Paris' no).
* ``singularize_phrase`` — singular form of the head within the phrase with
  casing transfer (reference nlp.py:143-155).
"""

from __future__ import annotations

import re
from typing import Optional

from .strings import (get_canonical_label, tokenize, tokenize_with_ws,
                      transfer_word_casing)

_IRREGULAR = {
    'people': 'person', 'men': 'man', 'women': 'woman', 'children': 'child',
    'feet': 'foot', 'teeth': 'tooth', 'geese': 'goose', 'mice': 'mouse',
    'lives': 'life', 'wives': 'wife', 'leaves': 'leaf', 'halves': 'half',
    'criteria': 'criterion', 'phenomena': 'phenomenon', 'media': 'medium',
    # latinate/greek plurals common in category heads (inflection rules
    # matrices$/indices$/^oxen$ + the (cris|the|…)(sis|ses)$ family)
    'matrices': 'matrix', 'indices': 'index', 'vertices': 'vertex',
    'appendices': 'appendix', 'codices': 'codex', 'oxen': 'ox',
    'crises': 'crisis', 'theses': 'thesis', 'analyses': 'analysis',
    'diagnoses': 'diagnosis', 'hypotheses': 'hypothesis',
    'parentheses': 'parenthesis', 'synopses': 'synopsis',
    # -s nouns the generic rules mangle (spaCy lemmatizes these; the
    # stand-in pins the net reference output)
    'gases': 'gas', 'lenses': 'lens', 'quizzes': 'quiz',
    'aliases': 'alias', 'buses': 'bus', 'busses': 'bus',
    'geniuses': 'genius',
}
# words ending in s that are not plurals
_NOT_PLURAL = frozenset({
    'species', 'series', 'news', 'mathematics', 'physics', 'politics',
    'economics', 'athletics', 'analysis', 'basis', 'crisis', 'tennis',
    'chess', 'class', 'glass', 'grass', 'brass', 'bus', 'status', 'campus',
    'virus', 'census', 'is', 'its', 'this', 'was', 'has', 'gas', 'lens',
    'ethics', 'statistics', 'linguistics', 'genetics', 'aesthetics',
    'logistics', 'gymnastics', 'electronics', 'optics',
})

_PREPOSITIONS = frozenset({'in', 'from', 'of', 'by', 'at', 'on', 'for',
                           'to', 'with', 'about', 'during', 'near'})

# plurals of -oe nouns keep the e under the -oes rule (shoes → shoe, not
# sho; everything else follows inflection's (o)es$ → o: heroes → hero)
_OES_KEEP_E = frozenset({
    'shoes', 'toes', 'canoes', 'oboes', 'woes', 'foes', 'hoes', 'aloes',
    'throes', 'tiptoes', 'horseshoes', 'backhoes', 'mistletoes',
})
# -ves plurals: f-stem (wolves → wolf), fe-stem (knives → knife);
# anything else keeps the v and drops only the s (caves → cave)
_VES_TO_F = frozenset({
    'wolves', 'werewolves', 'shelves', 'calves', 'halves', 'leaves',
    'loaves', 'thieves', 'scarves', 'elves', 'selves', 'themselves',
    'sheaves', 'hooves', 'dwarves', 'wharves',
})
_VES_TO_FE = frozenset({
    'knives', 'wives', 'lives', 'midwives', 'housewives', 'afterlives',
    'jackknives', 'penknives',
})

# lowercase past participles that END the head phrase of real category
# names ('People born in Paris', 'Companies based in France', 'Species
# described in 1900'): the reference's dependency parse attaches them as
# postmodifiers, so the head is the noun BEFORE them. Irregular forms that
# don't end in -ed need listing; regular -ed forms are caught generically.
_PARTICIPLE_IRREGULAR = frozenset({
    'born', 'built', 'held', 'won', 'written', 'made', 'shot', 'drawn',
    'known', 'begun', 'set', 'sung', 'given', 'run', 'taken', 'broken',
    'chosen', 'grown', 'thrown', 'sold', 'bought', 'found', 'lost',
})


# words ending in -men that are not plurals of -man
_NOT_MEN_PLURAL = frozenset({
    'abdomen', 'specimen', 'regimen', 'ramen', 'stamen', 'acumen', 'albumen',
    'lumen', 'hymen', 'omen', 'amen', 'semen', 'men',
})


def singularize(word: str) -> str:
    """Singular form of an English noun (rule subset; deterministic).
    Handles compound irregulars ('sportswomen' → 'sportswoman') the way the
    reference gets them from the ``inflection`` package."""
    lw = word.lower()
    if lw in _IRREGULAR:
        return transfer_word_casing(word, _IRREGULAR[lw])
    # compound -women/-men ('sportswomen', 'businessmen')
    if lw.endswith('women'):
        return word[:-5] + transfer_word_casing(word[-5:], 'woman')
    if lw.endswith('men') and len(lw) > 4 and lw not in _NOT_MEN_PLURAL:
        return word[:-3] + transfer_word_casing(word[-3:], 'man')
    if lw in _NOT_PLURAL or len(lw) < 3 or not lw.endswith('s'):
        return word
    if lw.endswith('movies'):
        # the inflection package's one explicit -ies special case
        # ((m)ovies$ → movie); 'Movies in Paris' classes must not
        # become 'Movy in Paris'
        return word[:-1]
    if lw.endswith('ies') and len(lw) > 4:
        if lw[-4] in 'aeiouy':
            # inflection's rule is ([^aeiouy]|qu)ies → y; vowel+ies falls
            # through to its generic s$-drop rule
            return word[:-1]
        return word[:-3] + ('Y' if word[-3].isupper() else 'y')
    if lw.endswith('oes') and len(lw) > 4 and lw not in _OES_KEEP_E:
        return word[:-2]   # inflection (o)es$ → o: heroes, volcanoes
    if lw.endswith('ves') and len(lw) > 4:
        if lw in _VES_TO_F:
            return word[:-3] + ('F' if word[-3].isupper() else 'f')
        if lw in _VES_TO_FE:
            return word[:-3] + ('FE' if word[-3].isupper() else 'fe')
        return word[:-1]   # caves → cave, graves → grave
    if lw.endswith('zzes'):
        return word[:-3]   # buzzes → buzz (inflection (quiz)zes shape)
    if lw.endswith('tzes'):
        return word[:-2]   # waltzes → waltz
    if lw.endswith(('ches', 'shes', 'sses', 'xes')):
        return word[:-2]
    if lw.endswith('uses') and len(lw) >= 6 and lw[-5] not in 'aeiou':
        return word[:-2]   # viruses → virus, statuses → status
    if lw.endswith('ss') or lw.endswith('us') or lw.endswith('is'):
        return word
    return word[:-1]


# invariant plurals: singularize() keeps them, but as head SUBJECTS they
# read plural ('Species described in 1900' is a conceptual category)
_INVARIANT_PLURAL = frozenset({'species'})


def is_plural(word: str) -> bool:
    return singularize(word) != word or word.lower() in _INVARIANT_PLURAL


def _is_participle_stop(word: str, collected: list) -> bool:
    """True when ``word`` reads as a past-participle POSTMODIFIER of an
    already-collected plural noun ('People born…', 'Companies based…',
    'Species described…'): lowercase (category names capitalize only the
    first word and proper nouns — 'Manchester United players' must not
    break at 'United'), a regular -ed form or a listed irregular, and at
    least one preceding collected word is a plural noun (so 'Land speed
    record holders' keeps scanning past 'speed')."""
    if not word.islower():
        return False
    if word in _PARTICIPLE_IRREGULAR:
        pass
    elif not (len(word) >= 5 and word.endswith('ed')):
        return False
    return any(w.isalpha() and is_plural(w) for w in collected)


def _head_phrase(label: str) -> list:
    """Words of the lexical-head phrase: everything before the first
    preposition or a participial postmodifier of a plural noun."""
    words = tokenize(get_canonical_label(label))
    head_phrase = []
    for w in words:
        if w.lower() in _PREPOSITIONS:
            break
        if _is_participle_stop(w, head_phrase):
            break
        head_phrase.append(w)
    return head_phrase


def lexical_head(label: str) -> Optional[str]:
    """Head noun of a category-style label: last word of the head phrase
    (before the first preposition / participial postmodifier)."""
    head_words = [w for w in _head_phrase(label) if w.isalpha()]
    return head_words[-1] if head_words else None


_SUBJECT_CONNECTORS = frozenset({'and', 'or', ','})


def lexical_head_subjects(label: str) -> list:
    """ALL subject nouns of the lexical head (reference
    tag_lexical_head_subjects, components.py:47-68): scan the head phrase
    from the END, collecting nouns joined by the subject connectors
    and/or/',' — 'Cities and towns in France' → ['Cities', 'towns'].
    Stops (as the reference does) once the word before a collected subject
    is not a connector."""
    head_phrase = _head_phrase(label)
    subjects = []
    i = len(head_phrase) - 1
    while i >= 0:
        w = head_phrase[i]
        if w in _SUBJECT_CONNECTORS or w.lower() in _SUBJECT_CONNECTORS:
            i -= 1
            continue
        if not w.isalpha():
            break
        subjects.append(w)
        if i == 0 or head_phrase[i - 1].lower() not in _SUBJECT_CONNECTORS:
            break
        i -= 1
    return list(reversed(subjects))


def has_plural_head(label: str) -> bool:
    """Conceptual-category test: ANY lexical-head subject is a plural noun
    (reference has_plural_lexhead_subjects). 'Countries by GDP per capita'
    → True; 'Cities and towns in France' → True; 'Paris' → False."""
    return any(is_plural(s) for s in lexical_head_subjects(label))


def singularize_phrase(label: str) -> str:
    """Singularize EVERY plural head subject, preserving casing, and turn
    the 'and' joining singularized subjects into 'or' ('Cities and towns
    in France' → 'City or town in France'; reference nlp.py:143-155).
    Deviation pinned in tests: the reference's string-level
    ``result.replace('and', 'or')`` also rewrites 'and' INSIDE words
    ('Band and groups' → 'Bor or groups'); this port replaces token-wise."""
    subjects = [s for s in lexical_head_subjects(label) if is_plural(s)]
    if not subjects:
        return label
    toks, ws = tokenize_with_ws(label)
    sub_left = {s: True for s in subjects}
    for i, t in enumerate(toks):
        if sub_left.pop(t, None):
            toks[i] = singularize(t)
            if i + 1 < len(toks) and toks[i + 1] == 'and':
                toks[i + 1] = 'or'
    out = []
    for t, w in zip(toks, ws):
        out.append(t)
        out.append(w)
    return ''.join(out)
