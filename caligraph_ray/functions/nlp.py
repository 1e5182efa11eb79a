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

from .strings import get_canonical_label, tokenize, transfer_word_casing

_IRREGULAR = {
    'people': 'person', 'men': 'man', 'women': 'woman', 'children': 'child',
    'feet': 'foot', 'teeth': 'tooth', 'geese': 'goose', 'mice': 'mouse',
    'lives': 'life', 'wives': 'wife', 'leaves': 'leaf', 'halves': 'half',
    'criteria': 'criterion', 'phenomena': 'phenomenon', 'media': 'medium',
}
# words ending in s that are not plurals
_NOT_PLURAL = frozenset({
    'species', 'series', 'news', 'mathematics', 'physics', 'politics',
    'economics', 'athletics', 'analysis', 'basis', 'crisis', 'tennis',
    'chess', 'class', 'glass', 'grass', 'brass', 'bus', 'status', 'campus',
    'virus', 'census', 'is', 'its', 'this', 'was', 'has', 'gas',
})

_PREPOSITIONS = frozenset({'in', 'from', 'of', 'by', 'at', 'on', 'for',
                           'to', 'with', 'about', 'during', 'near'})


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
    if lw.endswith(('ches', 'shes', 'sses', 'xes', 'zes')):
        return word[:-2]
    if lw.endswith('ss') or lw.endswith('us') or lw.endswith('is'):
        return word
    return word[:-1]


def is_plural(word: str) -> bool:
    return singularize(word) != word


def lexical_head(label: str) -> Optional[str]:
    """Head noun of a category-style label: last word before the first
    preposition of the canonical label."""
    words = tokenize(get_canonical_label(label))
    head_phrase = []
    for w in words:
        if w.lower() in _PREPOSITIONS:
            break
        head_phrase.append(w)
    head_words = [w for w in head_phrase if w.isalpha()]
    return head_words[-1] if head_words else None


def has_plural_head(label: str) -> bool:
    """Conceptual-category test: lexical head is a plural noun.
    'Countries by GDP per capita' → True; 'Paris' → False."""
    head = lexical_head(label)
    return bool(head) and is_plural(head)


def singularize_phrase(label: str) -> str:
    """Replace the plural head with its singular form, preserving casing
    ('Countries by GDP' → 'Country by GDP'; reference nlp.py:143-155)."""
    head = lexical_head(label)
    if not head or not is_plural(head):
        return label
    return re.sub(r'\b' + re.escape(head) + r'\b', singularize(head), label, count=1)
