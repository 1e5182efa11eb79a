"""Property tests for the round-3 surfaces: wikitext/XML/WARC parser
robustness (fail-soft, never-throw), duplicate-span equivalence to a
brute-force reference, BPE string-replace trick vs a list-based
reference implementation."""

import bz2

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

PURE = settings(max_examples=120, deadline=None)
RAY = settings(max_examples=8, deadline=None,
               suppress_health_check=list(__import__('hypothesis').HealthCheck))

_MARKUPISH = st.text(
    alphabet=st.sampled_from(list("ab =*#|[]{}<>!'\n-:/.") + ['é', '中']),
    max_size=200)


@PURE
@given(_MARKUPISH)
def test_wikitext_parser_total(markup):
    """parse_wikitext_page / wikitext_to_plaintext are TOTAL on arbitrary
    markup-shaped text: ParsedPage or None, never an exception."""
    from caligraph_ray.stages.wikitext import (parse_wikitext_page,
                                               wikitext_to_plaintext)
    txt = wikitext_to_plaintext(markup)
    assert isinstance(txt, str)
    page = parse_wikitext_page('https://ex.org/wiki/Fuzz', markup)
    if page is not None:
        assert page.listings
        for l in page.listings:
            for it in l.items:
                for m in it.mentions:
                    assert 0 <= m.start < m.end <= len(it.tokens)


@PURE
@given(st.binary(max_size=300))
def test_xml_dump_parser_fail_soft(data):
    """Arbitrary bytes (invalid XML, corrupt bz2): parse_wiki_xml yields
    zero or more row groups, never raises."""
    from caligraph_ray.sources.xml_dump import parse_wiki_xml
    rows = [r for grp in parse_wiki_xml(data) for r in grp]
    for r in rows:
        assert isinstance(r[0], str)


@PURE
@given(st.binary(max_size=300))
def test_warc_parser_fail_soft(data):
    from caligraph_ray.sources.warc import parse_warc
    for grp in parse_warc(data):
        assert isinstance(grp, list)


@PURE
@given(st.binary(max_size=200))
def test_nif_parser_fail_soft(data):
    from caligraph_ray.sources.nif import parse_nif_part
    rows = parse_nif_part(data)
    assert isinstance(rows, list)


def test_xml_dump_truncated_part_keeps_complete_pages():
    """A truncated dump part yields the pages completed before the cut."""
    from caligraph_ray.sources.xml_dump import parse_wiki_xml
    xml = (b'<mediawiki>'
           b'<page><title>A</title><ns>0</ns><revision>'
           b'<text>alpha</text></revision></page>'
           b'<page><title>B</title><ns>0</ns><revision>'
           b'<text>beta</text></revision></page>'
           b'<page><title>C</title><ns>0</ns><revision><text>gam')
    rows = [r for grp in parse_wiki_xml(xml) for r in grp]
    assert [r[0] for r in rows] == ['A', 'B']
    # corrupt bz2 after one valid stream: the valid stream's pages survive
    good = bz2.compress(b'<mediawiki>'
                        b'<page><title>A</title><ns>0</ns><revision>'
                        b'<text>alpha</text></revision></page>'
                        b'</mediawiki>')
    rows = [r for grp in parse_wiki_xml(good + b'BZhgarbage') for r in grp]
    assert [r[0] for r in rows] == ['A']


# --- duplicate spans vs brute force ------------------------------------------

_WORD = st.sampled_from(['a', 'b', 'c', 'd'])
_DOC = st.lists(_WORD, min_size=0, max_size=24).map(' '.join)


def _brute_spans(texts, L):
    toks = {d: [t for t in x.split(' ') if t] for d, x in enumerate(texts)}
    hits = {}
    for da in toks:
        for db in toks:
            if da >= db:
                continue
            a, b = toks[da], toks[db]
            for i in range(len(a) - L + 1):
                for j in range(len(b) - L + 1):
                    if a[i:i + L] == b[j:j + L]:
                        hits.setdefault((da, db, i - j), []).append((i, j))
    spans = set()
    for (da, db, _), ij in hits.items():
        ij.sort()
        start = prev = None
        for i, j in ij:
            if prev is not None and i == prev + 1:
                prev = i
                continue
            if start is not None:
                spans.add((da, db, start[0], start[1], prev - start[0] + L))
            start, prev = (i, j), i
        spans.add((da, db, start[0], start[1], prev - start[0] + L))
    return spans


@RAY
@given(st.lists(_DOC, min_size=2, max_size=5))
def test_duplicate_spans_match_brute_force(ray_session, texts):
    import ray.data as rd
    from caligraph_ray.stages.dedup import duplicate_spans
    df = pd.DataFrame({'doc_id': pd.Series(range(len(texts)), dtype='int64'),
                       'text': texts})
    out = duplicate_spans(rd.from_pandas(df).repartition(2),
                          min_len=3).to_pandas()
    got = {(int(r['da']), int(r['db']), int(r['a_start']),
            int(r['b_start']), int(r['length'])) for _, r in out.iterrows()}
    assert got == _brute_spans(texts, 3)


# --- BPE string-replace trick vs list-based reference -------------------------

def _bpe_list_reference(vocab, n_merges):
    items = [(tuple(w) + ('</w>',), f) for w, f in vocab.items()]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in items:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(((-c, p) for p, c in counts.items()))
        pa_, pb = best[1]
        merges.append((f'{pa_} {pb}', pa_ + pb))
        new_items = []
        for syms, f in items:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa_ and syms[i + 1] == pb:
                    out.append(pa_ + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_items.append((tuple(out), f))
        items = new_items
    return merges


@PURE
@given(st.dictionaries(st.text(alphabet='abcd', min_size=1, max_size=5),
                       st.integers(min_value=1, max_value=9),
                       min_size=1, max_size=6),
       st.integers(min_value=1, max_value=6))
def test_bpe_string_replace_equals_list_merge(vocab, n_merges):
    """The double-space-padded string replace (what the SQL oracle
    replays) computes the SAME merges as the canonical list-based greedy
    merge on ALL vocabs — adjacent occurrences ('baba') and identical-
    symbol runs ('aaaa') included, because consecutive pattern
    occurrences never share a character."""
    from caligraph_ray.functions.bpe import bpe_train_from_vocab
    assert bpe_train_from_vocab(vocab, n_merges) == \
        _bpe_list_reference(vocab, n_merges)


def test_bpe_runs_and_adjacent_occurrences_canonical():
    """Regression pins for the two historic single-space-padding bugs:
    'baba' (adjacent occurrences sharing a boundary space) and 'aaaa'
    (identical-symbol run) both now merge in canonical order."""
    from caligraph_ray.functions.bpe import bpe_encode, bpe_train_from_vocab
    for vocab in ({'baba': 1}, {'aaaa': 1}, {'aaaaa': 2, 'baba': 3}):
        for n in (1, 2, 3, 4):
            assert bpe_train_from_vocab(vocab, n) == \
                _bpe_list_reference(vocab, n)
    assert bpe_encode('aaaa', bpe_train_from_vocab({'aaaa': 1}, 4)) \
        == ['aaaa</w>']
    assert bpe_encode('baba', bpe_train_from_vocab({'baba': 1}, 4)) \
        == ['baba</w>']
