"""Fuzz the page parser (S1/M4/M5) with generated HTML: structural
invariants that must hold for ANY input the parser accepts —

* parse_page never raises on tag soup assembled from its own grammar
  (lists, tables, anchors, sections, junk text, category blocks);
* every mention span indexes the item's token list (0 ≤ start < end ≤
  len(tokens)) — the invariant the downstream chunker/linker relies on;
* inserted [[Category:…]] links round-trip into ParsedPage.categories;
* item/listing indices are dense and listing types are in {list, table}.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

PURE = settings(max_examples=120, deadline=None)

_WORDS = ['Paris', 'lists', 'of', 'rivers', '&amp;', 'x1']
_TARGETS = ['Seine', 'Rhine_River', 'Lo ire']


@st.composite
def page_html(draw):
    parts = ['<html><title>List of rivers</title><body>']
    cats = draw(st.lists(st.sampled_from(['Rivers', 'Geo pages']), max_size=2,
                         unique=True))
    n_sections = draw(st.integers(0, 2))
    for s in range(n_sections):
        parts.append(f'<h2>Section {s}</h2>')
        kind = draw(st.sampled_from(['ul', 'table', 'junk']))
        if kind == 'ul':
            n_items = draw(st.integers(0, 6))
            parts.append('<ul>')
            for _ in range(n_items):
                words = draw(st.lists(st.sampled_from(_WORDS), max_size=4))
                tgt = draw(st.sampled_from(_TARGETS))
                label = draw(st.sampled_from(['Seine', 'the river']))
                parts.append(f'<li>{" ".join(words)} '
                             f'<a href="/wiki/{tgt}">{label}</a></li>')
            parts.append('</ul>')
        elif kind == 'table':
            n_rows = draw(st.integers(0, 5))
            n_cols = draw(st.integers(1, 4))
            parts.append('<table>')
            for r in range(n_rows):
                cells = ''.join(
                    f'<td><a href="/wiki/{draw(st.sampled_from(_TARGETS))}">c{r}{c}</a></td>'
                    for c in range(n_cols))
                parts.append(f'<tr>{cells}</tr>')
            parts.append('</table>')
        else:
            parts.append(draw(st.text(alphabet='<>/ab &;', max_size=30)))
    if cats:
        links = ''.join(f'<a href="/wiki/Category:{c.replace(" ", "_")}">'
                        f'Category:{c}</a>' for c in cats)
        parts.append(f'<div id="catlinks">{links}</div>')
    parts.append('</body></html>')
    return '\n'.join(parts), cats


@PURE
@given(page_html())
def test_parse_page_invariants(page):
    from caligraph_ray.stages.html_extract import parse_page
    html, cats = page
    parsed = parse_page('http://example.org/wiki/List_of_rivers',
                        html.encode('utf-8'))
    if parsed is None:   # usefulness filter rejected the page — valid outcome
        return
    assert set(parsed.categories) == set(cats)
    for li, listing in enumerate(parsed.listings):
        assert listing.ltype in ('enum', 'table')
        for item in listing.items:
            n = len(item.tokens)
            for m in item.mentions:
                assert 0 <= m.start < m.end <= n, (m, item.tokens)
                assert m.name   # resolved target names are non-empty


@PURE
@given(st.text(alphabet='<>/abtdlu i&;="\n', max_size=120))
def test_parse_page_never_raises_on_tag_soup(soup):
    from caligraph_ray.stages.html_extract import parse_page
    html = f'<html><title>t</title><body>{soup}</body></html>'
    parsed = parse_page('http://example.org/wiki/T', html.encode('utf-8'))
    if parsed is not None:
        for listing in parsed.listings:
            for item in listing.items:
                for m in item.mentions:
                    assert 0 <= m.start < m.end <= len(item.tokens)
