"""Byte-identical text extraction + structure parsing goldens.

The per-row invariant of BASELINE.json: engine-extracted text must equal the
corpus ``text`` column byte-for-byte per url. The corpus renders expected
text from the structural model, the extractor from the HTML string — a
mismatch means one side violates the documented spec.
"""

import pyarrow as pa
import pytest

from caligraph_ray.corpus import build_page, generate_pages_table
from caligraph_ray.stages.html_extract import (extract_text, parse_page,
                                               PageParser)


def test_extract_text_byte_identical_all_families():
    t = generate_pages_table(200, seed=42)
    htmls = t.column('html').to_pylist()
    texts = t.column('text').to_pylist()
    urls = t.column('url').to_pylist()
    for url, html, expected in zip(urls, htmls, texts):
        assert extract_text(html) == expected, f"text mismatch for {url}"


def test_extract_text_junk_removal():
    html = (b'<html><head><title>T</title></head><body><h1>T</h1>'
            b'<script>var a = 1 < 2;</script><style>.x{}</style>'
            b'<!-- comment --><p>Hello&nbsp;<b>World</b>!<br/>Next'
            b'<sup class="reference">[3]</sup> &amp; done.</p></body></html>')
    assert extract_text(html) == 'T\nT\nHello World! Next & done.'


def test_parse_person_page_listings():
    rec = build_page(1, seed=42)  # family 1: person page with Works enum
    page = parse_page(rec['url'], rec['html'])
    assert page is not None
    assert page.title == rec['title']
    # the See-also enum sits under a meta top-section and must be dropped
    topsections = {l.topsection for l in page.listings}
    assert 'See also' not in topsections
    assert any(l.ltype == 'enum' for l in page.listings)
    assert page.categories == rec['categories']


def test_parse_list_page_enum_items():
    rec = build_page(3, seed=42)  # list page: big enum + invalid 2-item enum
    page = parse_page(rec['url'], rec['html'])
    assert page is not None
    enums = [l for l in page.listings if l.ltype == 'enum']
    assert len(enums) == 1  # the 2-item 'Minor mentions' enum is invalid
    items = enums[0].items
    assert len(items) >= 4
    # every top-level item links a person as its first mention
    top_items = [i for i in items if i.depth == 1]
    for it in top_items:
        assert it.mentions, f"item without mentions: {it.text}"
        assert it.mentions[0].start == 0
    # nested sub-items exist with depth 2 on some seeds; check leaf flags
    for i, it in enumerate(items[:-1]):
        if items[i + 1].depth > it.depth:
            assert not it.is_leaf


def test_parse_table_page():
    rec = build_page(6, seed=42)  # table page + invalid 1-col table
    page = parse_page(rec['url'], rec['html'])
    assert page is not None
    tables = [l for l in page.listings if l.ltype == 'table']
    assert len(tables) == 1  # 1-col Economy table dropped
    tbl = tables[0]
    assert tbl.header_tokens[:1] == ['Name']
    assert len(tbl.items) >= 3
    for row in tbl.items:
        # city + country cells are linked mentions
        assert len(row.mentions) >= 2


def test_parse_useless_page_filtered():
    rec = build_page(9, seed=42)  # paragraphs only
    assert parse_page(rec['url'], rec['html']) is None


def test_mention_expansion_links_unlinked_occurrences():
    html = (b'<html><head><title>Alpha</title></head><body><h1>Alpha</h1>'
            b'<h2>People</h2><ul>'
            b'<li><a href="/wiki/John_Smith">John Smith</a> in Paris</li>'
            b'<li>John Smith returned</li>'
            b'<li><a href="/wiki/Paris">Paris</a> hosts</li>'
            b'</ul></body></html>')
    page = parse_page('https://ex.org/wiki/Alpha', html)
    assert page is not None
    items = page.listings[0].items
    # item 2 has no anchor but 'John Smith' is known on-page → expanded
    m = items[1].mentions
    assert len(m) == 1 and m[0].name == 'John Smith' and (m[0].start, m[0].end) == (0, 2)


def test_page_parser_batch_schema():
    t = generate_pages_table(20, seed=42)
    out = PageParser()(t)
    assert out.num_rows > 0
    assert set(out.schema.names) >= {'url', 'page_id', 'listing_idx', 'item_idx',
                                     'tokens', 'mentions', 'topsection', 'kind'}
    kinds = set(out.column('kind').to_pylist())
    assert kinds == {'item', 'cat'}


def test_parse_timeout_budget_drops_pathological_page():
    """Per-row parse time budget (reference: 60 s SIGALRM guard,
    page_parser.py:287-301): a page whose parse exceeds ``timeout_s`` lands
    as a kind='drop' row instead of stalling the block; the same page under
    a sane budget parses fine."""
    import pyarrow as pa
    items = ''.join(f'<li><a href="/wiki/E{i}">E{i}</a> alpha beta gamma '
                    f'delta epsilon zeta</li>' for i in range(20000))
    html = (f'<html><head><title>Big</title></head><body><h1>Big</h1>'
            f'<ul>{items}</ul></body></html>').encode()
    t = pa.Table.from_pydict({
        'url': ['https://ex.org/wiki/Big'],
        'html': pa.array([html], pa.binary()),
    })
    out = PageParser(timeout_s=1e-4)(t)
    assert set(out.column('kind').to_pylist()) == {'drop'}
    assert out.column('url').to_pylist() == ['https://ex.org/wiki/Big']
    ok = PageParser(timeout_s=60.0)(t)
    kinds = set(ok.column('kind').to_pylist())
    assert 'drop' not in kinds and 'item' in kinds


def test_parse_drops_are_first_class_rows(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from caligraph_ray.stages.html_extract import (cats_view, items_view,
                                                   parse_drops, parse_pages)
    t = pa.Table.from_pydict({
        'url': ['https://ex.org/wiki/Good', 'https://ex.org/wiki/Bad'],
        'warc_ts': pa.array([0, 0], pa.timestamp('us')),
        'html': pa.array([b'<html><head><title>Good</title></head><body>'
                          b'<h1>Good</h1><ul><li>a x</li><li>b y</li><li>c z</li></ul>'
                          b'</body></html>',
                          None],   # null payload → parser raises → drop row
                         pa.binary()),
        'text': ['', ''],
        'lang': ['en', 'en'],
    })
    parsed = parse_pages(rd.from_arrow(t)).materialize()
    n, urls = parse_drops(parsed)
    assert n == 1 and urls == ['https://ex.org/wiki/Bad']
    # drop rows never leak into the item/category views
    assert all(r['url'] != 'https://ex.org/wiki/Bad'
               for r in items_view(parsed).take_all())
    assert all(r['url'] != 'https://ex.org/wiki/Bad'
               for r in cats_view(parsed).take_all())


def test_columns_list_merges_into_one_enum():
    # three 2-item columns: individually below the >=3 filter, together one
    # logical 6-item enum (reference _convert_special_enums semantics)
    cols = ''.join(f'<ul><li>item {i}a</li><li>item {i}b</li></ul>'
                   for i in range(3))
    html = ('<html><head><title>Cols</title></head><body><h1>Cols</h1>'
            f'<h2>Content</h2><div class="columns-list">{cols}</div>'
            '</body></html>').encode()
    page = parse_page('https://ex.org/wiki/Cols', html)
    assert page is not None
    enums = [l for l in page.listings if l.ltype == 'enum']
    assert len(enums) == 1
    assert len(enums[0].items) == 6
    assert enums[0].items[0].text == 'item 0a'
    assert enums[0].items[5].text == 'item 2b'


def test_enum_inside_table_is_not_a_listing():
    # a <ul> inside a table cell is layout: it must neither count as a
    # standalone enum nor leak into the cell text (reference
    # _remove_enums_within_tables)
    rows = ''.join(
        f'<tr><td>name {i}<ul><li>x</li><li>y</li><li>z</li></ul></td>'
        f'<td>val {i}</td></tr>' for i in range(4))
    html = ('<html><head><title>Tbl</title></head><body><h1>Tbl</h1>'
            '<h2>Content</h2><table><tr><th>Name</th><th>Value</th></tr>'
            f'{rows}</table></body></html>').encode()
    page = parse_page('https://ex.org/wiki/Tbl', html)
    assert page is not None
    assert [l.ltype for l in page.listings] == ['table']
    table = page.listings[0]
    assert table.items[0].text.startswith('name 0')
    assert 'x' not in table.items[0].text.split()


def test_unescape_amp_last():
    from caligraph_ray.stages.html_extract import _unescape
    # '&amp;lt;' is the ESCAPED literal text '&lt;' — replacing '&amp;'
    # first would double-unescape it to '<'
    assert _unescape('&amp;lt;b&amp;gt;') == '&lt;b&gt;'
    assert _unescape('&lt;b&gt; &amp; more') == '<b> & more'


def test_expand_mentions_no_overlap():
    from caligraph_ray.stages.html_extract import Mention, _expand_mentions
    tokens = ['New', 'York', 'City', 'Hall']
    anchors = [Mention('City Hall', 'City Hall', 2, 4)]
    index = {'New': [(['New', 'York', 'City'], 'New York City',
                      'New York City')]}
    out = _expand_mentions(tokens, anchors, index)
    # the 3-token expansion would overlap the anchor span — must not emit
    spans = sorted((m.start, m.end) for m in out)
    assert spans == [(2, 4)]
