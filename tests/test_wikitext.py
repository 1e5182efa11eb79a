"""Wikitext front end (reference page_parser/wikimarkup_parser over wiki
markup): plaintext, wikilink label quirks, sections/enums/tables, and the
XML-dump → wikitext-parse → flagship end-to-end path."""

import bz2

import pytest

from caligraph_ray.stages.wikitext import (parse_wikitext_page,
                                           wikilink_label, wikilink_name,
                                           wikitext_to_plaintext)

MARKUP = """{{Infobox thing|name=Alpha|nested={{x|y}}}}
'''Alpha''' is a page about [[letter]]s.<ref>cite</ref>
== People ==
* [[John Smith]] of [[Paris]]
* [[Jane Doe|Jane]] the writer
* John Smith returned
== Cities ==
{| class="wikitable"
! Name !! Country
|-
| [[Paris]] || [[France]]
|-
| [[Berlin]] || Germany
|-
| [[Madrid]] || Spain
|}
== See also ==
* [[Other page]]
* [[Another]]
* [[Third]]
[[Category:Pages about letters]]
[[Category:Examples|sort key]]
"""


def test_wikilink_reference_quirks():
    # wikimarkup_parser.py:34-47
    assert wikilink_label('Alpha_Beta', None) == 'Alpha_Beta'
    # the <…> TAGS are stripped (content kept), reference remove_bracket
    # _content(bracket_type='<') semantics
    assert wikilink_label('Alpha', 'the <small>styled</small>label') == \
        'the styled label'
    assert wikilink_label('File:X.jpg', 'pic') is None
    assert wikilink_label('T', 'bad|markup|label') == 'label'
    assert wikilink_name('john_smith') == 'John smith'
    assert wikilink_name(':en:Foo') == 'En:Foo'


def test_wikitext_to_plaintext():
    text = wikitext_to_plaintext(MARKUP)
    assert 'Infobox' not in text and '{{' not in text
    assert 'cite' not in text
    assert "'''" not in text
    assert 'Alpha is a page about letters.' in text
    assert 'John Smith of Paris' in text
    assert 'Jane the writer' in text
    assert 'wikitable' not in text          # tables dropped from plaintext
    assert 'Category' not in text


def test_parse_wikitext_page_structure():
    page = parse_wikitext_page('https://ex.org/wiki/Alpha', MARKUP)
    assert page is not None
    assert page.title == 'Alpha'
    assert page.categories == ['Pages about letters', 'Examples']
    # See also is a META top-section: its enum must be dropped
    assert {l.topsection for l in page.listings} == {'People', 'Cities'}
    enum = [l for l in page.listings if l.ltype == 'enum'][0]
    assert [i.text for i in enum.items] == \
        ['John Smith of Paris', 'Jane the writer', 'John Smith returned']
    m0 = enum.items[0].mentions
    assert [(m.name, m.label) for m in m0] == \
        [('John Smith', 'John Smith'), ('Paris', 'Paris')]
    # mention EXPANSION: unlinked 'John Smith' in item 3 resolves on-page
    m2 = enum.items[2].mentions
    assert ('John Smith', 'John Smith') in [(m.name, m.label) for m in m2]
    table = [l for l in page.listings if l.ltype == 'table'][0]
    assert table.header_tokens == ['Name', 'Country']
    assert len(table.items) == 3
    assert table.items[0].text == 'Paris France'
    assert [(m.name, m.start, m.end) for m in table.items[0].mentions] == \
        [('Paris', 0, 1), ('France', 1, 2)]


def test_parse_wikitext_validity_rules():
    # fewer than 3 enum entries → no listing → page filtered entirely
    assert parse_wikitext_page('u', '* [[A]]\n* [[B]]\n') is None
    # 2-row table fails MIN_TABLE_ROWS
    t = '{|\n! H !! I\n|-\n| a || b\n|-\n| c || d\n|}'
    assert parse_wikitext_page('u', t) is None


def test_dump_to_flagship_end_to_end(ray_session, tmp_path):
    """XML dump part → read_wiki_xml_dump → dump_to_pages →
    run_flagship(markup='wikitext') → triples."""
    from caligraph_ray.pipelines.flagship import run_flagship
    from caligraph_ray.sources.xml_dump import (dump_to_pages,
                                                read_wiki_xml_dump)

    def page(title, body):
        return (f'<page><title>{title}</title><ns>0</ns>'
                f'<revision><timestamp>2020-01-01T00:00:00Z</timestamp>'
                f'<text>{body}</text></revision></page>')

    body = ('== People ==\n'
            '* [[John Smith]] of [[Paris]]\n'
            '* [[Jane Doe]] the writer\n'
            '* [[Ada Lovelace]] the pioneer\n'
            '[[Category:People pages]]\n')
    xml = ('<mediawiki>' + page('Alpha Page', body)
           + page('Beta Page', body.replace('Paris', 'Berlin'))
           + '</mediawiki>').encode()
    p = tmp_path / 'dump.xml.bz2'
    p.write_bytes(bz2.compress(xml))

    pages = dump_to_pages(read_wiki_xml_dump(str(p)))
    triples = run_flagship(pages, markup='wikitext')
    rows = {(r['subj'], r['pred'], r['obj'], r['is_literal'])
            for r in triples.take_all()}
    assert ('John Smith', 'mentionedIn', 'Alpha Page', False) in rows
    assert ('John Smith', 'mentionedIn', 'Beta Page', False) in rows
    assert ('John Smith', 'label', 'John Smith', True) in rows
    assert ('Alpha Page', 'subject', 'Category:People pages', False) in rows
