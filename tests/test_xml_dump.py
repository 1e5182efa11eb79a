"""S1-faithful XML dump ingestion (reference impl/wikipedia/xml_parser.py):
streaming expat over read_binary_files, multistream bz2, namespace filter,
pages-schema mapping."""

import bz2
import os

import pyarrow as pa
import pytest

from caligraph_ray.sources.xml_dump import (DUMP_SCHEMA, dump_to_pages,
                                            parse_wiki_xml,
                                            read_wiki_xml_dump)

_NS_URI = 'http://www.mediawiki.org/xml/export-0.10/'


def _page(title, ns, text, ts='2020-01-02T03:04:05Z'):
    return (f'<page><title>{title}</title><ns>{ns}</ns><id>1</id>'
            f'<revision><id>2</id><timestamp>{ts}</timestamp>'
            f'<text xml:space="preserve">{text}</text></revision></page>')


def _dump_xml(pages):
    return (f'<mediawiki xmlns="{_NS_URI}" xml:lang="en">'
            f'<siteinfo><sitename>Wikipedia</sitename></siteinfo>'
            + ''.join(pages) + '</mediawiki>').encode()


PAGES = [
    _page('Alpha Article', 0, "'''Alpha''' is a [[letter]]."),
    _page('Category:Letters', 14, '[[Category:Symbols]]'),
    _page('Template:Infobox', 10, '{{{content}}}'),
    _page('User:Someone', 2, 'user page — must be filtered'),
    _page('Beta &amp; Gamma', 0, 'entity &lt;escapes&gt; decode'),
]


def test_parse_wiki_xml_reference_semantics():
    rows = [r for grp in parse_wiki_xml(_dump_xml(PAGES)) for r in grp]
    # reference namespace filter 0/10/14 (xml_parser.py:52-53): User: dropped
    assert [r[0] for r in rows] == ['Alpha Article', 'Category:Letters',
                                    'Template:Infobox', 'Beta & Gamma']
    assert [r[1] for r in rows] == [0, 14, 10, 0]
    by_title = {r[0]: r[3] for r in rows}
    assert by_title['Alpha Article'] == "'''Alpha''' is a [[letter]]."
    assert by_title['Beta & Gamma'] == 'entity <escapes> decode'


def test_parse_wiki_xml_streaming_flush():
    """Memory bound: with small feed slices the row buffer flushes near
    flush_pages — no group holds the whole part."""
    many = [_page(f'P{i}', 0, f'text {i}') for i in range(25)]
    groups = list(parse_wiki_xml(_dump_xml(many), flush_pages=10,
                                 feed_bytes=64))
    assert len(groups) >= 3
    assert all(len(g) <= 11 for g in groups)
    assert [r[0] for g in groups for r in g] == [f'P{i}' for i in range(25)]


def test_read_wiki_xml_dump_multistream_bz2(ray_session, tmp_path):
    """Two dump parts: a MULTISTREAM bz2 (two concatenated bz2 streams in
    one file — the decompressor must restart on eof) and a plain .xml."""
    xml = _dump_xml(PAGES)
    cut = len(xml) // 2   # streams split ONE document at a byte boundary
    part1 = bz2.compress(xml[:cut]) + bz2.compress(xml[cut:])
    p1 = tmp_path / 'part1.xml.bz2'
    p1.write_bytes(part1)
    p2 = tmp_path / 'part2.xml'
    p2.write_bytes(_dump_xml([_page('Delta', 0, 'plain xml part')]))

    ds = read_wiki_xml_dump([str(p1), str(p2)])
    out = ds.to_pandas().sort_values('title').reset_index(drop=True)
    assert list(out['title']) == ['Alpha Article', 'Beta & Gamma',
                                  'Category:Letters', 'Delta',
                                  'Template:Infobox']
    assert ds.schema().base_schema.equals(DUMP_SCHEMA)
    alpha = out[out['title'] == 'Alpha Article'].iloc[0]
    assert alpha['url'] == 'https://en.wikipedia.org/wiki/Alpha_Article'
    assert str(alpha['rev_ts']) == '2020-01-02 03:04:05'


def test_dump_to_pages_schema(ray_session, tmp_path):
    from caligraph_ray.corpus import PAGES_SCHEMA
    p = tmp_path / 'part.xml'
    p.write_bytes(_dump_xml(PAGES))
    pages = dump_to_pages(read_wiki_xml_dump(str(p)))
    t = pa.Table.from_pandas(pages.to_pandas(), preserve_index=False)
    # article namespace only, engine F1 schema
    assert t.num_rows == 2
    assert set(t.schema.names) == set(PAGES_SCHEMA.names)
    assert t.column('html').to_pylist()[0] == b"'''Alpha''' is a [[letter]]."
