"""WARC crawl source (S1 crawl-faithful): record parse, HTTP body strip,
per-member gzip (Common Crawl layout), pages-schema mapping, and the
crawl → flagship end-to-end path."""

import gzip

import pytest

from caligraph_ray.sources.warc import parse_warc, read_warc


def _record(rtype, uri, body: bytes, ts='2021-03-04T05:06:07Z'):
    http = (b'HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n' + body
            if rtype == 'response' else body)
    head = (f'WARC/1.0\r\n'
            f'WARC-Type: {rtype}\r\n'
            f'WARC-Target-URI: {uri}\r\n'
            f'WARC-Date: {ts}\r\n'
            f'Content-Length: {len(http)}\r\n').encode()
    return head + b'\r\n' + http + b'\r\n\r\n'


HTML = (b'<html><head><title>Good</title></head><body><h1>Good</h1>'
        b'<ul><li>a x</li><li>b y</li><li>c z</li></ul></body></html>')


def test_parse_warc_records_and_http_strip():
    data = (_record('warcinfo', '', b'software: test')
            + _record('response', 'https://ex.org/wiki/Good', HTML)
            + _record('request', 'https://ex.org/wiki/Good', b'GET /')
            + _record('response', 'https://ex.org/other', b'plain body'))
    rows = [r for grp in parse_warc(data) for r in grp]
    assert [(r[0]) for r in rows] == ['https://ex.org/wiki/Good',
                                      'https://ex.org/other']
    assert rows[0][2] == HTML          # HTTP headers stripped
    assert rows[1][2] == b'plain body'


def test_read_warc_gz_members(ray_session, tmp_path):
    """Common Crawl layout: each record its own gzip member."""
    recs = [_record('response', f'https://ex.org/p{i}', HTML)
            for i in range(3)]
    gz = b''.join(gzip.compress(r) for r in recs)
    p = tmp_path / 'part.warc.gz'
    p.write_bytes(gz)
    p2 = tmp_path / 'part2.warc'
    p2.write_bytes(_record('response', 'https://ex.org/plain', HTML))

    ds = read_warc([str(p), str(p2)])
    out = ds.to_pandas().sort_values('url').reset_index(drop=True)
    assert list(out['url']) == ['https://ex.org/p0', 'https://ex.org/p1',
                                'https://ex.org/p2', 'https://ex.org/plain']
    assert all(b == HTML for b in out['html'])
    assert str(out.loc[0, 'warc_ts']) == '2021-03-04 05:06:07'


def test_warc_to_flagship_end_to_end(ray_session, tmp_path):
    from caligraph_ray.pipelines.flagship import run_flagship
    html = (b'<html><head><title>Crawl Page</title></head><body>'
            b'<h1>Crawl Page</h1><h2>People</h2><ul>'
            b'<li><a href="/wiki/John_Smith">John Smith</a> in Paris</li>'
            b'<li><a href="/wiki/Jane_Doe">Jane Doe</a> writes</li>'
            b'<li><a href="/wiki/Ada_Lovelace">Ada Lovelace</a> codes</li>'
            b'</ul></body></html>')
    p = tmp_path / 'crawl.warc.gz'
    p.write_bytes(gzip.compress(
        _record('response', 'https://ex.org/wiki/Crawl_Page', html)))
    triples = run_flagship(read_warc(str(p)))
    rows = {(r['subj'], r['pred'], r['obj']) for r in triples.take_all()}
    assert ('John Smith', 'mentionedIn', 'Crawl Page') in rows
