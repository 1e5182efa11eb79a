"""WARC crawl source (S1 crawl-faithful): Common-Crawl-style
``.warc`` / ``.warc.gz`` parts → the engine's F1 pages schema.

The engine's brief re-hosts the reference over crawl-shaped page tables;
this reader ingests the actual crawl format. WARC/1.x structure: each
record = version line + named headers + CRLFCRLF + Content-Length body +
CRLFCRLF. Common Crawl gzips each record as its OWN member, so a
``.warc.gz`` part is a multistream gzip — the decompressor restarts on
member end (same treatment as the multistream-bz2 XML dump).

Parallelism unit = WARC part (Common Crawl ships ~1 GB parts); records
stream out in bounded row groups, never materializing a part's pages
whole. Only ``response`` records with an HTTP payload become pages; the
HTTP header block is stripped to the entity body.
"""

from __future__ import annotations

import zlib
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa

_CRLF2 = b'\r\n\r\n'


def _gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield decompressed chunks; plain WARC passes through, gzip restarts
    per member (Common Crawl: one member per record)."""
    if data[:2] != b'\x1f\x8b':
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = d.decompress(data[pos:])
        if out:
            yield out
        if d.unused_data:
            pos = len(data) - len(d.unused_data)
        else:
            break


def _parse_records(stream: bytes) -> Iterator[Tuple[dict, bytes]]:
    """(warc_headers, body) per record in one decompressed byte stream."""
    pos = 0
    n = len(stream)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and stream[pos:pos + 2] in (b'\r\n', b'\n\n'):
            pos += 2
        head_end = stream.find(_CRLF2, pos)
        if head_end < 0:
            return
        head = stream[pos:head_end].decode('utf-8', errors='replace')
        lines = head.split('\r\n')
        if not lines or not lines[0].startswith('WARC/'):
            return
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(':')
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get('content-length', '0'))
        except ValueError:
            return
        body_start = head_end + len(_CRLF2)
        body = stream[body_start:body_start + length]
        yield headers, body
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response header block (identity transfer only —
    Common Crawl stores payloads unchunked)."""
    if payload[:5] in (b'HTTP/',):
        sep = payload.find(_CRLF2)
        if sep >= 0:
            return payload[sep + len(_CRLF2):]
    return payload


def parse_warc(data: bytes, flush_pages: int = 1000) -> Iterator[List[tuple]]:
    """One WARC part → row groups of (url, warc_ts_iso, html bytes)."""
    import logging
    rows: List[tuple] = []
    try:
        for chunk in _gunzip_members(data):
            # a gzip member holds whole records (Common Crawl: one per
            # member); a plain part arrives as one chunk with every record
            for headers, body in _parse_records(chunk):
                if headers.get('warc-type') == 'response':
                    url = headers.get('warc-target-uri', '')
                    ts = headers.get('warc-date', '')
                    rows.append((url, ts, _http_body(body)))
                if len(rows) >= flush_pages:
                    yield rows[:]
                    rows.clear()
    except (zlib.error, OSError, EOFError, ValueError) as e:
        # fail-soft on a corrupt part (same policy as the XML dump reader)
        logging.getLogger('caligraph_ray.warc').warning(
            'WARC part parse aborted after %d buffered records: %s',
            len(rows), e)
    if rows:
        yield rows


PAGES_BASE_SCHEMA = pa.schema([
    ('url', pa.string()),
    ('warc_ts', pa.timestamp('us')),
    ('html', pa.binary()),
    ('text', pa.string()),
    ('lang', pa.string()),
])


def read_warc(paths, lang: str = 'en', flush_pages: int = 1000,
              concurrency: Optional[int] = None):
    """WARC part(s) → F1 pages Dataset (url, warc_ts, html, text='',
    lang). One part per read task, bounded row-group flushes."""
    import pandas as pd
    import ray.data as rd

    def parse_part(batch: pa.Table) -> Iterator[pa.Table]:
        for data in batch.column('bytes').to_pylist():
            for rows in parse_warc(data, flush_pages):
                ts = pd.to_datetime([r[1] or None for r in rows],
                                    utc=True, errors='coerce')
                yield pa.Table.from_pydict({
                    'url': pa.array([r[0] for r in rows], pa.string()),
                    'warc_ts': pa.Array.from_pandas(
                        ts.tz_localize(None)).cast(pa.timestamp('us')),
                    'html': pa.array([r[2] for r in rows], pa.binary()),
                    'text': pa.array([''] * len(rows), pa.string()),
                    'lang': pa.array([lang] * len(rows), pa.string()),
                }, schema=PAGES_BASE_SCHEMA)

    ds = rd.read_binary_files(paths)
    kw = {} if concurrency is None else {'concurrency': concurrency}
    return ds.map_batches(parse_part, batch_format='pyarrow', batch_size=1,
                          **kw)
