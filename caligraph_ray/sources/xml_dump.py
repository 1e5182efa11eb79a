"""Wikipedia XML dump ingestion (S1 faithful).

Ray-Data-first counterpart of the reference's streaming SAX reader
(impl/wikipedia/xml_parser.py:11-53): the reference feeds one bz2 file
through an lxml target parser on a single process and returns a dict of
every page's markup in memory; here each dump PART is one
``read_binary_files`` row and a generator ``map_batches`` UDF streams an
expat pull-parser over it, flushing Arrow tables every ``flush_pages``
pages — no file's page set is ever held whole, and parts parse in
parallel across the cluster.

Scale notes (100 TB posture):
* Parallelism unit = dump part. Wikipedia publishes multistream dumps in
  ~200 MB parts; point this reader at the part directory and every part
  is an independent task. A single monolithic .bz2 is still correct but
  serial within that file (splitting one bz2 by stream offsets needs the
  dump's index sidecar — out of scope, documented).
* Multistream bz2 (back-to-back bz2 streams in one file) is handled: the
  decompressor is restarted on ``eof`` with ``unused_data``.
* The expat target parser buffers character data ONLY inside the tags it
  captures (title/ns/timestamp/text), so sitewide elements cost nothing.
* Namespace filter mirrors the reference (0 = Page, 10 = Template,
  14 = Category, xml_parser.py:52-53).
"""

from __future__ import annotations

import bz2
from typing import Iterator, List, Optional, Sequence, Tuple

import pyarrow as pa

DUMP_SCHEMA = pa.schema([
    ('title', pa.string()),
    ('namespace', pa.int32()),
    ('url', pa.string()),
    ('rev_ts', pa.timestamp('us')),
    ('markup', pa.string()),
])

REFERENCE_NAMESPACES = (0, 10, 14)   # xml_parser.py:52-53
_CHUNK = 1 << 20


def _decompressed_chunks(data: bytes) -> Iterator[bytes]:
    """Yield decompressed chunks; plain XML passes through, bz2 (incl.
    MULTISTREAM: concatenated independent streams) restarts the
    decompressor on stream end."""
    if data[:3] != b'BZh':
        yield data
        return
    mv = memoryview(data)
    dec = bz2.BZ2Decompressor()
    pos, pending = 0, b''
    while True:
        if pending:
            buf, pending = pending, b''
        elif pos < len(mv):
            buf = bytes(mv[pos:pos + _CHUNK])
            pos += _CHUNK
        else:
            break
        out = dec.decompress(buf)
        if out:
            yield out
        if dec.eof:
            pending = dec.unused_data
            if not pending and pos >= len(mv):
                break
            dec = bz2.BZ2Decompressor()


def _local(tag: str) -> str:
    return tag.rsplit('}', 1)[-1]


class _PageTarget:
    """Expat handlers mirroring the reference's WikiPageParser contract
    (xml_parser.py:19-53): capture (title, ns, text) per <page>, emit when
    the namespace qualifies. Adds the revision timestamp (us precision)
    the pages schema carries."""

    _CAPTURE = frozenset(('title', 'ns', 'timestamp', 'text'))

    def __init__(self, namespaces: frozenset, rows: List[tuple]):
        self.namespaces = namespaces
        self.rows = rows
        self.title: Optional[str] = None
        self.ns: Optional[int] = None
        self.rev_ts: Optional[str] = None
        self.markup: Optional[str] = None
        self._buf: Optional[List[str]] = None
        self._tag: Optional[str] = None

    def start(self, tag: str, _attrs) -> None:
        tag = _local(tag)
        if tag == 'page':
            self.title = self.ns = self.rev_ts = self.markup = None
        if tag in self._CAPTURE:
            self._tag, self._buf = tag, []

    def data(self, chars: str) -> None:
        if self._buf is not None:
            self._buf.append(chars)

    def end(self, tag: str) -> None:
        tag = _local(tag)
        if self._buf is not None and tag == self._tag:
            content = ''.join(self._buf).strip()
            self._buf = self._tag = None
            if tag == 'title':
                self.title = content
            elif tag == 'ns':
                try:
                    self.ns = int(content)
                except ValueError:
                    self.ns = None
            elif tag == 'timestamp':
                self.rev_ts = content
            elif tag == 'text':
                # full-history dumps: last revision wins (reference
                # overwrite semantics, xml_parser.py:41-42)
                self.markup = content
        elif tag == 'page':
            if (self.title is not None and self.markup is not None
                    and self.ns in self.namespaces):
                self.rows.append(
                    (self.title, self.ns, self.rev_ts, self.markup))


def parse_wiki_xml(data: bytes,
                   namespaces: Sequence[int] = REFERENCE_NAMESPACES,
                   flush_pages: int = 1000,
                   feed_bytes: int = 1 << 18) -> Iterator[List[tuple]]:
    """Stream (title, ns, rev_ts, markup) row groups out of one dump part.
    The parser is fed ``feed_bytes`` slices and the row buffer flushes
    whenever it reaches ``flush_pages`` — held pages are bounded by
    flush_pages plus however many pages one feed slice completes, never
    the whole part.

    Fail-soft: a malformed part (truncated download, XML corruption)
    yields every COMPLETE page parsed before the error and logs the drop
    instead of failing the read task — one bad part of a 100 TB dump must
    not abort the pipeline (the same drop-don't-stall policy as
    PageParser's per-row guard)."""
    import logging

    from xml.parsers import expat
    rows: List[tuple] = []
    target = _PageTarget(frozenset(int(n) for n in namespaces), rows)
    p = expat.ParserCreate()
    p.buffer_text = True          # coalesce character-data callbacks
    p.StartElementHandler = target.start
    p.EndElementHandler = target.end
    p.CharacterDataHandler = target.data
    try:
        for chunk in _decompressed_chunks(data):
            for off in range(0, len(chunk), feed_bytes):
                p.Parse(chunk[off:off + feed_bytes], False)
                if len(rows) >= flush_pages:
                    yield rows[:]
                    rows.clear()
        p.Parse(b'', True)
    except (expat.ExpatError, OSError, EOFError, ValueError) as e:
        logging.getLogger('caligraph_ray.xml_dump').warning(
            'dump part parse aborted after %d buffered pages: %s',
            len(rows), e)
    if rows:
        yield rows


def _rows_to_table(rows: List[tuple], base_url: str) -> pa.Table:
    import pandas as pd
    titles = [r[0] for r in rows]
    urls = [base_url + t.replace(' ', '_') for t in titles]
    ts = pd.to_datetime([r[2] for r in rows], utc=True, errors='coerce')
    return pa.Table.from_pydict({
        'title': pa.array(titles, pa.string()),
        'namespace': pa.array([r[1] for r in rows], pa.int32()),
        'url': pa.array(urls, pa.string()),
        'rev_ts': pa.Array.from_pandas(
            ts.tz_localize(None)).cast(pa.timestamp('us')),
        'markup': pa.array([r[3] for r in rows], pa.string()),
    }, schema=DUMP_SCHEMA)


def read_wiki_xml_dump(paths,
                       namespaces: Sequence[int] = REFERENCE_NAMESPACES,
                       base_url: str = 'https://en.wikipedia.org/wiki/',
                       flush_pages: int = 1000,
                       concurrency: Optional[int] = None):
    """Dump part files (.xml / .bz2 / multistream .bz2) → DUMP_SCHEMA
    Dataset. One part per read task; pages stream out in ``flush_pages``
    groups so a 200 MB part never materializes whole decompressed."""
    import ray.data as rd

    def parse_part(batch: pa.Table) -> Iterator[pa.Table]:
        for data in batch.column('bytes').to_pylist():
            for rows in parse_wiki_xml(data, namespaces, flush_pages):
                yield _rows_to_table(rows, base_url)

    ds = rd.read_binary_files(paths)
    kw = {} if concurrency is None else {'concurrency': concurrency}
    # batch_size=1: a dump part IS the work unit; batching parts would
    # serialize their decompression inside one task.
    return ds.map_batches(parse_part, batch_format='pyarrow', batch_size=1,
                          **kw)


def dump_to_pages(dump_ds, lang: str = 'en'):
    """DUMP_SCHEMA → the engine's F1 pages schema (corpus.PAGES_SCHEMA):
    article-namespace rows only, markup carried as the binary payload
    column so the downstream parse/usefulness plumbing (batch sizes, drop
    accounting) runs unchanged. The reference's markup pipeline consumes
    wikitext where the engine's crawl analogue consumes HTML — this view
    is the ingestion seam, not a markup→HTML transcoder."""
    import pyarrow.compute as pc

    def to_pages(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column('namespace'), pa.scalar(0, pa.int32())))
        markup = t.column('markup').cast(pa.binary())
        n = t.num_rows
        return pa.Table.from_pydict({
            'url': t.column('url'),
            'warc_ts': t.column('rev_ts'),
            'html': markup,
            'text': pa.array([''] * n, pa.string()),
            'lang': pa.array([lang] * n, pa.string()),
        })

    return dump_ds.map_batches(to_pages, batch_format='pyarrow')
