"""NIF context corpus reader (S4 faithful).

Ray-Data-first counterpart of the reference's pynif-based plaintext
retrieval (impl/wikipedia/nif_parser.py:66-82): the reference loads the
whole DBpedia ``nif_context`` turtle dump into one in-memory
NIFCollection; here each dump PART is one ``read_binary_files`` row and a
per-file pass over the N-Triples lines assembles contexts, applying the
reference's text cleanup (linebreaks → spaces, '(…)' and '[…]' content
removed, nif_parser.py:79-82) and the ``original_uri[:rfind('?')]``
resource-IRI derivation.

Parallelism unit = dump part (DBpedia ships nif_context per language as
one bz2 — re-chunk it into parts for fan-out, as with the XML dump). A
context's triples are assembled within its file; contexts never span
parts in DBpedia dumps.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pyarrow as pa

from ..functions.strings import remove_bracket_content
from .nt import _LIT_RE, _OBJ_RE, unescape_literal, uri_to_name
from .xml_dump import _decompressed_chunks

NIF_CONTEXTS_SCHEMA = pa.schema([
    ('resource', pa.string()),       # readable name of the page resource
    ('resource_iri', pa.string()),   # original_uri with the ?query stripped
    ('url', pa.string()),            # nif:sourceUrl when present, else ''
    ('text', pa.string()),           # cleaned plaintext (nif:isString)
])

_IS_STRING = 'isString'
_SOURCE_URL = 'sourceUrl'


def clean_nif_text(text: str) -> str:
    """Reference cleanup (nif_parser.py:79-82): linebreaks → spaces, then
    parenthesized and bracketed content dropped."""
    text = text.replace('\n', ' ')
    text = remove_bracket_content(text, bracket_type='(', substitute='')
    return remove_bracket_content(text, bracket_type='[', substitute='')


def _pred_tail(pred_uri: str) -> str:
    return pred_uri.rsplit('#', 1)[-1].rsplit('/', 1)[-1]


def parse_nif_part(data: bytes) -> List[tuple]:
    """One dump part (N-Triples, plain or bz2) → [(resource, resource_iri,
    url, text)]. Only isString/sourceUrl predicates are kept, so the
    per-file state is one small dict entry per context."""
    import logging
    ctx: dict = {}
    order: List[str] = []
    tail = ''
    try:
        for chunk in _decompressed_chunks(data):
            buf = tail + chunk.decode('utf-8', errors='replace')
            lines = buf.split('\n')
            tail = lines.pop()
            for line in lines:
                _collect_line(line, ctx, order)
    except (OSError, EOFError, ValueError) as e:
        # fail-soft on a corrupt part: keep the contexts assembled so far
        logging.getLogger('caligraph_ray.nif').warning(
            'NIF part parse aborted after %d contexts: %s', len(order), e)
    if tail:
        _collect_line(tail, ctx, order)
    rows = []
    for iri in order:
        c = ctx[iri]
        text = c.get(_IS_STRING)
        if text is None:
            continue
        q = iri.rfind('?')
        res_iri = iri[:q] if q >= 0 else iri
        rows.append((uri_to_name(res_iri), res_iri, c.get(_SOURCE_URL, ''),
                     clean_nif_text(text)))
    return rows


def _collect_line(line: str, ctx: dict, order: List[str]) -> None:
    m = _LIT_RE.match(line)
    if m:
        if _pred_tail(m.group(2)) == _IS_STRING:
            iri = m.group(1)
            if iri not in ctx:
                ctx[iri] = {}
                order.append(iri)
            ctx[iri][_IS_STRING] = unescape_literal(m.group(3))
        return
    m = _OBJ_RE.match(line)
    if m and _pred_tail(m.group(2)) == _SOURCE_URL:
        iri = m.group(1)
        if iri not in ctx:
            ctx[iri] = {}
            order.append(iri)
        ctx[iri][_SOURCE_URL] = m.group(3)


def read_nif_contexts(paths, concurrency: Optional[int] = None):
    """NIF context dump part(s) → NIF_CONTEXTS_SCHEMA Dataset."""
    import ray.data as rd

    def parse(batch: pa.Table) -> Iterator[pa.Table]:
        for data in batch.column('bytes').to_pylist():
            rows = parse_nif_part(data)
            yield pa.Table.from_pydict({
                'resource': [r[0] for r in rows],
                'resource_iri': [r[1] for r in rows],
                'url': [r[2] for r in rows],
                'text': [r[3] for r in rows],
            }, schema=NIF_CONTEXTS_SCHEMA)

    ds = rd.read_binary_files(paths)
    kw = {} if concurrency is None else {'concurrency': concurrency}
    return ds.map_batches(parse, batch_format='pyarrow', batch_size=1, **kw)


def contexts_to_documents(ctx_ds, lang: str = 'en'):
    """NIF contexts → the engine's documents shape (doc_id, text, lang,
    source) so the plaintext consumers (Hearst hypernyms A1, text stats,
    dedup) run unchanged over a real corpus."""
    from ..functions.hashing import stable_hash64_array

    def to_docs(t: pa.Table) -> pa.Table:
        names = t.column('resource').to_pylist()
        n = t.num_rows
        return pa.Table.from_pydict({
            'doc_id': pa.array(stable_hash64_array(names), pa.int64()),
            'text': t.column('text'),
            'lang': pa.array([lang] * n, pa.string()),
            'source': pa.array(['nif'] * n, pa.string()),
        })

    return ctx_ds.map_batches(to_docs, batch_format='pyarrow')
