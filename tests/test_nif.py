"""S4-faithful NIF context reader (reference impl/wikipedia/nif_parser.py):
N-Triples context assembly, reference text cleanup, resource-IRI
derivation, bz2 parts, documents mapping."""

import bz2

import pytest

from caligraph_ray.sources.nif import (clean_nif_text, contexts_to_documents,
                                       parse_nif_part, read_nif_contexts)

_NIF = 'http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#'


def _ctx_lines(res, text, url=None):
    iri = f'http://dbpedia.org/resource/{res}?dbpv=2020-07&nif=context'
    lines = [
        f'<{iri}> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{_NIF}Context> .',
        f'<{iri}> <{_NIF}isString> "{text}"@en .',
    ]
    if url:
        lines.append(f'<{iri}> <{_NIF}sourceUrl> <{url}> .')
    return lines


def test_clean_nif_text_reference_semantics():
    # nif_parser.py:79-82: \n → ' ', then '(…)' / '[…]' removed with
    # substitute='' — the reference pattern swallows SURROUNDING whitespace
    # too ('Alpha (a letter) is' → 'Alphais'), a quirk pinned here so a
    # "fix" can't silently diverge from the reference
    assert clean_nif_text('Alpha (a letter)\nis first [citation].') == \
        'Alphais first.'
    assert clean_nif_text('plain text stays') == 'plain text stays'


def test_parse_nif_part_assembles_contexts():
    lines = (_ctx_lines('Alpha_Beta', 'Alpha\\nBeta (Greek) text',
                        'http://en.wikipedia.org/wiki/Alpha_Beta')
             + _ctx_lines('Gamma', 'Gamma text')
             + ['malformed line that matches nothing'])
    rows = parse_nif_part('\n'.join(lines).encode())
    assert len(rows) == 2
    name, iri, url, text = rows[0]
    assert name == 'Alpha Beta'
    assert iri == 'http://dbpedia.org/resource/Alpha_Beta'   # ?query stripped
    assert url == 'http://en.wikipedia.org/wiki/Alpha_Beta'
    # unescaped \n → space, ' (Greek) ' dropped whole (whitespace-swallow
    # quirk, see test_clean_nif_text_reference_semantics)
    assert text == 'Alpha Betatext'
    assert rows[1][0] == 'Gamma' and rows[1][2] == ''


def test_read_nif_contexts_bz2(ray_session, tmp_path):
    data = '\n'.join(_ctx_lines('Alpha', 'Alpha text')
                     + _ctx_lines('Beta', 'Beta text')).encode()
    p1 = tmp_path / 'part1.ttl.bz2'
    p1.write_bytes(bz2.compress(data))
    p2 = tmp_path / 'part2.ttl'
    p2.write_bytes('\n'.join(_ctx_lines('Delta', 'Delta text')).encode())
    ds = read_nif_contexts([str(p1), str(p2)])
    out = ds.to_pandas().sort_values('resource').reset_index(drop=True)
    assert list(out['resource']) == ['Alpha', 'Beta', 'Delta']
    assert list(out['text']) == ['Alpha text', 'Beta text', 'Delta text']

    docs = contexts_to_documents(ds).to_pandas()
    assert set(docs.columns) == {'doc_id', 'text', 'lang', 'source'}
    assert docs['doc_id'].is_unique and (docs['source'] == 'nif').all()
