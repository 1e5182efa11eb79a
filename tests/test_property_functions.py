"""Property-based tests for the pure scalar-function layer (no Ray):

* NT literal escaping is a true inverse pair.
* NT serialization round-trips triples exactly (names without '_', which
  the reference's name↔iri mapping deliberately conflates with space).
* tokenize_with_ws is reconstruction-safe from the first token on.
* The VECTORIZED Arrow variants (normalize_surface_array,
  canonical_label_array) agree exactly with their scalar references —
  these are groupby keys, so any divergence mis-partitions the shuffle.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=200, deadline=None)

# text with the characters that break naive escaping/regexes: quotes,
# backslashes, control chars, unicode whitespace, combining marks
_TEXT = st.text(
    alphabet=st.sampled_from(list('abAB12 .,()"\\\n\r\t\xa0 ') + ['é', 'ß', '中']),
    max_size=30)


@SETTINGS
@given(_TEXT)
def test_literal_escape_roundtrip(s):
    from caligraph_ray.sources.nt import escape_literal, unescape_literal
    esc = escape_literal(s)
    assert '\n' not in esc and '\r' not in esc
    assert unescape_literal(esc) == s


@SETTINGS
@given(st.lists(st.tuples(_TEXT, _TEXT, _TEXT, st.booleans()),
                min_size=1, max_size=6))
def test_nt_lines_roundtrip(triples):
    from caligraph_ray.sources.nt import parse_nt_lines
    from caligraph_ray.stages.triples import TRIPLES_SCHEMA, to_nt_lines
    # '_' ↔ ' ' is the documented lossy mapping — canonicalize like the
    # engine does (names never carry '_'); literal objects are unrestricted
    triples = [(s.replace('_', ' '), p.replace('_', ' '),
                o if lit else o.replace('_', ' '), lit)
               for s, p, o, lit in triples]
    batch = pa.Table.from_pydict(
        {'subj': [t[0] for t in triples], 'pred': [t[1] for t in triples],
         'obj': [t[2] for t in triples], 'is_literal': [t[3] for t in triples]},
        schema=TRIPLES_SCHEMA)
    lines = to_nt_lines(batch)
    back = parse_nt_lines(pa.table({'text': lines.column('nt')}))
    assert back.to_pydict() == batch.to_pydict()


@SETTINGS
@given(_TEXT)
def test_tokenize_with_ws_reconstructs(s):
    from caligraph_ray.functions.strings import tokenize_with_ws
    tokens, ws = tokenize_with_ws(s)
    assert len(tokens) == len(ws)
    if not tokens:
        return
    rebuilt = ''.join(t + w for t, w in zip(tokens, ws))
    assert s.endswith(rebuilt)


@SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_normalize_surface_vectorized_agrees(texts):
    from caligraph_ray.functions.strings import (normalize_surface,
                                                 normalize_surface_array)
    got = normalize_surface_array(pa.array(texts, pa.string())).to_pylist()
    assert got == [normalize_surface(t) for t in texts]


@SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_canonical_label_vectorized_agrees(texts):
    from caligraph_ray.functions.strings import (canonical_label_array,
                                                 get_canonical_label)
    got = canonical_label_array(pa.array(texts, pa.string())).to_pylist()
    assert got == [get_canonical_label(t) for t in texts]


@SETTINGS
@given(_TEXT)
def test_normalizer_idempotence(s):
    from caligraph_ray.functions.strings import (make_alphanumeric,
                                                 normalize_surface,
                                                 regularize_spaces)
    for fn in (normalize_surface, regularize_spaces, make_alphanumeric):
        once = fn(s)
        assert fn(once) == once, fn.__name__
