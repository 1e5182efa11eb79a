"""Property-based checks for the web-hygiene operators (URL canonical
form, PII scrubbing, boilerplate removal).

* canonicalize_url is IDEMPOTENT (the property groupby-dedup relies on)
  and collapses the documented equivalence class (www., default port,
  fragment, trailing slash, tracking params) to one canonical form.
* scrub_pii (vectorized Series.str path) ≡ scrub_text (the declared
  scalar reference) per row, including NULL text.
* remove_boilerplate ≡ a loop reference: per group, lines in ≥ min_docs
  distinct docs drop; docs with no surviving line drop entirely.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))
PURE = settings(max_examples=200, deadline=None)


@st.composite
def url_ish(draw):
    kind = draw(st.integers(0, 4))
    if kind == 0:   # junk
        return draw(st.text(alphabet='ab:/?#. ', max_size=20))
    scheme = draw(st.sampled_from(['http', 'https', 'HTTP']))
    host = draw(st.sampled_from(['example.com', 'WWW.Example.com', 'a.b.co']))
    port = draw(st.sampled_from(['', ':80', ':443', ':8080', ':80abc']))
    path = draw(st.sampled_from(['', '/', '/x', '/x/', '/x/y']))
    query = draw(st.sampled_from(['', '?a=1', '?utm_source=t&a=1',
                                  '?fbclid=z', '?a=1&b=', '?ref=r&b=2']))
    frag = draw(st.sampled_from(['', '#top']))
    return f'{scheme}://{host}{port}{path}{query}{frag}'


@PURE
@given(url_ish())
def test_canonicalize_url_idempotent(url):
    from caligraph_ray.functions.urls import canonicalize_url
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@PURE
@given(st.sampled_from(['', '/', '/x', '/p/q']),
       st.sampled_from(['', '?a=1', '?a=1&b=2']))
def test_canonicalize_url_equivalence_class(path, query):
    from caligraph_ray.functions.urls import canonicalize_url
    base = canonicalize_url(f'http://example.com{path}{query}')
    variants = [
        f'http://www.example.com{path}{query}',
        f'HTTP://EXAMPLE.com:80{path}{query}',
        f'http://example.com{path}{query}#frag',
        f'http://example.com{path}{"?utm_x=1&" + query[1:] if query else "?utm_x=1"}',
    ]
    if path.endswith('/') and path != '/':
        variants.append(f'http://example.com{path.rstrip("/")}{query}')
    for v in variants:
        assert canonicalize_url(v) == base, v


_PII_TEXT = st.lists(
    st.sampled_from(list('ab.@-+0189') + ['bob@x.io', '+1-222-333-4444',
                                          '10.0.0.1', '999.1.1.1']),
    max_size=6).map(' '.join)


@SETTINGS
@given(st.lists(st.one_of(st.none(), _PII_TEXT), min_size=1, max_size=10))
def test_scrub_pii_matches_scalar_reference(ray_session, texts):
    import ray.data as rd
    from caligraph_ray.stages.pii import scrub_pii, scrub_text
    df = pd.DataFrame({'doc_id': np.arange(len(texts), dtype='int64'),
                       'text': texts})
    got = scrub_pii(rd.from_pandas(df).repartition(2)).to_pandas()
    for _, r in got.iterrows():
        src = texts[int(r['doc_id'])]
        if src is None:
            assert pd.isna(r['scrubbed'])
            assert (int(r['n_email']), int(r['n_phone']), int(r['n_ip'])) == (0, 0, 0)
            continue
        want_text, want_counts = scrub_text(src)
        assert r['scrubbed'] == want_text
        for k, v in want_counts.items():
            assert int(r[k]) == v, (k, src)


_LINES = ['header', 'footer', 'body one', 'body two', 'x']


@st.composite
def boiler_docs(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    rows = []
    for i in range(n):
        lines = draw(st.lists(st.sampled_from(_LINES), min_size=1, max_size=4))
        rows.append({'doc_id': i, 'source': draw(st.sampled_from(['s1', 's2'])),
                     'text': '\n'.join(lines)})
    return pd.DataFrame(rows)


@SETTINGS
@given(boiler_docs(), st.integers(min_value=1, max_value=4))
def test_remove_boilerplate_matches_reference(ray_session, df, min_docs):
    import ray.data as rd
    from caligraph_ray.stages.boilerplate import remove_boilerplate
    got_df = remove_boilerplate(rd.from_pandas(df).repartition(2),
                                min_docs=min_docs).to_pandas()
    got = {} if got_df.empty else \
        {int(r['doc_id']): (r['cleaned'], int(r['n_removed']))
         for _, r in got_df.iterrows()}

    bad = set()
    for src, g in df.groupby('source'):
        seen = {}
        for _, r in g.iterrows():
            for ln in set(r['text'].split('\n')):
                seen[ln] = seen.get(ln, 0) + 1
        bad |= {(src, ln) for ln, c in seen.items() if c >= min_docs}
    want = {}
    for _, r in df.iterrows():
        kept = [ln for ln in r['text'].split('\n')
                if (r['source'], ln) not in bad]
        if kept:
            n_removed = len(r['text'].split('\n')) - len(kept)
            want[int(r['doc_id'])] = ('\n'.join(kept), n_removed)
    assert got == want
