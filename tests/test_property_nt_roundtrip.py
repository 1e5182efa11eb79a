"""File-level N-Triples round-trip (S2 parser × S8 sink): write_nt to a
directory, read_nt back, recover the exact triple multiset — over
hypothesis-generated triples with escapes, unicode and URI-hostile names."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=6, deadline=None,
                    suppress_health_check=list(HealthCheck))

_NAME = st.text(
    alphabet=st.sampled_from(list('abAB1 .,()#&!*=$é中') + ['"', "'", '/']),
    min_size=1, max_size=12).map(lambda s: s.replace('_', ' ').strip() or 'x')
_LIT = st.text(alphabet=st.sampled_from(list('ab"\\\n\r\t é')), max_size=12)


@st.composite
def triples(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    rows = []
    for _ in range(n):
        lit = draw(st.booleans())
        rows.append({'subj': draw(_NAME), 'pred': draw(_NAME),
                     'obj': draw(_LIT) if lit else draw(_NAME),
                     'is_literal': lit})
    return pd.DataFrame(rows)


@SETTINGS
@given(triples())
def test_nt_file_roundtrip(ray_session, tmp_path_factory, df):
    import ray.data as rd
    from caligraph_ray.sources.nt import read_nt, write_nt
    out = str(tmp_path_factory.mktemp('nt'))
    write_nt(rd.from_pandas(df).repartition(2), out)
    back = read_nt(out).to_pandas()

    def canon(d):
        return sorted((r['subj'], r['pred'], r['obj'], bool(r['is_literal']))
                      for _, r in d.iterrows())
    assert canon(back) == canon(df)
