"""grouped_quantiles_exact ≡ quantile_disc semantics computed by a loop:
per group, the smallest value whose cumulative count reaches ceil(q·n) —
over random discrete values with duplicate-heavy groups and NULL keys."""

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))


@st.composite
def grouped_values(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    return pd.DataFrame({
        'g': pd.array([draw(st.one_of(st.none(), st.integers(0, 2)))
                       for _ in range(n)], dtype='Int64'),
        'v': np.array([draw(st.integers(-5, 5)) for _ in range(n)],
                      dtype='int64')})


@SETTINGS
@given(grouped_values())
def test_grouped_quantiles_match_disc_reference(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.relational import grouped_quantiles_exact
    qs = (0.5, 0.9, 0.99)
    got_df = grouped_quantiles_exact(rd.from_pandas(df).repartition(2),
                                     ['g'], 'v', qs=qs).to_pandas()
    got = {(-1 if pd.isna(r['g']) else int(r['g'])):
           (int(r['q50']), int(r['q90']), int(r['q99']))
           for _, r in got_df.iterrows()}
    want = {}
    key = df['g'].map(lambda x: -1 if pd.isna(x) else int(x))
    for g, sub in df.assign(_k=key).groupby('_k'):
        vals = sorted(sub['v'])
        n = len(vals)
        want[g] = tuple(vals[max(1, math.ceil(q * n)) - 1] for q in qs)
    assert got == want
