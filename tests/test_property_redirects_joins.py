"""Property-based checks for redirect folding (D2) and the broadcast
semi/anti join.

* levenshtein's capped early-exit contract vs a plain uncapped DP.
* fold_redirects (distributed broadcast fold) ≡ row-wise resolve_name,
  over random redirect maps with chains, 2-cycles, self-loops and NULLs.
* semi_anti_join ≡ pandas isin mask.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))
PURE = settings(max_examples=300, deadline=None)

_NAMES = ['Ann', 'Anne', 'Annette', 'Bob', 'Bobby', 'Robert', 'X']


@PURE
@given(st.text(alphabet='abcd', max_size=8), st.text(alphabet='abcd', max_size=8),
       st.one_of(st.none(), st.integers(min_value=0, max_value=6)))
def test_levenshtein_cap_contract(a, b, cap):
    from caligraph_ray.stages.redirects import levenshtein

    def ref(a, b):
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return d[la][lb]

    true = ref(a, b)
    got = levenshtein(a, b, cap)
    if cap is None or true <= cap:
        assert got == true
    else:
        assert got == cap + 1


@st.composite
def redirect_world(draw):
    n_redir = draw(st.integers(min_value=0, max_value=8))
    rmap = {}
    for _ in range(n_redir):
        src = draw(st.sampled_from(_NAMES))
        rmap[src] = draw(st.sampled_from(_NAMES))   # chains/cycles/self-loops
    n = draw(st.integers(min_value=1, max_value=12))
    names = [draw(st.one_of(st.none(), st.sampled_from(_NAMES)))
             for _ in range(n)]
    return rmap, names


@SETTINGS
@given(redirect_world(), st.integers(min_value=1, max_value=3),
       st.integers(min_value=0, max_value=3))
def test_fold_redirects_matches_rowwise(ray_session, world, max_hops, guard):
    import ray.data as rd
    from caligraph_ray.stages.redirects import fold_redirects, resolve_name
    rmap, names = world
    ds = rd.from_pandas(pd.DataFrame(
        {'rid': np.arange(len(names), dtype='int64'), 'name': names}))
    rds = rd.from_pandas(pd.DataFrame(
        {'src': list(rmap) or [''], 'tgt': [rmap[s] for s in rmap] or ['']}))
    got = fold_redirects(ds.repartition(2), rds, col='name',
                         max_hops=max_hops, guard=guard).to_pandas()
    got_map = {int(r['rid']): (None if pd.isna(r['name']) else r['name'])
               for _, r in got.iterrows()}
    want = {i: (None if nm is None
                else resolve_name(nm, rmap, max_hops, guard))
            for i, nm in enumerate(names)}
    assert got_map == want


@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=15),
       st.lists(st.integers(min_value=0, max_value=9), max_size=5),
       st.booleans())
def test_semi_anti_join_matches_isin(ray_session, vals, keys, anti):
    import ray.data as rd
    from caligraph_ray.stages.relational import semi_anti_join
    df = pd.DataFrame({'v': np.array(vals, dtype='int64')})
    got = semi_anti_join(rd.from_pandas(df).repartition(2), keys, 'v',
                         anti=anti).to_pandas()
    mask = df['v'].isin(set(keys))
    want = df[~mask] if anti else df[mask]
    # empty results may come back schema-less (documented engine contract)
    got_vals = [] if got.empty else sorted(got['v'].tolist())
    assert got_vals == sorted(want['v'].tolist())
