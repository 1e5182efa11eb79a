"""Property-based cross-checks for the alias/linking family — the two
scale regimes must agree exactly:

* build_alias_index_local (driver dict) ≡ merged build_alias_index_sharded
  shards (each surface in exactly one shard, same sorted candidate lists).
* link_mentions (broadcast index lookup) ≡ link_mentions_join (shuffle
  join against the alias_argmax Dataset) — identical (entity, link_score)
  per mention, including wikilinked rows, NIL surfaces and ties.
* alias_argmax ≡ a Counter reference with the (freq desc, name asc)
  tie-break.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_SURFACES = ['alpha', 'beta', 'gamma']
_NAMES = [None, 'Ent A', 'Ent B', 'Ent C']


@st.composite
def mentions_frame(draw):
    n = draw(st.integers(min_value=1, max_value=16))
    rows = []
    for i in range(n):
        rows.append({'mention_uid': i + 1,
                     'norm_surface': draw(st.sampled_from(_SURFACES)),
                     'name': draw(st.sampled_from(_NAMES))})
    return pd.DataFrame(rows)


def _ref_index(df):
    counts = {}
    for _, r in df.iterrows():
        if r['name'] is None or r['norm_surface'] == '':
            continue
        k = (r['norm_surface'], r['name'])
        counts[k] = counts.get(k, 0) + 1
    index = {}
    for (s, nm), c in counts.items():
        index.setdefault(s, []).append((nm, c))
    for s in index:
        index[s].sort(key=lambda x: (-x[1], x[0]))
    return index


@SETTINGS
@given(mentions_frame())
def test_local_and_sharded_index_agree(ray_session, df):
    import ray
    import ray.data as rd
    from caligraph_ray.stages.alias import (build_alias_index_local,
                                            build_alias_index_sharded)
    ds = rd.from_pandas(df).repartition(2)
    local = build_alias_index_local(ds)
    shards = ray.get(build_alias_index_sharded(ds, n_shards=4))
    merged = {}
    for sh in shards:
        for k, v in sh.items():
            assert k not in merged, f'surface {k!r} in two shards'
            merged[k] = v
    assert merged == local == _ref_index(df)


@SETTINGS
@given(mentions_frame())
def test_broadcast_and_join_linking_agree(ray_session, df):
    import ray
    import ray.data as rd
    from caligraph_ray.stages.alias import (build_alias_index,
                                            link_mentions,
                                            link_mentions_join)
    ds = rd.from_pandas(df).repartition(2)
    idx_ref, _ = build_alias_index(ds)
    via_bcast = link_mentions(ds, idx_ref).to_pandas()
    via_join = link_mentions_join(ds).to_pandas()

    def canon(d):
        return {int(r['mention_uid']):
                (r['entity'] if pd.notna(r['entity']) else None,
                 round(float(r['link_score']), 12))
                for _, r in d.iterrows()}
    assert canon(via_bcast) == canon(via_join)


@SETTINGS
@given(mentions_frame())
def test_alias_argmax_matches_counter(ray_session, df):
    import ray.data as rd
    from caligraph_ray.stages.alias import alias_argmax, alias_counts
    got_df = alias_argmax(alias_counts(
        rd.from_pandas(df).repartition(2))).to_pandas()
    got = {} if got_df.empty else \
        {r['norm_surface']: (r['top_entity'], round(float(r['top_score']), 12))
         for _, r in got_df.iterrows()}
    want = {}
    for s, cands in _ref_index(df).items():
        total = sum(c for _, c in cands)
        want[s] = (cands[0][0], round(cands[0][1] / total, 12))
    assert got == want
