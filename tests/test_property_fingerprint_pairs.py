"""fingerprint_overlap_pairs is LOSSLESS (every fingerprint is its own
LSH bucket, so any pair sharing ≥ min_shared ≥ 1 fingerprints collides
somewhere) → exact set equality against a brute-force all-pairs count of
shared winnowing fingerprints."""

import itertools

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

_PASSAGES = ['the quick brown fox jumps over the lazy dog',
             'pack my box with five dozen liquor jugs',
             'sphinx of black quartz judge my vow']


@st.composite
def doc_frame(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    texts = []
    for _ in range(n):
        parts = draw(st.lists(st.sampled_from(_PASSAGES), min_size=0,
                              max_size=3))
        texts.append(' '.join(parts))
    return pd.DataFrame({'doc_id': np.arange(n, dtype='int64'),
                         'text': texts})


@SETTINGS
@given(doc_frame(), st.integers(min_value=1, max_value=6))
def test_fingerprint_pairs_exact_equality(ray_session, df, min_shared):
    import ray.data as rd
    from caligraph_ray.functions.hashing import rolling_fingerprint
    from caligraph_ray.stages.dedup import fingerprint_overlap_pairs
    got_df = fingerprint_overlap_pairs(rd.from_pandas(df).repartition(2),
                                       min_shared=min_shared).to_pandas()
    got = set() if got_df.empty else \
        {(int(r['a']), int(r['b'])) for _, r in got_df.iterrows()}
    fps = {int(r['doc_id']): set(rolling_fingerprint(r['text']))
           for _, r in df.iterrows()}
    want = {(a, b) for a, b in itertools.combinations(sorted(fps), 2)
            if len(fps[a] & fps[b]) >= min_shared}
    assert got == want
