"""Boilerplate line removal (stages/boilerplate.py)."""

import pandas as pd
import pytest

from caligraph_ray.stages.boilerplate import remove_boilerplate


@pytest.fixture
def rd(ray_session):
    import ray.data
    return ray.data


def test_remove_boilerplate_per_group(ray_session, rd):
    # host A: 3 docs share NAV/FOOT (min_docs=3 → stripped); host B has the
    # same NAV line only twice → kept there (per-group isolation).
    rows = []
    for i in range(3):
        rows.append({'doc_id': i, 'source': 'A',
                     'text': f'NAV\nbody A{i}\nFOOT'})
    for i in range(2):
        rows.append({'doc_id': 10 + i, 'source': 'B',
                     'text': f'NAV\nbody B{i}'})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = remove_boilerplate(ds, min_docs=3).to_pandas() \
        .sort_values('doc_id').reset_index(drop=True)
    assert len(out) == 5
    a = out[out.doc_id < 10]
    assert list(a['cleaned']) == ['body A0', 'body A1', 'body A2']
    assert list(a['n_removed']) == [2, 2, 2]
    b = out[out.doc_id >= 10]
    assert list(b['cleaned']) == ['NAV\nbody B0', 'NAV\nbody B1']
    assert list(b['n_removed']) == [0, 0]


def test_remove_boilerplate_null_text_doc_dropped(ray_session, rd):
    # one NULL-text doc must not TypeError its whole bucket; it simply
    # contributes no lines (the SQL unnest shape) and drops out
    docs = pd.DataFrame({
        'doc_id': [1, 2, 3, 4, 5, 6, 7],
        'source': ['h'] * 7,
        'text': ['nav\nbody1', 'nav\nbody2', 'nav\nbody3', 'nav\nbody4',
                 'nav\nbody5', 'nav\nbody6', None]})
    out = remove_boilerplate(rd.from_pandas(docs), min_docs=5) \
        .to_pandas().sort_values('doc_id').reset_index(drop=True)
    assert list(out['doc_id'].astype(int)) == [1, 2, 3, 4, 5, 6]
    assert set(out['cleaned']) == {f'body{i}' for i in range(1, 7)}
    assert (out['n_removed'] == 1).all()
