"""N-Triples round-trip (S2 parser + S8 writer)."""

import os

import pyarrow as pa
import pytest

from caligraph_ray.sources.nt import read_nt, write_nt


def test_nt_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    t = pa.Table.from_pydict({
        'subj': ['Alan Turing', 'Alan Turing', 'Paris'],
        'pred': ['birthPlace', 'label', 'country'],
        'obj': ['London', 'Alan "the machine" Turing', 'France'],
        'is_literal': [False, True, False],
    })
    out = str(tmp_path / 'nt')
    write_nt(rd.from_arrow(t), out)
    files = [f for f in os.listdir(out)]
    assert files
    back = read_nt([os.path.join(out, f) for f in files])
    rows = {(r['subj'], r['pred'], r['obj'], r['is_literal']) for r in back.take_all()}
    want = {tuple(r.values()) for r in t.to_pylist()}
    assert rows == want
