"""Checkpoint/resume semantics (north rule: resumable from checkpoint with
per-partition lineage)."""

import json
import os

import pytest

from caligraph_ray.state.checkpoint import (is_complete, pipeline_report,
                                            read_lineage, run_stage)


def test_run_stage_writes_lineage_and_skips_on_rerun(ray_session, tmp_path):
    import ray.data as rd
    calls = {'n': 0}

    def build():
        calls['n'] += 1
        return rd.range(100)

    root = str(tmp_path)
    out1 = run_stage(root, 'stage_a', build)
    assert out1.count() == 100
    assert calls['n'] == 1
    assert is_complete(root, 'stage_a')
    lin = read_lineage(root, 'stage_a')
    assert lin['rows_out'] == 100 and lin['n_files'] >= 1 and lin['wall_sec'] >= 0

    out2 = run_stage(root, 'stage_a', build)
    assert out2.count() == 100
    assert calls['n'] == 1  # build skipped: resumed from _SUCCESS


def test_partial_stage_is_rerun(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path)
    d = os.path.join(root, 'stage_b')
    os.makedirs(d)
    with open(os.path.join(d, 'orphan.parquet'), 'w') as f:
        f.write('garbage from a crashed run')
    out = run_stage(root, 'stage_b', lambda: rd.range(10))
    assert out.count() == 10
    assert not os.path.exists(os.path.join(d, 'orphan.parquet'))


def test_flagship_checkpointed_resumes(ray_session, small_corpus, tmp_path):
    import ray.data as rd
    from caligraph_ray.pipelines.flagship import (run_flagship,
                                                  run_flagship_checkpointed)
    pages = rd.from_arrow(small_corpus).repartition(4)
    root = str(tmp_path)
    t1 = run_flagship_checkpointed(pages, root)
    rows1 = {(r['subj'], r['pred'], r['obj'], r['is_literal']) for r in t1.take_all()}
    report = pipeline_report(root)
    assert set(report) == {'01_combined', '02_categories', '03_mentions', '04_linked', '05_triples'}
    mtime_items = os.path.getmtime(os.path.join(root, '01_combined', '_SUCCESS'))

    # wipe the last stage → rerun recomputes only it, reusing earlier stages
    import shutil
    shutil.rmtree(os.path.join(root, '05_triples'))
    t2 = run_flagship_checkpointed(pages, root)
    rows2 = {(r['subj'], r['pred'], r['obj'], r['is_literal']) for r in t2.take_all()}
    assert rows1 == rows2
    assert os.path.getmtime(os.path.join(root, '01_combined', '_SUCCESS')) == mtime_items

    # checkpointed result == direct result
    direct = run_flagship(rd.from_arrow(small_corpus).repartition(4))
    rows3 = {(r['subj'], r['pred'], r['obj'], r['is_literal']) for r in direct.take_all()}
    assert rows1 == rows3

    # partitioned triple sink exists
    out_parts = os.listdir(os.path.join(root, 'triples_out'))
    assert any(p.startswith('subj_bucket=') for p in out_parts)


def test_training_data_prep_checkpointed_resume(ray_session, tmp_path):
    """The LLM-data composite's checkpointed variant: same output as the
    direct run, and a rerun against the same root reuses every stage
    (dirs untouched)."""
    import os

    import numpy as np
    import pandas as pd
    import ray

    from caligraph_ray.pipelines.data_prep import (
        training_data_prep, training_data_prep_checkpointed)

    rng = np.random.RandomState(3)
    words = ['the', 'of', 'and'] + [f'w{i}' for i in range(60)]
    docs = pd.DataFrame({
        'doc_id': np.arange(200, dtype='int64'),
        'text': [' '.join(['the', 'of'] + list(rng.choice(
                     words, size=rng.randint(10, 38))))
                 for _ in range(200)],
        'source': [f'host{i % 7}.org' for i in range(200)]})
    ds = ray.data.from_pandas(docs).repartition(3)

    direct = training_data_prep(ds).to_pandas() \
        .sort_values(['doc_id']).reset_index(drop=True)
    root = str(tmp_path / 'prep')
    first = training_data_prep_checkpointed(ds, root).to_pandas() \
        .sort_values(['doc_id']).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        direct.sort_index(axis=1), first.sort_index(axis=1))

    stamps = {n: os.path.getmtime(os.path.join(root, n, '_SUCCESS'))
              for n in ('01_gated', '02_clean', '03_packed')}
    again = training_data_prep_checkpointed(ds, root).to_pandas() \
        .sort_values(['doc_id']).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        first.sort_index(axis=1), again.sort_index(axis=1))
    for n, t in stamps.items():
        assert os.path.getmtime(os.path.join(root, n, '_SUCCESS')) == t, n

    # a changed config invalidates the stale checkpoints instead of
    # silently reusing them
    other = training_data_prep_checkpointed(ds, root, capacity=64)
    assert other.count() >= first['last_seq'].max()
