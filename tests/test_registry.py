"""Pipeline-stage registry + matcher factory (§2.10 extension surface)."""

import pandas as pd
import pytest

from caligraph_ray.pipelines.registry import (PipelineStage, make_matcher,
                                              run_pipeline)


def test_run_pipeline_topological(ray_session, tmp_path):
    import ray.data as rd

    stages = [
        PipelineStage('double', ['source'],
                      lambda i: i['source'].map_batches(
                          lambda b: b.assign(v=b['v'] * 2), batch_format='pandas')),
        PipelineStage('total', ['double'],
                      lambda i: i['double'].map_batches(
                          lambda b: pd.DataFrame({'v': [int(b['v'].sum())]}),
                          batch_format='pandas')),
    ]
    src = rd.from_pandas(pd.DataFrame({'v': [1, 2, 3]})).repartition(1)
    out = run_pipeline(stages, sources={'source': src})
    assert sum(r['v'] for r in out['total'].take_all()) == 12

    # checkpointed: second run resumes, same result
    out2 = run_pipeline(stages, sources={'source': src},
                        checkpoint_root=str(tmp_path))
    out3 = run_pipeline(stages, sources={'source': src},
                        checkpoint_root=str(tmp_path))
    assert (sum(r['v'] for r in out2['total'].take_all())
            == sum(r['v'] for r in out3['total'].take_all()) == 12)


def test_run_pipeline_detects_cycles(ray_session):
    stages = [PipelineStage('a', ['b'], lambda i: None),
              PipelineStage('b', ['a'], lambda i: None)]
    with pytest.raises(ValueError, match='unresolvable'):
        run_pipeline(stages)


def test_matcher_factory(ray_session):
    import ray.data as rd
    rows = [{'mention_uid': 1, 'norm_surface': 'acme', 'entity': 'Acme', 'link_score': 1.0},
            {'mention_uid': 2, 'norm_surface': 'acme', 'entity': None, 'link_score': 0.0}]
    linked = rd.from_pandas(pd.DataFrame(rows))
    for name in ('nastylinker', 'edin'):
        clusters = make_matcher(name)(linked).to_pandas()
        assert set(clusters.columns) >= {'node', 'cluster'}
        by_cluster = clusters.groupby('cluster')['node'].apply(set)
        assert any({1, 2} <= s for s in by_cluster)  # same surface → same cluster
    with pytest.raises(KeyError):
        make_matcher('nope')
