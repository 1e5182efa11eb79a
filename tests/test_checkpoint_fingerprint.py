"""Checkpoint fingerprint invalidation (state/checkpoint.run_stage): a
rerun with the SAME fingerprint loads the durable copy without
rebuilding; a changed fingerprint (different thresholds/corpus) rebuilds
instead of silently serving stale data; fingerprint-less stages keep the
plain _SUCCESS resume."""

import pandas as pd


def _build_counter(calls, value):
    def build():
        import ray.data as rd
        calls['n'] += 1
        return rd.from_pandas(pd.DataFrame({'v': [value] * 4}))
    return build


def test_same_fingerprint_resumes_without_rebuild(ray_session, tmp_path):
    from caligraph_ray.state.checkpoint import run_stage
    root, calls = str(tmp_path), {'n': 0}
    fp = {'threshold': 0.8, 'rows': 100}
    a = run_stage(root, 'stage', _build_counter(calls, 1), fingerprint=fp)
    assert calls['n'] == 1 and a.count() == 4
    b = run_stage(root, 'stage', _build_counter(calls, 2), fingerprint=fp)
    assert calls['n'] == 1                      # build skipped
    assert sorted(r['v'] for r in b.take_all()) == [1, 1, 1, 1]


def test_changed_fingerprint_rebuilds(ray_session, tmp_path):
    from caligraph_ray.state.checkpoint import run_stage
    root, calls = str(tmp_path), {'n': 0}
    run_stage(root, 'stage', _build_counter(calls, 1),
              fingerprint={'threshold': 0.8})
    out = run_stage(root, 'stage', _build_counter(calls, 2),
                    fingerprint={'threshold': 0.95})
    assert calls['n'] == 2                      # stale checkpoint rebuilt
    assert sorted(r['v'] for r in out.take_all()) == [2, 2, 2, 2]
    # and the NEW fingerprint is now the stored one
    again = run_stage(root, 'stage', _build_counter(calls, 3),
                      fingerprint={'threshold': 0.95})
    assert calls['n'] == 2
    assert sorted(r['v'] for r in again.take_all()) == [2, 2, 2, 2]
