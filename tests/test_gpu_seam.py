"""GPU-seam config tests (VERDICT r4 missing #3): the model-shaped actor
pools must ACCEPT and FORWARD per-actor GPU shares and batch sizes, the
way test_real_model_optin pins the weights seam. Two layers:

* plumbing tests run everywhere — a capture stub stands in for the
  Dataset, so the exact kwargs reaching ``map_batches`` are asserted
  without needing a GPU (or even Ray);
* an end-to-end pool run is skip-guarded on an actual GPU resource.
"""

import numpy as np
import pandas as pd
import pytest


class _CaptureDS:
    """Stands in for a ray.data.Dataset: records every map_batches call's
    kwargs (downstream exchanges may chain further calls on the stub —
    ``kwargs`` stays the FIRST call, i.e. the actor pool itself)."""

    def __init__(self):
        self.calls = []

    @property
    def kwargs(self):
        return self.calls[0]

    def map_batches(self, fn, **kwargs):
        self.calls.append(dict(kwargs))
        return self


def test_embed_texts_forwards_gpu_share():
    from caligraph_ray.stages.ed import embed_texts
    ds = _CaptureDS()
    embed_texts(ds, 'label', num_gpus=0.25, batch_size=128,
                concurrency=(1, 2))
    assert ds.kwargs['num_gpus'] == 0.25
    assert ds.kwargs['batch_size'] == 128
    assert ds.kwargs['concurrency'] == (1, 2)
    # no GPU requested → the kwarg must be ABSENT (a num_gpus=0 would
    # still annotate the op and confuse the scheduler)
    ds2 = _CaptureDS()
    embed_texts(ds2, 'label')
    assert 'num_gpus' not in ds2.kwargs


def test_rerank_and_md_pools_forward_gpu_share(ray_session):
    import ray.data as rd

    from caligraph_ray.stages.ed import md_predict_tokens, rerank_candidates
    ds = _CaptureDS()
    # rerank_candidates chains bucketed_map after map_batches — the capture
    # stub returns itself, so only the first (pool) call is asserted; stop
    # it there by raising from bucketed_map via the stub having no schema
    try:
        rerank_candidates(ds, num_gpus=0.5, batch_size=64)
    except Exception:
        pass
    assert ds.kwargs['num_gpus'] == 0.5 and ds.kwargs['batch_size'] == 64
    ds2 = _CaptureDS()
    md_predict_tokens(ds2, num_gpus=1.0, batch_size=384)
    assert ds2.kwargs['num_gpus'] == 1.0 and ds2.kwargs['batch_size'] == 384


def test_multimodal_pools_forward_gpu_share():
    from caligraph_ray.stages.multimodal import (decode_images,
                                                 resize_images,
                                                 sample_frames)
    for fn in (lambda d: decode_images(d, num_gpus=0.5, batch_size=8),
               lambda d: resize_images(d, num_gpus=0.5, batch_size=8),
               lambda d: sample_frames(d, num_gpus=0.5, batch_size=8)):
        ds = _CaptureDS()
        fn(ds)
        assert ds.kwargs['num_gpus'] == 0.5 and ds.kwargs['batch_size'] == 8
    ds = _CaptureDS()
    decode_images(ds)
    assert 'num_gpus' not in ds.kwargs and ds.kwargs['batch_size'] > 0


def _has_gpu():
    try:
        import ray
        return ray.is_initialized() and \
            ray.cluster_resources().get('GPU', 0) >= 1
    except Exception:
        return False


@pytest.mark.skipif(not _has_gpu(), reason='no GPU resource in this '
                    'sandbox — plumbing is pinned by the capture tests; '
                    'this exercises an actual GPU actor pool')
def test_gpu_actor_pool_runs_end_to_end(ray_session):
    import ray.data as rd

    from caligraph_ray.stages.ed import embed_texts
    ds = rd.from_pandas(pd.DataFrame({'label': [f'e{i}' for i in range(32)]}))
    out = embed_texts(ds, 'label', num_gpus=1, concurrency=(1, 1)).to_pandas()
    assert len(out) == 32 and len(out['embedding'].iloc[0]) == 64
