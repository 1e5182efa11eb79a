"""Multimodal binary-column plumbing (decode stubbed, Ray-side real)."""

import numpy as np
import pytest

from caligraph_ray.stages.multimodal import (ImageDecoder, decode_images,
                                             sample_frames,
                                             synthesize_media_table)


def test_decoder_deterministic_and_stub_gated():
    t = synthesize_media_table(6)
    d = ImageDecoder(fake=True)
    p = t.column('payload')[0].as_py()
    assert np.array_equal(d._decode(p), d._decode(p))
    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)._decode(p)


def test_decode_images_pipeline(ray_session):
    import ray.data as rd
    media = rd.from_arrow(synthesize_media_table(30))
    out = decode_images(media).to_pandas()
    assert len(out) == 30
    assert all(len(e) == 16 for e in out['embedding'])
    assert (out['payload_bytes'] > 0).all()
    # deterministic across runs
    out2 = decode_images(rd.from_arrow(synthesize_media_table(30))).to_pandas()
    a = out.sort_values('media_id').reset_index(drop=True)
    b = out2.sort_values('media_id').reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a['embedding'], b['embedding']))


def test_sample_frames(ray_session):
    import ray.data as rd
    media = rd.from_arrow(synthesize_media_table(9))
    videos = media.filter(lambda r: r['media_type'] == 'video')
    frames = sample_frames(videos, stride_ms=1000).to_pandas()
    assert not frames.empty
    per_media = frames.groupby('media_id')
    for mid, g in per_media:
        assert list(g['frame_idx']) == list(range(len(g)))
        assert (g['ts_ms'] == g['frame_idx'] * 1000).all()
        assert all(len(p) > 0 for p in g['frame_payload'])
