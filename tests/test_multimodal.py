"""Multimodal binary columns: REAL PPM/WAV codecs + stubbed video path."""

import numpy as np
import pytest

from caligraph_ray.stages.multimodal import (ImageDecoder, decode_images,
                                             decode_ppm, decode_wav,
                                             encode_ppm, encode_wav_pcm16,
                                             resize_images, resize_nearest,
                                             sample_frames,
                                             synthesize_media_table)


def test_ppm_roundtrip_and_resize():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comment handling
    payload = b'P6\n# a comment\n2 2\n255\n' + bytes(range(12))
    assert decode_ppm(payload).shape == (2, 2, 3)
    small = resize_nearest(img, 8, 6)
    assert small.shape == (6, 8, 3)
    assert small[0, 0].tolist() == img[0, 0].tolist()   # corner preserved


def test_wav_roundtrip():
    t = np.arange(800)
    sig = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype('<i2')
    rate, back = decode_wav(encode_wav_pcm16(sig, 8000))
    assert rate == 8000 and np.array_equal(back, sig)


def test_decoder_real_and_stub_gated():
    t = synthesize_media_table(6)
    d = ImageDecoder(fake=True)
    # image row (PPM): REAL decode, mean-R channel rises left→right gradient
    img_payload = t.column('payload')[0].as_py()
    emb = d._decode(img_payload)
    assert 0.45 < emb[0] < 0.55          # x-gradient mean ≈ 127/255
    assert np.array_equal(emb, ImageDecoder(fake=False)._decode(img_payload))
    # audio row (WAV): REAL decode, rms of the 0.5 sine ≈ 0.21
    wav_payload = t.column('payload')[1].as_py()
    a = d._decode(wav_payload)
    assert 0.1 < a[0] < 0.5
    # video row: no real codec → stub fake, NotImplementedError when fake=False
    vid_payload = t.column('payload')[2].as_py()
    assert np.array_equal(d._decode(vid_payload), d._decode(vid_payload))
    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)._decode(vid_payload)


def test_resize_stage(ray_session):
    import ray.data as rd
    media = rd.from_arrow(synthesize_media_table(9))
    images = media.filter(lambda r: r['media_type'] == 'image')
    out = resize_images(images, out_w=16, out_h=12).to_pandas()
    assert len(out) == 3
    for p, ow in zip(out['payload'], out['orig_width']):
        img = decode_ppm(p)
        assert img.shape == (12, 16, 3) and ow >= 32


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
