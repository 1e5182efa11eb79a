"""Property tests for the real multimodal codecs (pure numpy/stdlib —
no Ray): PPM encode/decode is a lossless round-trip incl. comment
headers, nearest-neighbour resize hits exact corners and preserves the
palette, and image features are deterministic, bounded and L1-sane."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

PURE = settings(max_examples=150, deadline=None)


@st.composite
def small_image(draw):
    h = draw(st.integers(min_value=1, max_value=8))
    w = draw(st.integers(min_value=1, max_value=8))
    pix = draw(st.lists(st.integers(0, 255), min_size=h * w * 3,
                        max_size=h * w * 3))
    return np.array(pix, dtype=np.uint8).reshape(h, w, 3)


@PURE
@given(small_image())
def test_ppm_roundtrip(img):
    from caligraph_ray.stages.multimodal import decode_ppm, encode_ppm
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_decodes_comment_headers():
    from caligraph_ray.stages.multimodal import decode_ppm
    img = b'P6\n# a comment\n2 1\n# another\n255\n' + bytes(6)
    assert decode_ppm(img).shape == (1, 2, 3)


@PURE
@given(small_image(), st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12))
def test_resize_nearest_invariants(img, out_w, out_h):
    from caligraph_ray.stages.multimodal import resize_nearest
    out = resize_nearest(img, out_w, out_h)
    assert out.shape == (out_h, out_w, 3)
    # every output pixel is some input pixel (no interpolation invented)
    in_pixels = {tuple(p) for p in img.reshape(-1, 3)}
    assert {tuple(p) for p in out.reshape(-1, 3)} <= in_pixels
    # the (0,0) corner maps exactly
    assert tuple(out[0, 0]) == tuple(img[0, 0])
    # identity resize is the identity
    h, w = img.shape[:2]
    assert np.array_equal(resize_nearest(img, w, h), img)


@PURE
@given(small_image())
def test_image_features_bounded_deterministic(img):
    from caligraph_ray.stages.multimodal import image_features
    f = image_features(img)
    assert f.shape == (16,) and f.dtype == np.float32
    assert np.array_equal(f, image_features(img))
    assert np.all(f >= 0.0) and np.all(f[:6] <= 1.0)
    assert f[6:].sum() <= 1.0 + 1e-6   # histogram fraction of pixels
