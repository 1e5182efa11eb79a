"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata. The codec
situation in this container:

* **PPM (P6) images** — REAL decode/resize/feature kernels (pure numpy;
  the format is a header + raw RGB bytes). The synthetic corpus emits
  real PPM payloads, so the image path is exercised end-to-end.
* **WAV PCM audio** — REAL decode + features via the stdlib ``wave``
  module (rms, zero-crossing rate, coarse spectrum).
* **JPEG/PNG/video codecs** — STUBS (libjpeg/ffmpeg absent): a
  clearly-marked deterministic fake or NotImplementedError; the Ray-side
  plumbing (schemas, actor pools, small batches) is identical, so the real
  library is a constructor swap.

Batch-size guidance: payload bytes × batch_size × concurrency must fit the
worker heap — callers pass ``batch_size`` accordingly (default 64 rows, far
below the text-stage 4096)."""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pandas as pd
import pyarrow as pa


# --- real pure-numpy/stdlib codecs ------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w = img.shape[:2]
    return f'P6\n{w} {h}\n255\n'.encode('ascii') + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 (real decoder, no libraries)."""
    if not payload.startswith(b'P6'):
        raise ValueError('not a P6 PPM payload')
    fields, idx = [], 2
    while len(fields) < 3:
        while idx < len(payload) and payload[idx:idx + 1].isspace():
            idx += 1
        if payload[idx:idx + 1] == b'#':         # comment line
            idx = payload.index(b'\n', idx) + 1
            continue
        start = idx
        while idx < len(payload) and not payload[idx:idx + 1].isspace():
            idx += 1
        fields.append(int(payload[start:idx]))
    idx += 1   # single whitespace after maxval
    w, h, _maxval = fields
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
    return data.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize (real kernel, pure numpy indexing)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real image embedding: per-channel mean+std and a 10-bin grayscale
    histogram, L1-normalized → ``dim`` float32s."""
    f = np.zeros(dim, dtype=np.float64)
    flat = img.reshape(-1, 3).astype(np.float64)
    f[0:3] = flat.mean(axis=0) / 255.0
    f[3:6] = flat.std(axis=0) / 255.0
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=min(10, dim - 6), range=(0, 255))
    f[6:6 + len(hist)] = hist / max(1, gray.size)
    return f.astype(np.float32)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype('<i2').tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """WAV bytes → (rate, int16 numpy samples) — real stdlib decoder."""
    with wave.open(io.BytesIO(payload), 'rb') as w:
        rate = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype='<i2')
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1).astype('<i2')
    return rate, data


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Real audio embedding: rms, zero-crossing rate, duration and a coarse
    |FFT| spectrum, → ``dim`` float32s."""
    f = np.zeros(dim, dtype=np.float64)
    x = samples.astype(np.float64) / 32768.0
    if x.size:
        f[0] = float(np.sqrt(np.mean(x ** 2)))
        f[1] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        f[2] = x.size / rate
        spec = np.abs(np.fft.rfft(x))[:max(1, dim - 3)]
        k = min(len(spec), dim - 3)
        denom = spec.sum() or 1.0
        f[3:3 + k] = spec[:k] / denom
    return f.astype(np.float32)

MEDIA_SCHEMA = pa.schema([
    ('media_id', pa.int64()),
    ('url', pa.string()),
    ('media_type', pa.string()),      # 'image' | 'audio' | 'video'
    ('payload', pa.binary()),
    ('width', pa.int32()),            # -1 when unknown
    ('height', pa.int32()),
    ('duration_ms', pa.int32()),
])

MEDIA_BATCH_SIZE = 64  # large binary payloads → small batches


class ImageDecoder:
    """Actor-pool stage: binary image payload → decoded feature columns.

    PPM (P6) payloads decode FOR REAL (pure-numpy codec above) and produce
    real statistics-based embeddings. Other formats: ``fake=True`` (default
    here) derives a deterministic payload-hash embedding; ``fake=False``
    raises NotImplementedError (libjpeg absent) — a Pillow-backed decoder
    slots into ``_decode`` without touching the Ray-side plumbing.
    """

    def __init__(self, fake: bool = True, embedding_dim: int = 16):
        self.fake = fake
        self.dim = embedding_dim

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload.startswith(b'P6'):
            return image_features(decode_ppm(payload), self.dim)
        if payload.startswith(b'RIFF') and payload[8:12] == b'WAVE':
            # RIFF alone is not WAV (AVI video is RIFF too): check the
            # form type, else non-WAV RIFF media crashes the task instead
            # of reaching the fake/NotImplementedError path
            rate, samples = decode_wav(payload)
            return audio_features(samples, rate, self.dim)
        if not self.fake:
            raise NotImplementedError(
                'real JPEG/PNG decoding requires Pillow/opencv (not in this '
                'container); PPM/WAV payloads decode for real, other formats '
                'need ImageDecoder(fake=True) for the deterministic stub')
        h = hashlib.blake2b(payload, digest_size=self.dim * 4).digest()
        arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
        return (arr / np.uint32(0xFFFFFFFF)).astype(np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode(p) for p in batch['payload']]
        out = batch[['media_id', 'url', 'media_type']].copy()
        out['embedding'] = feats
        out['payload_bytes'] = [len(p) for p in batch['payload']]
        return out


class ImageResizer:
    """Actor-pool stage: real nearest-neighbour resize for PPM payloads —
    (payload, target w×h) → resized PPM payload + original dims."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads, ws, hs = [], [], []
        for p in batch['payload']:
            img = decode_ppm(p)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            payloads.append(encode_ppm(resize_nearest(img, self.out_w, self.out_h)))
        out = batch[['media_id', 'url']].copy()
        out['payload'] = payloads
        out['orig_width'] = ws
        out['orig_height'] = hs
        out['width'] = self.out_w
        out['height'] = self.out_h
        return out


def _pool_kwargs(num_gpus, batch_size):
    """Shared GPU-seam plumbing for the media actor pools: per-actor GPU
    share + batch-size override (large binary payloads need small batches;
    a GPU decoder wants num_gpus=1 and concurrency = accelerator count).
    Pinned by tests/test_gpu_seam.py."""
    kw = {'batch_size': MEDIA_BATCH_SIZE if batch_size is None
          else batch_size}
    if num_gpus is not None:
        kw['num_gpus'] = num_gpus
    return kw


def resize_images(media_ds, out_w: int = 64, out_h: int = 64,
                  concurrency: int = 4, num_gpus=None, batch_size=None):
    """PPM image rows → resized PPM rows (real kernel, actor pool)."""
    return media_ds.map_batches(
        ImageResizer, fn_constructor_kwargs={'out_w': out_w, 'out_h': out_h},
        batch_format='pandas', concurrency=(1, concurrency),
        **_pool_kwargs(num_gpus, batch_size))


class FrameSampler:
    """Actor-pool stage: 'video' payload → one row per sampled frame
    (every ``stride_ms``). Frame extraction itself is stubbed: frames are
    deterministic byte slices; a real ffmpeg-backed sampler keeps the exact
    same output schema (media_id, frame_idx, ts_ms, frame_payload)."""

    def __init__(self, stride_ms: int = 1000, fake: bool = True):
        if not fake:
            raise NotImplementedError('real frame sampling requires ffmpeg')
        self.stride_ms = stride_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            duration = max(int(r['duration_ms']), 0)
            n_frames = max(1, duration // self.stride_ms)
            payload = r['payload']
            for i in range(n_frames):
                lo = (i * len(payload)) // n_frames
                hi = ((i + 1) * len(payload)) // n_frames
                rows.append({'media_id': r['media_id'], 'frame_idx': i,
                             'ts_ms': i * self.stride_ms,
                             'frame_payload': payload[lo:max(hi, lo + 1)]})
        return pd.DataFrame(rows, columns=['media_id', 'frame_idx', 'ts_ms',
                                           'frame_payload'])


def decode_images(media_ds, concurrency: int = 4, fake: bool = True,
                  num_gpus=None, batch_size=None):
    """media rows → per-image features (actor pool, small batches)."""
    return media_ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={'fake': fake},
        batch_format='pandas', concurrency=(1, concurrency),
        **_pool_kwargs(num_gpus, batch_size))


def sample_frames(media_ds, stride_ms: int = 1000, concurrency: int = 4,
                  num_gpus=None, batch_size=None):
    """video rows → frame rows (flat, one row per frame)."""
    return media_ds.map_batches(
        FrameSampler, fn_constructor_kwargs={'stride_ms': stride_ms},
        batch_format='pandas', concurrency=(1, concurrency),
        **_pool_kwargs(num_gpus, batch_size))


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus for tests/benchmarks: REAL PPM images
    (gradient + noise) and REAL WAV PCM audio (sine + noise); video rows
    carry opaque bytes (no real container format without ffmpeg)."""
    rng = np.random.RandomState(seed)
    ids, urls, types, payloads, w, h, dur = [], [], [], [], [], [], []
    for i in range(n):
        mt = ['image', 'audio', 'video'][i % 3]
        ids.append(i)
        urls.append(f'https://ex.org/media/{i}')
        types.append(mt)
        if mt == 'image':
            iw, ih = 32 + int(rng.randint(0, 32)), 24 + int(rng.randint(0, 24))
            yy, xx = np.mgrid[0:ih, 0:iw]
            img = np.stack([(xx * 255 // max(1, iw - 1)),
                            (yy * 255 // max(1, ih - 1)),
                            rng.randint(0, 256, (ih, iw))], axis=-1).astype(np.uint8)
            payloads.append(encode_ppm(img))
            w.append(iw)
            h.append(ih)
            dur.append(-1)
        elif mt == 'audio':
            rate = 8000
            ms = 200 + int(rng.randint(0, 800))
            t = np.arange(rate * ms // 1000)
            freq = 200 + int(rng.randint(0, 2000))
            sig = (0.5 * np.sin(2 * np.pi * freq * t / rate)
                   + 0.05 * rng.normal(size=t.size))
            payloads.append(encode_wav_pcm16((sig * 20000).astype('<i2'), rate))
            w.append(-1)
            h.append(-1)
            dur.append(ms)
        else:
            size = 256 + int(rng.randint(0, 1024))
            payloads.append(hashlib.blake2b(f'{seed}:{i}'.encode(),
                                            digest_size=32).digest() * (size // 32 + 1))
            w.append(-1)
            h.append(-1)
            dur.append(int(rng.randint(1000, 10_000)))
    return pa.Table.from_pydict({
        'media_id': ids, 'url': urls, 'media_type': types,
        'payload': pa.array(payloads, pa.binary()),
        'width': pa.array(w, pa.int32()), 'height': pa.array(h, pa.int32()),
        'duration_ms': pa.array(dur, pa.int32()),
    }, schema=MEDIA_SCHEMA)
