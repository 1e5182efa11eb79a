"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata; the
decode/resize/feature kernels are STUBS (the real codec libraries are not in
this environment — each stub either raises NotImplementedError or runs a
clearly-marked deterministic fake), while everything Ray-side is real and
tested: schemas, actor-pool stages, small batch sizes for large payloads,
and partitioned output layout.

Batch-size guidance: payload bytes × batch_size × concurrency must fit the
worker heap — callers pass ``batch_size`` accordingly (default 64 rows, far
below the text-stage 4096)."""

from __future__ import annotations

import hashlib
import numpy as np
import pandas as pd
import pyarrow as pa

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

    ``fake=True`` (default in this environment) derives a deterministic
    16-float 'embedding' from the payload bytes — the real decoder
    (Pillow/libjpeg) slots into ``_decode`` without touching the Ray-side
    plumbing. ``fake=False`` raises NotImplementedError (codec libs absent).
    """

    def __init__(self, fake: bool = True, embedding_dim: int = 16):
        self.fake = fake
        self.dim = embedding_dim

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                'real image decoding requires Pillow/opencv (not in this '
                'container); construct ImageDecoder(fake=True) for the '
                'deterministic stub')
        h = hashlib.blake2b(payload, digest_size=self.dim * 4).digest()
        arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
        return (arr / np.uint32(0xFFFFFFFF)).astype(np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode(p) for p in batch['payload']]
        out = batch[['media_id', 'url', 'media_type']].copy()
        out['embedding'] = feats
        out['payload_bytes'] = [len(p) for p in batch['payload']]
        return out


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


def decode_images(media_ds, concurrency: int = 4, fake: bool = True):
    """media rows → per-image features (actor pool, small batches)."""
    return media_ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={'fake': fake},
        batch_format='pandas', batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency))


def sample_frames(media_ds, stride_ms: int = 1000, concurrency: int = 4):
    """video rows → frame rows (flat, one row per frame)."""
    return media_ds.map_batches(
        FrameSampler, fn_constructor_kwargs={'stride_ms': stride_ms},
        batch_format='pandas', batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency))


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests/benchmarks."""
    rng = np.random.RandomState(seed)
    ids, urls, types, payloads, w, h, dur = [], [], [], [], [], [], []
    for i in range(n):
        mt = ['image', 'audio', 'video'][i % 3]
        size = 256 + int(rng.randint(0, 1024))
        ids.append(i)
        urls.append(f'https://ex.org/media/{i}')
        types.append(mt)
        payloads.append(hashlib.blake2b(f'{seed}:{i}'.encode(),
                                        digest_size=32).digest() * (size // 32 + 1))
        w.append(640 if mt == 'image' else -1)
        h.append(480 if mt == 'image' else -1)
        dur.append(int(rng.randint(1000, 10_000)) if mt != 'image' else -1)
    return pa.Table.from_pydict({
        'media_id': ids, 'url': urls, 'media_type': types,
        'payload': pa.array(payloads, pa.binary()),
        'width': pa.array(w, pa.int32()), 'height': pa.array(h, pa.int32()),
        'duration_ms': pa.array(dur, pa.int32()),
    }, schema=MEDIA_SCHEMA)
