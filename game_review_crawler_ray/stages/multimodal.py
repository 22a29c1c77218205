"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

The image/audio codec libraries are not available in this container, so the
decode step is STUBBED: ``RealDecoder`` raises NotImplementedError behind an
import-try, and ``FakeDecoder`` produces a deterministic per-payload feature
(byte histogram) so the Ray-side plumbing — schema, batch size, actor
signature, output layout — is real and tested. A deployment swaps the
decoder class without touching the pipeline.

Media table schema::

    media_id: int64, kind: string ('image'|'audio'),
    payload: binary, width: int32, height: int32, sample_rate: int32
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])

FEATURE_DIM = 16


def gen_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (payload = pseudo-random bytes)."""
    ids, kinds, payloads, ws, hs, srs = [], [], [], [], [], []
    for i in range(n):
        rng = random.Random(f"media:{seed}:{i}")
        kind = "image" if i % 2 == 0 else "audio"
        size = rng.randint(256, 4096)
        payload = bytes(rng.getrandbits(8) for _ in range(size))
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        ws.append(rng.choice([64, 128, 256]) if kind == "image" else 0)
        hs.append(rng.choice([64, 128, 256]) if kind == "image" else 0)
        srs.append(16000 if kind == "audio" else 0)
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(kinds, pa.string()),
         pa.array(payloads, pa.binary()), pa.array(ws, pa.int32()),
         pa.array(hs, pa.int32()), pa.array(srs, pa.int32())],
        schema=MEDIA_SCHEMA)


class RealDecoder:
    """Would decode images (PIL) / audio; libs absent in this container."""

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - always taken here
            raise NotImplementedError(
                "image/audio codecs are not installed in this environment; "
                "use FakeDecoder for the plumbing path") from e


class FakeDecoder:
    """Deterministic decode stub: 16-bin byte histogram as the 'feature'.

    Callable class for map_batches actor pools — 'model load' happens once
    per actor in __init__ (here: just the bin edges), work per batch in
    __call__. Batches stay small because payloads are wide binary rows.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        self.edges = np.linspace(0, 256, feature_dim + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.edges)
            feats.append((hist / max(1, len(arr))).astype(np.float32))
        feat_arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        norm = pa.array([float(np.linalg.norm(f)) for f in feats], pa.float64())
        out = batch.drop_columns(["payload"])  # wide binary never flows on
        return out.append_column("feature", feat_arr).append_column("feat_norm", norm)


def media_features(media: pa.Table, concurrency: int = 2,
                   batch_size: int = 64) -> ray.data.Dataset:
    """The multimodal pipeline: actor-pool decode/feature-extract over small
    batches; the binary payload column is dropped at the stage boundary."""
    ds = ray.data.from_arrow(media)
    return ds.map_batches(FakeDecoder, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow")
