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
        feats, norms = [], []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.edges)
            histf = hist / max(1, len(arr))           # float64
            feats.append(histf.astype(np.float32))
            # norm from the float64 histogram (not the float32 feature) so
            # the SQL oracle — which recomputes count/len in DOUBLE from
            # the persisted byte values — reproduces it bit-for-bit
            norms.append(float(np.linalg.norm(histf)))
        feat_arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        norm = pa.array(norms, pa.float64())
        out = batch.drop_columns(["payload"])  # wide binary never flows on
        return out.append_column("feature", feat_arr).append_column("feat_norm", norm)


class FakeResizer:
    """Deterministic resize stub for image rows (actor-pool stage).

    A real deployment decodes + resizes with PIL/opencv; here the payload
    bytes are resampled to ``target_w*target_h`` with nearest-index
    sampling so output sizes, metadata updates and the binary-in/binary-out
    actor signature are all real. Audio rows pass through untouched.
    """

    def __init__(self, target_w: int = 64, target_h: int = 64):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_out = self.tw * self.th
        out_p, out_w, out_h = [], [], []
        for kind, payload, w, h in zip(kinds, payloads,
                                       batch.column("width").to_pylist(),
                                       batch.column("height").to_pylist()):
            if kind != "image" or not payload:
                out_p.append(payload)
                out_w.append(w)
                out_h.append(h)
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
            idx = (np.arange(n_out) * len(arr) // n_out).astype(np.int64)
            out_p.append(arr[idx].tobytes())
            out_w.append(self.tw)
            out_h.append(self.th)
        names = batch.column_names
        return (batch
                .set_column(names.index("payload"), "payload",
                            pa.array(out_p, pa.binary()))
                .set_column(names.index("width"), "width",
                            pa.array(out_w, pa.int32()))
                .set_column(names.index("height"), "height",
                            pa.array(out_h, pa.int32())))


class FrameSampler:
    """Uniform frame sampling for audio/video rows: one output row per
    sampled frame (media_id, frame_idx, frame payload) — the explode shape
    a video pipeline needs. Image rows emit one frame (the whole payload).
    """

    def __init__(self, n_frames: int = 4, frame_bytes: int = 256):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_o, idx_o, frames_o = [], [], []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            payload = payload or b""
            if kind == "image":
                ids_o.append(mid)
                idx_o.append(0)
                frames_o.append(payload)
                continue
            n = max(1, len(payload) // self.frame_bytes)
            k = min(self.n_frames, n)
            for j in range(k):
                start = (j * n // k) * self.frame_bytes
                ids_o.append(mid)
                idx_o.append(j)
                frames_o.append(payload[start: start + self.frame_bytes])
        return pa.table({
            "media_id": pa.array(ids_o, pa.int64()),
            "frame_idx": pa.array(idx_o, pa.int32()),
            "frame": pa.array(frames_o, pa.binary()),
        })


def media_features(media: pa.Table, concurrency: int = 2,
                   batch_size: int = 64) -> ray.data.Dataset:
    """The multimodal pipeline: actor-pool decode/feature-extract over small
    batches; the binary payload column is dropped at the stage boundary."""
    ds = ray.data.from_arrow(media)
    return ds.map_batches(FakeDecoder, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow")


def media_resize(media: pa.Table, target_w: int = 64, target_h: int = 64,
                 concurrency: int = 2, batch_size: int = 64) -> ray.data.Dataset:
    ds = ray.data.from_arrow(media)
    return ds.map_batches(FakeResizer, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow",
                          fn_constructor_kwargs={"target_w": target_w,
                                                 "target_h": target_h})


def media_frames(media: pa.Table, n_frames: int = 4, frame_bytes: int = 256,
                 concurrency: int = 2, batch_size: int = 64) -> ray.data.Dataset:
    ds = ray.data.from_arrow(media)
    return ds.map_batches(FrameSampler, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow",
                          fn_constructor_kwargs={"n_frames": n_frames,
                                                 "frame_bytes": frame_bytes})
