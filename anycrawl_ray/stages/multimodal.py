"""Multimodal (image/audio/video) stages — real plumbing, stubbed codecs.

Media lives in documents as opaque ``binary`` payloads with typed metadata
(the reference stores screenshots as Buffers shipped to S3/KV —
reference packages/scrape/src/core/transformers/ScreenshotTransformer.ts:21-60;
OCR runs per unique image with bounded concurrency,
core/MarkdownOCR.ts:168-240, DataExtractor.ts:166-209).

The decode/resize/frame-sample kernels need image/audio libraries that are NOT
in this container, so each codec call is STUBBED: ``DETERMINISTIC_FAKE`` mode
derives byte-level features from a stable hash of the payload (fully testable
plumbing), and ``strict`` mode raises NotImplementedError where a real
libjpeg/ffmpeg call belongs. Everything Ray-side is real: schemas, actor-pool
``map_batches`` signature, small-batch sizing for fat binary rows, span-order
preservation for OCR injection.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),        # image | audio | video
        pa.field("payload", pa.binary()),     # opaque encoded bytes
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("feature", pa.list_(pa.float32(), FEATURE_DIM)),
        pa.field("decoded_ok", pa.bool_()),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: sha256 -> 16 floats in [0,1)."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
            / np.float32(65536.0))


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media batches.

    Use with small batches — binary rows are fat:
        ds.map_batches(MediaFeatureExtractor, concurrency=N, batch_size=32,
                       num_cpus=1, batch_format="pyarrow")
    """

    def __init__(self, mode: str = "fake"):
        # Real version: load libjpeg/ffmpeg handles HERE (once per actor),
        # never per batch.
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg (not in container)"
            )
        payloads = batch.column("payload").to_pylist()
        feats = [_fake_decode(p or b"") for p in payloads]
        return pa.Table.from_arrays(
            [
                batch.column("media_ref"),
                batch.column("kind"),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats) if feats else np.array([], np.float32)),
                    FEATURE_DIM,
                ),
                pa.array([p is not None for p in payloads]),
            ],
            schema=FEATURES_SCHEMA,
        )


class ImageResizer:
    """Image resize stub: clamps (width, height) to ``max_dim`` preserving
    aspect ratio and emits a size-proportional deterministic payload.

    Real version: PIL/libvips thumbnail HERE (handles loaded once per actor
    in __init__); the Ray-side contract — MEDIA_SCHEMA in, MEDIA_SCHEMA out,
    small batches for fat binary rows — is real and tested.
    """

    def __init__(self, max_dim: int = 256, mode: str = "fake"):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.max_dim = max_dim
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError("real image resize requires PIL/libvips")
        w = batch.column("width").to_numpy().astype(np.int64)
        h = batch.column("height").to_numpy().astype(np.int64)
        scale = np.minimum(1.0, self.max_dim / np.maximum(np.maximum(w, h), 1))
        nw = np.maximum((w * scale).astype(np.int32), 1)
        nh = np.maximum((h * scale).astype(np.int32), 1)
        payloads = batch.column("payload").to_pylist()
        resized = [
            hashlib.sha256((p or b"") + bytes([int(a) % 256, int(b) % 256])).digest()
            for p, a, b in zip(payloads, nw, nh)
        ]
        return pa.Table.from_arrays(
            [
                batch.column("media_ref"),
                batch.column("kind"),
                pa.array(resized, pa.binary()),
                pa.array(nw, pa.int32()),
                pa.array(nh, pa.int32()),
                batch.column("duration_ms"),
            ],
            schema=MEDIA_SCHEMA,
        )


class FrameSampler:
    """Video frame sampling stub: emits every k-th synthetic frame ref.

    Real version decodes container headers + keyframes; plumbing (flat_map
    shape: one input row -> n frame rows) is what matters here.
    """

    def __init__(self, every_ms: int = 1000, mode: str = "fake"):
        self.every_ms = every_ms
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError("real frame sampling requires ffmpeg")
        refs, kinds, frame_idx, ts = [], [], [], []
        for i in range(batch.num_rows):
            ref = batch.column("media_ref")[i].as_py()
            dur = batch.column("duration_ms")[i].as_py() or 0
            for k, t in enumerate(range(0, max(dur, 1), self.every_ms)):
                refs.append(f"{ref}#frame{k}")
                kinds.append("frame")
                frame_idx.append(k)
                ts.append(t)
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int32()),
            }
        )


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for tests/bench (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_ref": [f"img://synth/{i:05d}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(64 + int(rng.randint(0, 128))) for i in range(n)],
        "width": pa.array([int(rng.randint(16, 1920)) for _ in range(n)], pa.int32()),
        "height": pa.array([int(rng.randint(16, 1080)) for _ in range(n)], pa.int32()),
        "duration_ms": pa.array(
            [int(rng.randint(0, 10_000)) for _ in range(n)], pa.int32()
        ),
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
