"""Multimodal column plumbing: media spans as opaque binary + typed metadata.

The interleaved input schema (BASELINE.json input_hint) carries media
spans as ``(kind, media_ref)``; at pipeline scale the payload itself is
an opaque ``binary`` column with typed metadata.  The real codec
libraries (PIL/ffmpeg/librosa) are NOT in this container, so the decode
kernels are STUBS behind a clearly-marked strategy seam — the Ray-side
plumbing (schema, actor pool, batch sizing for wide binary rows, output
layout) is real and tested.

Stage shapes:
* ``fetch_media``   — media_ref -> payload bytes (deterministic fake
                      fetcher; a real one holds an object-store client
                      per actor)
* ``MediaDecoder``  — actor pool; per-kind decode -> feature vector +
                      metadata.  ``DeterministicFakeCodec`` hashes bytes
                      into a fixed-size feature (stable, testable);
                      ``RealCodec`` raises NotImplementedError naming
                      the missing dependency.
* ``sample_frames`` — video frame sampling layout: emits one row per
                      sampled frame index (flat_map shape) without
                      decoding.

Batch sizing: media rows are wide — default ``batch_size=32`` so a batch
x concurrency of payloads stays within worker heap (the guide's
memory-aware rule for large binary payloads).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 64


def media_refs_from_docs(docs):
    """interleaved docs -> one row per media span (doc_id, media_ref, kind)."""

    def body(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for span in spans or []:
                if span["kind"] != "text":
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_ref": span["media_ref"],
                            "kind": span["kind"],
                        }
                    )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_id", pa.string()), ("media_ref", pa.string()),
                 ("kind", pa.string())]
            ),
        )

    return docs.map_batches(body, batch_format="pyarrow")


class FakeFetcher:
    """media_ref -> deterministic pseudo-payload (stands in for an object
    store / blob client held once per actor)."""

    def __init__(self, payload_bytes: int = 4096):
        self.payload_bytes = payload_bytes

    def fetch(self, ref: str) -> bytes:
        seed = hashlib.blake2b(ref.encode(), digest_size=8).digest()
        reps = self.payload_bytes // 8 + 1
        return (seed * reps)[: self.payload_bytes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [self.fetch(r) for r in batch.column("media_ref").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "kind": batch.column("kind"),
                "payload": pa.array(payloads, type=pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
            },
            schema=MEDIA_SCHEMA,
        )


class DeterministicFakeCodec:
    """Stable stand-in decode: blake2b(payload) -> FEATURE_DIM float32."""

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM).digest()
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0)


class RealCodec:
    """Seam for the real thing — this container has no codec libraries."""

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"decoding kind={kind!r} requires PIL/ffmpeg/librosa, "
            "which are not installed in this environment; plug a codec "
            "implementing .decode(kind, payload) -> np.ndarray[FEATURE_DIM]"
        )


class MediaDecoder:
    """Actor-pool decode stage: codec constructed ONCE per actor."""

    def __init__(self, codec_cls=DeterministicFakeCodec):
        self.codec = codec_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.codec.decode(k, p)
            for k, p in zip(
                batch.column("kind").to_pylist(), batch.column("payload").to_pylist()
            )
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "kind": batch.column("kind"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats), type=pa.float32()), FEATURE_DIM
                )
                if feats
                else pa.array([], type=pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


def decode_media(media, codec_cls=DeterministicFakeCodec,
                 batch_size: int = 32, concurrency=(1, 4)):
    """Dataset[MEDIA_SCHEMA] -> Dataset[(doc_id, media_ref, kind, feature)].

    Small batch_size: payload batches are wide (binary), keep
    batch x concurrency within worker heap."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(codec_cls=codec_cls),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def fetch_media(refs, payload_bytes: int = 4096, batch_size: int = 64,
                concurrency=(1, 4)):
    return refs.map_batches(
        FakeFetcher,
        fn_constructor_kwargs=dict(payload_bytes=payload_bytes),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media, every_n_bytes: int = 1024, max_frames: int = 8):
    """Video 'frame sampling' layout: one row per sampled frame offset
    (decode itself is stubbed — the flat_map output shape is the point)."""

    def body(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, ref, kind, n in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("n_bytes").to_pylist(),
        ):
            if kind not in ("video", "image"):
                continue
            offsets = list(range(0, n, every_n_bytes))[:max_frames]
            for fi, off in enumerate(offsets):
                rows.append(
                    {"doc_id": doc_id, "media_ref": ref, "frame_index": fi,
                     "byte_offset": off}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_id", pa.string()), ("media_ref", pa.string()),
                 ("frame_index", pa.int32()), ("byte_offset", pa.int64())]
            ),
        )

    return media.map_batches(body, batch_format="pyarrow")
