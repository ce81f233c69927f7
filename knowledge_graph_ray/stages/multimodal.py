"""Multimodal column plumbing: media spans as opaque binary + typed metadata.

The interleaved input schema (BASELINE.json input_hint) carries media
spans as ``(kind, media_ref)``; at pipeline scale the payload itself is
an opaque ``binary`` column with typed metadata.  Decoding is REAL for
the dependency-free formats implemented here (24-bit BMP images via
struct+numpy, 16-bit PCM WAV audio via the stdlib ``wave`` module, and
the KGV1 framed video container), including real pixel/sample feature
extraction and real frame sampling.  Compressed formats (JPEG/MP4/...)
need external libraries absent from this container — ``RealCodec`` is
the clearly-marked seam that names the missing dependency.

Stage shapes:
* ``fetch_media`` / ``fetch_media_real`` — media_ref -> payload bytes
                      (``SyntheticMediaFetcher`` deterministically
                      renders real BMP/WAV/KGV1 payloads from the ref;
                      a production fetcher holds an object-store client
                      per actor)
* ``MediaDecoder``  — actor pool; per-kind decode -> feature vector +
                      metadata.  ``StdlibCodec`` decodes BMP/WAV/KGV1
                      payloads for real; ``DeterministicFakeCodec``
                      hashes bytes into a fixed-size feature (stable,
                      testable without payload rendering); ``RealCodec``
                      raises NotImplementedError naming the missing
                      dependency for compressed formats.
* ``sample_frames`` — video frame sampling: emits one row per sampled
                      frame index (flat_map shape); ``iter_video_frames``
                      walks real KGV1 frame boundaries without copying
                      the payload.

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


# ---------------------------------------------------------- real codecs
# Dependency-free REAL formats (no PIL/ffmpeg needed): uncompressed
# 24-bit BMP (struct + numpy), 16-bit mono WAV (stdlib wave), and a
# framed video container "KGV1" holding BMP frames.  These make the
# fetch -> decode -> feature path genuinely functional end-to-end;
# RealCodec stays the seam for compressed formats (JPEG/MP4/...).

import io
import struct
import wave as _wave


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(pixels[y][:, ::-1].tobytes() + pad)  # RGB -> BGR
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(got bpp={bpp}, compression={compression})")
    row_size = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, dtype=np.uint8, count=row_size * abs(h),
                        offset=offset)
    arr = arr.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """WAV bytes -> (float samples in [-1, 1], sample_rate)."""
    with _wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
        width = f.getsampwidth()
        channels = f.getnchannels()
    if width != 2:
        raise ValueError(f"only 16-bit WAV supported (got width={width})")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


VIDEO_MAGIC = b"KGV1"


def encode_video(frames: "list[bytes]") -> bytes:
    """BMP frame bytes -> framed container: magic, n, then (len, frame)*."""
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        parts.append(struct.pack("<I", len(fr)))
        parts.append(fr)
    return b"".join(parts)


def iter_video_frames(payload: bytes):
    """Yields (frame_index, byte_offset, frame_bytes) without copying the
    whole container — the frame-sampling access pattern."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a KGV1 video payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    off = 8
    for i in range(n):
        (flen,) = struct.unpack_from("<I", payload, off)
        yield i, off + 4, payload[off + 4 : off + 4 + flen]
        off += 4 + flen


def resize_image(pixels: "np.ndarray", height: int, width: int) -> "np.ndarray":
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


class SyntheticMediaFetcher(FakeFetcher):
    """media_ref -> REAL-format payload, deterministically generated from
    the ref (BMP image / WAV audio / KGV1 video of BMP frames).  Stands
    in for the blob-store client with content the stdlib codec can
    actually decode."""

    def __init__(self, image_size: int = 16, audio_samples: int = 800,
                 video_frames: int = 4):
        super().__init__()
        self.image_size = image_size
        self.audio_samples = audio_samples
        self.video_frames = video_frames

    def _rng(self, ref: str) -> "np.random.RandomState":
        seed = int.from_bytes(
            hashlib.blake2b(ref.encode(), digest_size=4).digest(), "big"
        )
        return np.random.RandomState(seed)

    def fetch_kind(self, ref: str, kind: str) -> bytes:
        rng = self._rng(ref)
        if kind == "image":
            px = rng.randint(0, 256, size=(self.image_size, self.image_size, 3),
                             dtype=np.uint8)
            return encode_bmp(px)
        if kind == "audio":
            t = np.arange(self.audio_samples)
            freq = 100 + rng.randint(0, 900)
            wave_f = 0.5 * np.sin(2 * np.pi * freq * t / 8000.0)
            return encode_wav((wave_f * 32767).astype(np.int16))
        if kind == "video":
            frames = [
                encode_bmp(rng.randint(0, 256,
                                       size=(self.image_size, self.image_size, 3),
                                       dtype=np.uint8))
                for _ in range(self.video_frames)
            ]
            return encode_video(frames)
        return super().fetch(ref)  # unknown kinds keep the opaque payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [
            self.fetch_kind(r, k)
            for r, k in zip(batch.column("media_ref").to_pylist(),
                            batch.column("kind").to_pylist())
        ]
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


class StdlibCodec:
    """Real decode + feature extraction for the stdlib formats.

    image: [h/256, w/256, mean RGB, std RGB, 8-bin histogram x 3] padded
    audio: [dur_s, rms, zero-crossing rate, 32 |FFT| bins] padded
    video: mean of per-frame image features
    All outputs are FEATURE_DIM float32.
    """

    def _image_features(self, px: "np.ndarray") -> "np.ndarray":
        h, w = px.shape[:2]
        f = [h / 256.0, w / 256.0]
        flat = px.reshape(-1, 3).astype(np.float64) / 255.0
        f.extend(flat.mean(axis=0))
        f.extend(flat.std(axis=0))
        for c in range(3):
            hist, _ = np.histogram(flat[:, c], bins=8, range=(0.0, 1.0))
            f.extend(hist / max(1, flat.shape[0]))
        return np.asarray(f, dtype=np.float32)

    def _audio_features(self, samples: "np.ndarray", rate: int) -> "np.ndarray":
        f = [len(samples) / rate,
             float(np.sqrt((samples ** 2).mean())) if len(samples) else 0.0,
             float((np.diff(np.signbit(samples)) != 0).mean()) if len(samples) > 1 else 0.0]
        spec = np.abs(np.fft.rfft(samples, n=64))[:32]
        denom = spec.max() or 1.0
        f.extend(spec / denom)
        return np.asarray(f, dtype=np.float32)

    def decode(self, kind: str, payload: bytes) -> "np.ndarray":
        if kind == "image":
            feats = self._image_features(decode_bmp(payload))
        elif kind == "audio":
            feats = self._audio_features(*decode_wav(payload))
        elif kind == "video":
            frame_feats = [
                self._image_features(decode_bmp(fb))
                for _i, _off, fb in iter_video_frames(payload)
            ]
            feats = (np.mean(frame_feats, axis=0) if frame_feats
                     else np.zeros(1, dtype=np.float32))
        else:
            # kinds with no stdlib format (e.g. 'table' spans) stay
            # opaque: stable hash features, same as the fake codec
            return DeterministicFakeCodec().decode(kind, payload)
        out = np.zeros(FEATURE_DIM, dtype=np.float32)
        out[: min(FEATURE_DIM, len(feats))] = feats[:FEATURE_DIM]
        return out


def sample_video_frames(media, every_n: int = 1, max_frames: int = 8):
    """REAL frame sampling for KGV1 payloads: one row per sampled frame
    with the decodable frame bytes (flat-map shape; non-video rows drop)."""

    def body(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, ref, kind, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video" or not payload or payload[:4] != VIDEO_MAGIC:
                continue
            taken = 0
            for i, off, fb in iter_video_frames(payload):
                if i % every_n:
                    continue
                rows.append({"doc_id": doc_id, "media_ref": ref,
                             "frame_index": i, "byte_offset": off,
                             "frame": fb})
                taken += 1
                if taken >= max_frames:
                    break
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_id", pa.string()), ("media_ref", pa.string()),
                 ("frame_index", pa.int32()), ("byte_offset", pa.int64()),
                 ("frame", pa.binary())]
            ),
        )

    return media.map_batches(body, batch_format="pyarrow", batch_size=32)


def fetch_media_real(refs, batch_size: int = 64, concurrency=(1, 4), **kwargs):
    """fetch_media variant producing real-format payloads (SyntheticMediaFetcher)."""
    return refs.map_batches(
        SyntheticMediaFetcher,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
