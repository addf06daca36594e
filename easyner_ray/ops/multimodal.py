"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
codec boundary is stubbed (SURVEY-mandated): :class:`StubCodec` produces a
deterministic fake decode keyed by the payload bytes, and a real codec slots
in behind the same interface. Everything Ray-side — schema, actor-pool
signature, small-batch sizing for large payloads, output layout — is real
and tested.

Canonical media schema:

    media(item_id:int64, kind:string, payload:binary,
          meta:string/*json*/)

Stages (all actor-pool ``map_batches`` with SMALL batch_size — a batch of
decoded media is memory-heavy, so batch_size x concurrency is the knob that
must fit the worker heap):

  * :func:`extract_features` — payload -> fixed-dim float feature vector
  * :func:`resize_images`    — payload -> payload' (re-encoded thumbnail)
  * :func:`sample_frames`    — video payload -> exploded frame rows
"""

from __future__ import annotations

import hashlib
import json
import zlib

import numpy as np
import pyarrow as pa

MEDIA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)

FEATURES = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32())),
    ]
)

FRAMES = pa.schema(
    [
        ("item_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class StubCodec:
    """Deterministic stand-in for the image/audio codec boundary.

    ``strict=True`` reproduces the no-libs-installed behavior
    (NotImplementedError) so callers must handle the gate explicitly.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg/librosa — not installed in "
                "this container; StubCodec(strict=False) provides the "
                "deterministic fake used by tests"
            )
        # fake decode: bytes -> seeded pseudo-signal, stable across runs
        seed = zlib.crc32(payload) & 0xFFFFFFFF
        rng = np.random.RandomState(seed)
        n = 256 if kind == "audio" else 16 * 16
        return rng.rand(n).astype(np.float32)

    def encode(self, signal: np.ndarray, kind: str) -> bytes:
        if self.strict:
            raise NotImplementedError("media encode requires codec libs")
        return hashlib.md5(signal.tobytes()).digest() + signal[:8].tobytes()


class StdlibCodec:
    """REAL decode for the formats the standard library can handle — proof
    the codec boundary is an interface, not a hand-wave:

      * WAV audio  (``wave`` module): PCM samples -> float32 in [-1, 1];
      * PPM images (binary ``P6``): RGB bytes -> float32 grayscale in
        [0, 1].

    Anything else falls through to :class:`StubCodec` (PIL/ffmpeg-class
    formats are not decodable in this container). Selection is by payload
    magic, not by the caller's claim."""

    def __init__(self):
        self._stub = StubCodec()

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        if payload[:2] == b"P6":
            return self._decode_ppm(payload)
        return self._stub.decode(payload, kind)

    @staticmethod
    def _decode_wav(payload: bytes) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            raw = w.readframes(w.getnframes())
            width = w.getsampwidth()
        if width == 2:
            sig = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 1:
            sig = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            sig = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        return sig

    @staticmethod
    def _decode_ppm(payload: bytes) -> np.ndarray:
        import re

        # P6 header: magic, width, height, maxval, then exactly ONE
        # whitespace byte before the raw RGB data (PPM spec) — bytes.split
        # would eat leading whitespace BYTES of the pixel data too
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
        w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
        pixels = np.frombuffer(payload[m.end(): m.end() + w * h * 3],
                               dtype=np.uint8)
        rgb = pixels.reshape(-1, 3).astype(np.float32) / float(maxval)
        return (0.299 * rgb[:, 0] + 0.587 * rgb[:, 1] + 0.114 * rgb[:, 2])

    def encode(self, signal: np.ndarray, kind: str) -> bytes:
        return self._stub.encode(signal, kind)


_CODECS = {"stub": StubCodec, "stdlib": StdlibCodec}


class FeatureExtractor:
    """Actor: codec + 'model' state built once; payload -> feature vector."""

    def __init__(self, dim: int = 32, strict: bool = False, codec: str = "stub"):
        self.codec = StubCodec(strict=strict) if codec == "stub" else _CODECS[codec]()
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        kinds = batch.column("kind").to_pylist()
        for payload, kind in zip(batch.column("payload").to_pylist(), kinds):
            sig = self.codec.decode(payload, kind)
            # fake embedding: fold the signal into `dim` bins (mean-pool)
            pad = (-len(sig)) % self.dim
            pooled = np.pad(sig, (0, pad)).reshape(self.dim, -1).mean(axis=1)
            feats.append(pooled.astype(np.float32))
        return pa.Table.from_arrays(
            [
                batch.column("item_id"),
                batch.column("kind"),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            ],
            schema=FEATURES,
        )


def extract_features(media, *, dim: int = 32, concurrency=(1, 4), batch_size: int = 32,
                     codec: str = "stub"):
    """media -> features. batch_size is deliberately SMALL: payloads are
    large binaries, and batch_size x concurrency bounds per-node heap.
    ``codec='stdlib'`` really decodes WAV/PPM payloads (see StdlibCodec)."""
    return media.map_batches(
        FeatureExtractor,
        fn_constructor_kwargs={"dim": dim, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    def __init__(self, size: int = 64, strict: bool = False):
        self.codec = StubCodec(strict=strict)
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, out_meta = [], []
        for payload, meta in zip(batch.column("payload").to_pylist(), batch.column("meta").to_pylist()):
            sig = self.codec.decode(payload, "image")
            thumb = sig[: self.size]
            out_payloads.append(self.codec.encode(thumb, "image"))
            m = json.loads(meta) if meta else {}
            m["resized_to"] = self.size
            out_meta.append(json.dumps(m, sort_keys=True))
        return pa.Table.from_arrays(
            [
                batch.column("item_id"),
                batch.column("kind"),
                pa.array(out_payloads, pa.binary()),
                pa.array(out_meta, pa.string()),
            ],
            schema=MEDIA,
        )


def resize_images(media, *, size: int = 64, concurrency=(1, 4), batch_size: int = 32):
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"size": size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video payload -> every Nth 'frame' (explode: 1 row -> k rows)."""

    def __init__(self, every: int = 8, strict: bool = False):
        self.codec = StubCodec(strict=strict)
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_idx, o_payload = [], [], []
        for item_id, payload in zip(batch.column("item_id").to_pylist(), batch.column("payload").to_pylist()):
            sig = self.codec.decode(payload, "video")
            frames = sig.reshape(16, -1)  # fake: 16 frames per clip
            for fi in range(0, len(frames), self.every):
                o_id.append(item_id)
                o_idx.append(fi)
                o_payload.append(self.codec.encode(frames[fi], "image"))
        return pa.Table.from_arrays(
            [
                pa.array(o_id, pa.int64()),
                pa.array(o_idx, pa.int32()),
                pa.array(o_payload, pa.binary()),
            ],
            schema=FRAMES,
        )


def sample_frames(media, *, every: int = 8, concurrency=(1, 4), batch_size: int = 16):
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media(n: int = 64, seed: int = 5):
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows_id, rows_kind, rows_payload, rows_meta = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(512 + (i % 7) * 128)
        rows_id.append(i)
        rows_kind.append(kind)
        rows_payload.append(payload)
        rows_meta.append(json.dumps({"kind": kind, "bytes": len(payload)}, sort_keys=True))
    return pa.Table.from_arrays(
        [
            pa.array(rows_id, pa.int64()),
            pa.array(rows_kind, pa.string()),
            pa.array(rows_payload, pa.binary()),
            pa.array(rows_meta, pa.string()),
        ],
        schema=MEDIA,
    )


def media_dedup(media, *, id_col: str = "item_id",
                payload_col: str = "payload", batch_size: int = 64):
    """Exact dedup over OPAQUE binary payloads — the multimodal analog
    of ``dedup.exact_dedup`` (reference scope stops at text; a 100 TB
    image/audio corpus dedups identical files before any decode):
    -> ``(item_id, n_copies, payload_bytes)``, the representative
    (min id) of every distinct payload with its copy count and size.

    Same two-phase shape as the text op: payloads reduce to their
    128-bit md5 inside the batch (the digest loop is C-bound on the
    payload bytes; only 16-byte digests ever leave the task), then one
    bucketed final over the digest keyspace. Small ``batch_size`` is
    the decoded-heap knob for multi-MB payloads, matching the
    ``extract_features`` actor contract."""
    from easyner_ray.ops.relational import bucketed_final

    def partial(t: pa.Table) -> pa.Table:
        payload = t.column(payload_col).combine_chunks()
        digest = pa.array(
            [hashlib.md5(v).hexdigest() if v is not None else ""
             for v in payload.to_pylist()], pa.string())
        nbytes = pa.array(
            [len(v) if v is not None else 0
             for v in payload.to_pylist()], pa.int64())
        g = pa.Table.from_arrays(
            [digest, t.column(id_col), nbytes],
            names=["digest", id_col, "payload_bytes"])
        return g.group_by("digest").aggregate(
            [(id_col, "min"), (id_col, "count"), ("payload_bytes", "min")]
        ).rename_columns(["digest", "__id", "__n", "__b"])

    agg = bucketed_final(
        media.map_batches(partial, batch_format="pyarrow",
                          batch_size=batch_size),
        ["digest"],
        pa_aggs=[("__id", "min"), ("__n", "sum"), ("__b", "min")],
        out_names=[id_col, "n_copies", "payload_bytes"])
    return agg.select_columns([id_col, "n_copies", "payload_bytes"])
