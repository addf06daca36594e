"""Deterministic media fixture with REAL decodable payloads — WAV (PCM
int16 via the stdlib ``wave`` module) and PPM (binary P6), alternating.

This is INPUT generation (like sources.synthetic), shared by the engine's
``media_features`` query and the straight-line gold recompute
(sources.gold_derived.write_media_features_gold) — both read the same
parquet fixture, neither imports the other's compute. Pure numpy+stdlib,
no engine imports, so the gold module can depend on it without touching
engine stages.
"""

from __future__ import annotations

import io
import json
import os
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# the canonical media schema (duplicated from ops.multimodal.MEDIA on
# purpose — this module must stay engine-import-free)
MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)


def synthetic_real_media(n: int = 48, seed: int = 17) -> pa.Table:
    """media(item_id, kind, payload, meta): even rows WAV audio, odd rows
    PPM images — every payload decodable by a stdlib codec."""
    rng = np.random.RandomState(seed)
    rows_id, rows_kind, rows_payload, rows_meta = [], [], [], []
    for i in range(n):
        if i % 2 == 0:
            nsamp = 400 + (i % 5) * 64
            sig = (rng.randn(nsamp) * 8000).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(sig.tobytes())
            payload, kind = buf.getvalue(), "audio"
            meta = {"codec": "wav", "samples": nsamp}
        else:
            w_px, h_px = 8 + (i % 3) * 4, 8
            pixels = rng.randint(0, 256, size=w_px * h_px * 3,
                                 dtype=np.int64).astype(np.uint8)
            payload = (f"P6\n{w_px} {h_px}\n255\n".encode()
                       + pixels.tobytes())
            kind = "image"
            meta = {"codec": "ppm", "w": w_px, "h": h_px}
        rows_id.append(i)
        rows_kind.append(kind)
        rows_payload.append(payload)
        rows_meta.append(json.dumps(meta, sort_keys=True))
    return pa.Table.from_arrays(
        [pa.array(rows_id, pa.int64()), pa.array(rows_kind, pa.string()),
         pa.array(rows_payload, pa.binary()),
         pa.array(rows_meta, pa.string())],
        schema=MEDIA_SCHEMA)


def ensure_media_fixture(corpus: str, n: int = 48, seed: int = 17) -> str:
    """Idempotently write the fixture under ``corpus`` (the derived-gold
    file-existence-gate convention)."""
    path = os.path.join(corpus, "media.parquet")
    if not os.path.exists(path):
        pq.write_table(synthetic_real_media(n, seed), path)
    return path
