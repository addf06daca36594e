"""Text-analysis + multimodal + relational operator tests."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def test_doc_stats_known_values(ray_session):
    from easyner_ray.ops.textstats import doc_stats

    out = doc_stats(_docs_ds(["Hello, world! 42"])).to_pandas().iloc[0]
    assert out["n_chars"] == 16
    assert out["n_tokens"] == 3
    assert out["n_alpha"] == 10
    import hashlib

    assert out["fingerprint"] == hashlib.md5(b"Hello, world! 42").hexdigest()


def test_quality_ratios(ray_session):
    from easyner_ray.ops.textstats import quality_scores

    out = quality_scores(_docs_ds(["the cat RAN far."])).to_pandas().iloc[0]
    assert out["stopword_ratio"] == pytest.approx(1 / 4)   # 'the' of 4 tokens
    assert out["caps_token_ratio"] == pytest.approx(1 / 4)  # 'RAN'
    assert out["punct_ratio"] == pytest.approx(1 / 16)      # '.' of 16 chars


def test_lang_id_separates_en_de(ray_session):
    from easyner_ray.ops.textstats import lang_id

    en = ("the quick brown fox jumps over the lazy dog and this is a test "
          "of the language identifier that should be quite sure about it")
    de = ("der schnelle braune fuchs springt über den faulen hund und das "
          "ist ein test der sprachen erkennung die sich sicher sein sollte")
    out = lang_id(_docs_ds([en, de])).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de"]


def test_rolling_fingerprint_order_sensitive(ray_session):
    from easyner_ray.ops.textstats import rolling_fingerprint

    assert rolling_fingerprint(["a", "b"]) != rolling_fingerprint(["b", "a"])
    assert rolling_fingerprint(["a", "b"]) == rolling_fingerprint(["a", "b"])


# ----------------------------------------------------------- multimodal ----


def test_media_feature_extraction(ray_session):
    import ray.data as rd

    from easyner_ray.ops.multimodal import extract_features, synthetic_media

    media = rd.from_arrow(synthetic_media(12))
    out = extract_features(media, dim=32).to_pandas()
    assert len(out) == 12
    assert all(len(f) == 32 for f in out["feature"])
    # determinism: same payload -> same feature
    out2 = extract_features(rd.from_arrow(synthetic_media(12)), dim=32).to_pandas()
    a = np.vstack(out.sort_values("item_id")["feature"].to_numpy())
    b = np.vstack(out2.sort_values("item_id")["feature"].to_numpy())
    assert np.array_equal(a, b)


def test_media_frame_sampling_explodes(ray_session):
    import ray.data as rd

    from easyner_ray.ops.multimodal import sample_frames, synthetic_media

    media = rd.from_arrow(synthetic_media(9))
    out = sample_frames(media, every=8).to_pandas()
    # fake codec: 16 frames/clip, every 8th -> 2 rows per item
    assert len(out) == 18
    assert set(out["frame_idx"]) == {0, 8}


def test_media_resize_updates_meta(ray_session):
    import ray.data as rd

    from easyner_ray.ops.multimodal import resize_images, synthetic_media

    out = resize_images(rd.from_arrow(synthetic_media(6)), size=16).to_pandas()
    assert all(json.loads(m)["resized_to"] == 16 for m in out["meta"])


def test_strict_codec_gates():
    from easyner_ray.ops.multimodal import StubCodec

    with pytest.raises(NotImplementedError):
        StubCodec(strict=True).decode(b"xx", "image")


# ------------------------------------------------------------ relational ---


def test_broadcast_join_inner_and_left(ray_session):
    import ray.data as rd

    from easyner_ray.ops.relational import broadcast_join

    big = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}))
    small = pa.table({"k2": [1, 3], "name": ["one", "three"]})
    inner = broadcast_join(big, small, on="k", right_key="k2",
                           value_cols=["name"]).to_pandas().sort_values("k")
    assert inner["k"].tolist() == [1, 3]
    left = broadcast_join(big, small, on="k", right_key="k2",
                          value_cols=["name"], how="left").to_pandas().sort_values("k")
    assert left["name"].isna().sum() == 2


def test_semi_join_filter(ray_session):
    import ray.data as rd

    from easyner_ray.ops.relational import semi_join_filter

    ds = rd.from_arrow(pa.table({"k": list(range(10))}))
    out = semi_join_filter(ds, {2, 5, 7}, on="k").to_pandas()
    assert sorted(out["k"]) == [2, 5, 7]


def test_grouped_agg_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from easyner_ray.ops.relational import grouped_agg

    rng = np.random.RandomState(0)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 1000),
        "x": rng.rand(1000),
    })
    out = grouped_agg(
        rd.from_pandas(df), ["g"],
        [("x", "sum", "sx"), ("x", "mean", "mx"), ("x", "count", "n"),
         ("x", "min", "mn"), ("x", "max", "mxx")],
    ).to_pandas().sort_values("g").reset_index(drop=True)
    ref = df.groupby("g")["x"].agg(["sum", "mean", "count", "min", "max"]).reset_index()
    assert np.allclose(out["sx"], ref["sum"])
    assert np.allclose(out["mx"], ref["mean"])
    assert out["n"].tolist() == ref["count"].tolist()
    assert np.allclose(out["mn"], ref["min"]) and np.allclose(out["mxx"], ref["max"])


def test_media_features_feed_similarity_search(ray_session):
    """Integration: multimodal feature extraction output plugs directly
    into the ANN operator (schema compatibility media -> embeddings)."""
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.ops.multimodal import extract_features, synthetic_media
    from easyner_ray.ops.similarity import knn_brute

    media = rd.from_arrow(synthetic_media(48))
    feats = extract_features(media, dim=16).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("item_id"), t.column("feature")], names=["vec_id", "embedding"]
        ),
        batch_format="pyarrow",
    )
    q = np.vstack(feats.limit(2).to_pandas()["embedding"].to_numpy())
    out = knn_brute(feats, q.astype("float64"), k=3).to_pandas()
    top1 = out[out["rank"] == 1].sort_values("query_id")
    assert top1["vec_id"].tolist() == [0, 1]  # self-match at rank 1


def test_stdlib_codec_real_wav_and_ppm(ray_session):
    """The codec boundary accepts REAL payloads: a PCM WAV sine decodes to
    its actual samples (RMS ~ 1/sqrt(2)), a P6 PPM decodes to grayscale,
    and unknown formats fall through to the stub."""
    import io
    import json
    import wave

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from easyner_ray.ops.multimodal import MEDIA, StdlibCodec, extract_features

    # real 16-bit WAV: one second of a 440 Hz sine at 8 kHz
    t = np.arange(8000) / 8000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(sine.tobytes())
    wav_bytes = buf.getvalue()

    # real P6 PPM: 4x2 image, red row + white row
    ppm = b"P6\n4 2\n255\n" + (b"\xff\x00\x00" * 4) + (b"\xff\xff\xff" * 4)

    codec = StdlibCodec()
    sig = codec.decode(wav_bytes, "audio")
    assert len(sig) == 8000
    assert abs(float(np.sqrt((sig ** 2).mean())) - 1 / np.sqrt(2)) < 0.01

    img = codec.decode(ppm, "image")
    assert len(img) == 8
    assert abs(img[0] - 0.299) < 1e-6        # red pixel grayscale
    assert abs(img[4] - 1.0) < 1e-6          # white pixel

    # unknown payloads fall back to the deterministic stub
    fake = codec.decode(b"not-a-known-format", "image")
    assert len(fake) == 256

    # and the Ray stage runs end-to-end on real payloads
    media = pa.Table.from_arrays(
        [pa.array([0, 1], pa.int64()),
         pa.array(["audio", "image"], pa.string()),
         pa.array([wav_bytes, ppm], pa.binary()),
         pa.array([json.dumps({}), json.dumps({})], pa.string())],
        schema=MEDIA,
    )
    feats = extract_features(rd.from_arrow(media), dim=8, codec="stdlib").to_pandas()
    assert len(feats) == 2
    assert all(len(f) == 8 for f in feats.feature)
