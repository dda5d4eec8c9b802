"""Multimodal plumbing: binary payload construction, mapInPandas batch
shape/schema, stubbed decode gating, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefusion_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text number {i} " * (i + 1), len(f"text number {i} " * (i + 1))) for i in range(12)]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_payload_is_binary_and_sized(docs):
    media = M.synthesize_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    rows = media.select("media_id", F.octet_length("payload").alias("n")).collect()
    by_id = {r["media_id"]: r["n"] for r in rows}
    n_chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert all(by_id[i] == 32 * (1 + n_chars[i] % 7) for i in by_id)


def test_map_in_pandas_features(docs):
    media = M.synthesize_media(docs)
    feats = M.extract_features(media, deterministic_fake=True).collect()
    assert len(feats) == 12
    # mean byte of repeat(md5hex) == mean ascii of the 32-char hex digest
    import hashlib

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in feats:
        hexd = hashlib.md5(texts[r["media_id"]].encode()).hexdigest()
        expected = sum(ord(c) for c in hexd) / 32.0
        assert abs(r["mean_byte"] - expected) < 1e-9


def test_real_decode_is_declared_stub():
    with pytest.raises(NotImplementedError, match="PIL|fake|BMP"):
        M.decode_image(b"xx", "png", deterministic_fake=False)


def test_bmp_decode_roundtrip():
    # Build a 4×4 24-bpp BMP by hand with known RGB pixels and verify the
    # pure-struct decoder recovers them (row order + BGR→RGB handled).
    import numpy as np

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    bgr_bottom_up = rgb[::-1][:, :, ::-1]  # stored bottom-up, BGR
    payload = M._bmp_header_4x4_24bpp() + bgr_bottom_up.tobytes()
    out = M.decode_image(payload, "bmp", deterministic_fake=False)
    assert out.shape == (4, 4, 3)
    assert (out == rgb).all()


def test_bmp_media_real_decode_path(docs):
    # synthesize_bmp_media payloads must decode for REAL through the same
    # mapInPandas path; pixel mean == mean of the 16 md5 digest bytes.
    import hashlib

    media = M.synthesize_bmp_media(docs)
    feats = M.extract_features(media, deterministic_fake=False).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 12
    for r in feats:
        assert r["size_bytes"] == 102
        digest = hashlib.md5(texts[r["media_id"]].encode()).digest()
        assert abs(r["mean_byte"] - sum(digest) / 16.0) < 1e-9


def test_frame_sampling(docs):
    media = M.synthesize_media(docs).where(F.col("kind") == "video")
    out = media.select(
        F.col("meta")["n_frames"].alias("n"),
        F.size(M.frame_sample_indices(F.col("meta"), 30)).alias("s"),
    ).collect()
    for r in out:
        expected = 0 if r["n"] <= 0 else (r["n"] - 1) // 30 + 1
        assert r["s"] == expected


def test_metadata_query_prunes_payload(docs):
    media = M.synthesize_media(docs)
    # A metadata-only aggregate must not read the payload column — check
    # column pruning in the analyzed plan (payload absent from the scan).
    plan = (
        media.groupBy("kind")
        .count()
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "payload" not in plan  # pruned: the binary column is never built/read


class TestWavDecode:
    def test_roundtrip_and_chunk_walk(self, spark):
        """decode_wav must parse the canonical layout AND skip unknown
        chunks (a general RIFF reader contract), including odd-sized
        chunks (word alignment)."""
        import struct

        import numpy as np

        from timefusion_spark.operators.multimodal import decode_wav

        samples = np.arange(-4, 4, dtype="<i2")
        data = samples.tobytes()
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        junk = b"LIST" + struct.pack("<I", 5) + b"junk\x00" + b"\x00"  # odd + pad
        body = fmt + junk + b"data" + struct.pack("<I", len(data)) + data
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        out, rate = decode_wav(payload)
        assert rate == 8000
        assert np.array_equal(out, samples)

    def test_rejects_non_wav_and_stereo(self, spark):
        import struct

        import pytest as _pt

        from timefusion_spark.operators.multimodal import decode_wav

        with _pt.raises(ValueError):
            decode_wav(b"notawave")
        stereo_fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        body = stereo_fmt + b"data" + struct.pack("<I", 0)
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        with _pt.raises(NotImplementedError):
            decode_wav(payload)


def test_extract_features_null_payload_yields_null_features(spark):
    """Review r11: MEDIA_SCHEMA declares payload nullable — a NULL
    payload must yield NULL features, not a len(None) TypeError inside
    the executor task."""
    from timefusion_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "image", "bmp", None), (2, "image", "bmp", bytearray(b"x"))],
        "media_id long, kind string, format string, payload binary",
    )
    got = {r.media_id: (r.size_bytes, r.mean_byte) for r in extract_features(media).collect()}
    assert got[1] == (None, None)


def test_audio_features_null_payload_yields_null_features(spark):
    """review r13: extract_audio_features crashed on NULL payloads
    (decode_wav(None) TypeError) where extract_features had the guard."""
    from timefusion_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    media = M.synthesize_wav_media(docs)
    rows = {r.media_id: r for r in M.extract_audio_features(media).collect()}
    assert rows[1].rms is not None and rows[1].n_samples > 0
    assert rows[2].rms is None and rows[2].n_samples is None
