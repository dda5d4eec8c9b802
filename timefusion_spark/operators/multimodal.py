"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction as Arrow-batched Pandas UDF pipelines.

Design (north-star LLM-pipeline brief):
- media rows are (media_id, kind, payload BINARY, meta struct, format) —
  the payload is opaque to the engine; everything relational (size/type
  histograms, metadata filters, partition pruning) is pure JVM expression
  over the binary column and the typed metadata.
- decode / feature-extract runs in `mapInPandas` (Arrow batch transfer,
  one pandas DataFrame per partition chunk — never row-at-a-time Python).
  The actual image/audio codecs are NOT in this environment, so
  `decode_image` raises NotImplementedError unless the deterministic-fake
  mode is chosen; the fake derives pixel statistics from the payload
  bytes, which keeps the whole Pandas-UDF path REAL (schema, batching,
  Arrow round-trip) and oracle-checkable.
- at 100 TB: payloads live in their own column chunk, so metadata-only
  queries never read them (parquet column pruning); feature extraction
  parallelizes per partition with no shuffle; repartition by kind only
  when codec working-set size differs wildly per kind.

Synthetic payload construction is shared with the DuckDB oracle: payload =
UTF-8 bytes of repeat(md5_hex(text), 1 + n_chars % 7), so octet lengths
and byte statistics are reproducible in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        # One flat typed metadata struct covering all kinds (absent fields
        # NULL) — mirrors the flattened-column convention (SURVEY §1.2).
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("fps", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents`: payload bytes are
    repeat(md5_hex(text), 1 + n_chars % 7) — opaque to the engine, exactly
    reproducible by the oracle."""
    k = (F.lit(1) + F.col("n_chars") % 7).cast("int")
    kind = F.element_at(
        F.array(*[F.lit(x) for x in KINDS]), (F.col("doc_id") % 3).cast("int") + 1
    )
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")), (F.col("doc_id") % 3).cast("int") + 1
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        fmt.alias("format"),
        F.encode(F.repeat(F.md5("text"), k), "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit(30).alias("fps"),
            (F.col("n_chars") % 300).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _bmp_header_4x4_24bpp() -> bytes:
    """54-byte header of a 4×4 uncompressed 24-bpp BMP (pixel data = 48
    bytes, stride 12 — already 4-byte aligned, so no row padding)."""
    import struct

    return (
        b"BM"
        + struct.pack("<IHHI", 54 + 48, 0, 0, 54)  # file size, reserved, data offset
        + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 48, 2835, 2835, 0, 0)
    )


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """REAL media payloads: every row is a valid 4×4 24-bpp BMP whose 48
    pixel bytes are unhex(repeat(md5_hex(text), 3)) — built entirely with
    JVM expressions (constant header ++ unhex), decodable by `decode_bmp`,
    and byte-reproducible by the DuckDB oracle (pixel mean == mean of the
    16 md5 digest bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("bmp").alias("format"),
        F.concat(
            F.lit(_bmp_header_4x4_24bpp()), F.unhex(F.repeat(F.md5("text"), 3))
        ).alias("payload"),
        F.struct(
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("fps"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fmt: str, deterministic_fake: bool = False):
    """Decode an image payload to a pixel array.

    BMP (uncompressed 24-bpp, the format `synthesize_bmp_media` emits) is
    decoded for real — pure struct parsing of the BITMAPFILEHEADER /
    BITMAPINFOHEADER, no codec library — returning an (h, w, 3) uint8 RGB
    array. Other formats (PNG/JPEG/WAV/MP4) need codec libraries that are
    not installed here; that branch stays a declared stub. The
    deterministic fake treats the payload bytes as the 'pixels', which
    exercises every downstream code path with reproducible numbers."""
    if deterministic_fake:
        import numpy as np

        return np.frombuffer(payload, dtype=np.uint8)
    if fmt == "bmp" or payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            f"decode of format {fmt!r} requires PIL/OpenCV (not in this "
            "environment); BMP decodes natively, or pass "
            "deterministic_fake=True for the stubbed decode"
        ) from e
    raise NotImplementedError("non-BMP decode path not implemented")


def decode_bmp(payload: bytes):
    """Real decode of an uncompressed 24-bpp Windows BMP (BITMAPINFOHEADER)
    to an (h, w, 3) uint8 RGB array — pure struct parsing, no codec deps.

    Layout (public format): 14-byte file header ('BM', u32 file size, 4
    reserved, u32 pixel-data offset) + 40-byte info header (u32 size,
    i32 width, i32 height [positive ⇒ bottom-up row order], u16 planes,
    u16 bpp, u32 compression). Rows are padded to 4-byte multiples and
    pixels are stored BGR."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bpp BMP supported (bpp={bpp})")
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = data.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas: per batch, 'decode' each payload and emit
    (media_id, kind, size_bytes, mean_byte).

    Plan shape: scan → mapInPandas (no shuffle) — extraction is
    embarrassingly parallel per partition; payload bytes only cross into
    Python as Arrow buffers, batch-at-a-time."""

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            # MEDIA_SCHEMA declares payload nullable (synthesize_media
            # emits NULL for NULL text): a NULL payload yields NULL
            # features instead of a len(None) TypeError deep inside the
            # executor task (review r11)
            decoded = [
                None
                if p is None
                else decode_image(p, f, deterministic_fake=deterministic_fake)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "size_bytes": [
                        None if p is None else len(p) for p in pdf["payload"]
                    ],
                    "mean_byte": [
                        None if d is None else float(d.mean()) for d in decoded
                    ],
                }
            )

    return media.select("media_id", "kind", "format", "payload").mapInPandas(
        _batches, FEATURE_SCHEMA
    )


def frame_sample_indices(meta: "F.Column", every_n: int = 30) -> "F.Column":
    """Frame-sampling plan for video rows: indices [0, every_n, 2·every_n,
    …) below meta.n_frames — pure expression; the per-frame decode slots
    into the same mapInPandas shape as extract_features."""
    n = F.coalesce(meta["n_frames"], F.lit(0))
    return F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n))).otherwise(
        F.array().cast("array<int>")
    )


def _wav_header_32x16k() -> bytes:
    """44-byte canonical RIFF/WAVE header for 32 mono 16-bit PCM samples at
    16 kHz (data chunk = 64 bytes). Public format: RIFF size = 36 + data,
    fmt chunk (PCM=1, channels, rate, byte rate, block align, bits),
    then the data chunk header."""
    import struct

    n_bytes = 64
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_bytes)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data"
        + struct.pack("<I", n_bytes)
    )


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """REAL audio payloads: every row is a valid RIFF/WAVE file of 32 mono
    int16 samples whose 64 data bytes are unhex(repeat(md5_hex(text), 4))
    — constant header ++ unhex, all JVM expressions, decodable by
    `decode_wav` and byte-reproducible by a SQL oracle (sample i is the
    little-endian pair of digest bytes (2i mod 16, (2i+1) mod 16))."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("wav").alias("format"),
        F.concat(
            F.lit(_wav_header_32x16k()), F.unhex(F.repeat(F.md5("text"), 4))
        ).alias("payload"),
    )


def decode_wav(payload: bytes):
    """Real decode of a RIFF/WAVE file with 16-bit PCM mono samples —
    pure struct parsing, no codec deps. Walks the chunk list (a general
    reader must skip unknown chunks to find 'fmt ' and 'data'). Returns
    (samples int16 ndarray, sample_rate)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only mono 16-bit PCM supported (fmt={fmt_code}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_samples int, sample_rate int, duration_ms double, rms double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode via mapInPandas: parse each WAV,
    emit (media_id, n_samples, sample_rate, duration_ms, rms). The RMS
    sums squared int16 samples in exact int64 before one float divide +
    sqrt, so a SQL oracle reproduces it bit-for-bit. Scan → mapInPandas,
    no shuffle."""
    from typing import Iterator

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                # NULL payload (synthesize emits NULL for NULL text) →
                # NULL features, not a TypeError in the executor task —
                # the same guard extract_features carries (review r13)
                if p is None:
                    rows.append((mid, None, None, None, None))
                    continue
                samples, rate = decode_wav(p)
                sq = int((samples.astype("int64") ** 2).sum())
                n = len(samples)
                rows.append(
                    (
                        mid,
                        n,
                        rate,
                        n * 1000.0 / rate,
                        math.sqrt(sq / n) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "sample_rate", "duration_ms", "rms"],
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, AUDIO_FEATURE_SCHEMA
    )
