"""Multimodal-column queries: binary payload histograms (pure JVM) and the
Arrow-batched mapInPandas feature-extraction path, both oracle-checked via
the deterministic payload construction (operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.operators import multimodal as M
from timefusion_spark.queries._tables import t
from timefusion_spark.registry import query

# payload = UTF-8(repeat(md5_hex(text), 1 + n_chars % 7)) — oracle mirror.
_PAYLOAD_LEN = "32 * (1 + n_chars % 7)"
_KIND = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"


@query(
    "q_media_size_histogram",
    oracle=f"""
    SELECT {_KIND} AS kind,
           COUNT(*) AS n,
           CAST(SUM({_PAYLOAD_LEN}) AS BIGINT) AS total_bytes,
           ROUND(AVG({_PAYLOAD_LEN}), 4) AS avg_bytes,
           CAST(MAX({_PAYLOAD_LEN}) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1
    ORDER BY kind
    """,
    doc="Size/type histogram over an opaque BINARY media column — pure "
    "expression metadata query; the payload chunk is never decoded "
    "(parquet column pruning keeps it unread when unselected).",
)
def q_media_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(t(spark, sf_dir, "documents"))
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
            F.max(F.octet_length("payload")).cast("bigint").alias("max_bytes"),
        )
        .orderBy("kind")
    )


@query(
    "q_media_features_pandas",
    oracle=f"""
    WITH f AS (
        SELECT doc_id AS media_id, {_KIND} AS kind,
               {_PAYLOAD_LEN} AS size_bytes,
               list_avg(list_transform(range(1, 33), i -> ascii(md5(text)[i]))) AS mean_byte
        FROM documents
    )
    SELECT kind,
           CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
           ROUND(AVG(mean_byte), 4) AS avg_mean_byte
    FROM f
    GROUP BY kind
    ORDER BY kind
    """,
    doc="Arrow-batched mapInPandas decode/feature path over the binary "
    "column (deterministic-fake decode — real codecs are a declared stub): "
    "proves the Python batch plumbing end-to-end, values oracle-matched "
    "(mean byte of repeat(md5_hex) == mean ascii of the 32 hex chars).",
)
def q_media_features_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(t(spark, sf_dir, "documents"))
    feats = M.extract_features(media, deterministic_fake=True)
    return (
        feats.groupBy("kind")
        .agg(
            F.sum("size_bytes").alias("total_bytes"),
            F.round(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
        )
        .orderBy("kind")
    )


@query(
    "q_media_bmp_decode",
    oracle="""
    WITH f AS (
        SELECT doc_id AS media_id,
               list_avg(list_transform(range(0, 16), i ->
                   (strpos('0123456789abcdef', substr(md5(text), 2*i+1, 1)) - 1) * 16
                   + strpos('0123456789abcdef', substr(md5(text), 2*i+2, 1)) - 1)) AS mean_byte
        FROM documents
    )
    SELECT CAST(COUNT(mean_byte) AS BIGINT) AS n_decoded,
           CAST(COUNT(mean_byte) * 102 AS BIGINT) AS total_bytes,
           ROUND(AVG(mean_byte), 4) AS avg_mean_pixel
    FROM f
    """,
    doc="REAL image decode (deterministic_fake=False): every payload is a "
    "valid 4×4 24-bpp BMP (constant header ++ unhex(repeat(md5,3)) pixel "
    "bytes, built JVM-side), decoded by pure-struct BMP parsing inside the "
    "Arrow-batched mapInPandas path (operators/multimodal.py::decode_bmp). "
    "Oracle: pixel mean == mean of the 16 md5 digest bytes; file size is "
    "the fixed 54-byte header + 48 pixel bytes.",
)
def q_media_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_bmp_media(t(spark, sf_dir, "documents"))
    feats = M.extract_features(media, deterministic_fake=False)
    # count DECODED rows (NULL-payload docs carry NULL features), so
    # n_decoded means what it says and total_bytes matches the SUM's
    # NULL-skip on both engines (review r13)
    return feats.agg(
        F.count("mean_byte").alias("n_decoded"),
        F.sum("size_bytes").alias("total_bytes"),
        F.round(F.avg("mean_byte"), 4).alias("avg_mean_pixel"),
    )


@query(
    "q_media_frame_sampling",
    oracle="""
    SELECT CAST(SUM(CASE WHEN n_frames > 0
                         THEN CAST(floor((n_frames - 1) / 30) AS BIGINT) + 1
                         ELSE 0 END) AS BIGINT) AS total_sampled_frames,
           COUNT(*) AS n_videos
    FROM (
        SELECT n_chars % 300 AS n_frames
        FROM documents WHERE doc_id % 3 = 2
    ) v
    """,
    doc="Video frame-sampling plan: every-30th frame indices from typed "
    "metadata as a pure sequence expression; the per-frame decode slots "
    "into the same mapInPandas batch shape.",
)
def q_media_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(t(spark, sf_dir, "documents"))
    videos = media.where(F.col("kind") == "video")
    return videos.select(
        F.size(M.frame_sample_indices(F.col("meta"), 30)).alias("_n")
    ).agg(
        F.sum("_n").alias("total_sampled_frames"),
        F.count(F.lit(1)).alias("n_videos"),
    )


@query(
    "q_media_wav_decode",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_transform(range(0, 16), j ->
                   CAST('0x' || substr(md5(text), 2*j + 1, 2) AS BIGINT)) AS b
        FROM documents
    ), v AS (
        SELECT doc_id,
               list_transform(range(0, 32), i ->
                   CASE WHEN b[(2*i) % 16 + 1] + 256 * b[(2*i + 1) % 16 + 1] >= 32768
                        THEN b[(2*i) % 16 + 1] + 256 * b[(2*i + 1) % 16 + 1] - 65536
                        ELSE b[(2*i) % 16 + 1] + 256 * b[(2*i + 1) % 16 + 1] END) AS s
        FROM d
    )
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS n_samples,
           CAST(16000 AS INT) AS sample_rate,
           CAST(2.0 AS DOUBLE) AS duration_ms,
           ROUND(sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE) / 32), 4)
               AS rms
    FROM v
    ORDER BY media_id
    """,
    doc="REAL audio decode: every payload is a valid RIFF/WAVE file (32 "
    "mono int16 PCM samples at 16 kHz; constant header ++ "
    "unhex(repeat(md5,4)) data bytes, built JVM-side), chunk-walked and "
    "decoded by pure struct parsing inside the Arrow-batched mapInPandas "
    "path (operators/multimodal.py::decode_wav). RMS sums squared int16 "
    "samples in exact int64 before one float divide + sqrt, so the "
    "little-endian byte-pair oracle reproduces it bit-for-bit.",
)
def q_media_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_wav_media(t(spark, sf_dir, "documents"))
    feats = M.extract_audio_features(media)
    return feats.select(
        "media_id",
        "n_samples",
        "sample_rate",
        "duration_ms",
        F.round("rms", 4).alias("rms"),
    ).orderBy("media_id")
