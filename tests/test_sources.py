"""Custom Python DataSource (sources/eventgen.py): batch determinism,
partitioned generation, and the micro-batch streaming reader."""

from __future__ import annotations

import time

from timefusion_spark.sources import register_sources
from timefusion_spark.sources.eventgen import row_for


def test_batch_read_is_deterministic_and_partitioned(spark):
    register_sources(spark)
    df = spark.read.format("eventgen").option("n", 200).option("numPartitions", 4).load()
    rows = sorted(df.collect(), key=lambda r: r["event_id"])
    assert len(rows) == 200
    # worker-side generation matches the closed-form row function exactly
    for i in (0, 1, 99, 199):
        expect = row_for(i)
        got = rows[i]
        assert (got["event_id"], got["ts"], got["user_id"], got["event_type"]) == expect[:4]
        assert abs(got["value"] - expect[4]) == 0.0
    # re-read: identical (a connector must be re-scannable)
    again = sorted(df.collect(), key=lambda r: r["event_id"])
    assert rows == again


def test_stream_reader_delivers_all_rows_once(spark, tmp_path):
    register_sources(spark)
    stream = (
        spark.readStream.format("eventgen")
        .option("n", 400)
        .option("rowsPerBatch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(tmp_path / "out")).count() >= 400:
                    break
            except Exception:
                pass
            time.sleep(2)
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 400
    assert out.select("event_id").distinct().count() == 400  # no duplicates
