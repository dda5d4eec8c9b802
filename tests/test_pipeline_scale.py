"""Training-pipeline scale operators: interval join (plan shape +
brute-force parity), sequence packing, connected components."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timefusion_spark.operators.graph import connected_components
from timefusion_spark.operators.interval_join import interval_join
from timefusion_spark.operators.packing import pack_concat_chunks


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


class TestIntervalJoin:
    def _inputs(self, spark):
        points = spark.createDataFrame(
            [(i, _ts(i)) for i in range(0, 240, 7)], "pid long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [
                (100, _ts(10), _ts(40)),
                (200, _ts(35), _ts(65)),  # overlaps the first
                (300, _ts(230), _ts(260)),  # runs past the last point
                (400, _ts(300), _ts(330)),  # matches nothing
            ],
            "iid long, start_ts timestamp, end_ts timestamp",
        )
        return points, intervals

    def test_matches_bruteforce(self, spark):
        points, intervals = self._inputs(spark)
        got = sorted(
            (r.pid, r.iid)
            for r in interval_join(
                points, intervals, bucket_width_s=1800
            ).collect()
        )
        want = sorted(
            (r.pid, r.iid)
            for r in points.crossJoin(intervals)
            .where((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
            .collect()
        )
        assert got == want and len(got) > 0

    def test_narrow_buckets_still_correct(self, spark):
        # width << interval length: intervals explode into many buckets,
        # results must not change (each point still owns one bucket).
        points, intervals = self._inputs(spark)
        wide = sorted(
            (r.pid, r.iid)
            for r in interval_join(points, intervals, bucket_width_s=1800).collect()
        )
        narrow = sorted(
            (r.pid, r.iid)
            for r in interval_join(points, intervals, bucket_width_s=120).collect()
        )
        assert wide == narrow

    def test_plan_is_equi_join(self, spark):
        """The whole point: the physical plan must be a hash/merge join on
        the bucket key, never a nested-loop/cartesian product."""
        points, intervals = self._inputs(spark)
        plan = (
            interval_join(points, intervals, bucket_width_s=1800)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestPackConcatChunks:
    def test_chunk_assignment(self, spark):
        # budget 10; sizes 4,4,4 -> doc3 starts in chunk 0 (token 9) and
        # straddles into chunk 1; 7,5 in group b -> doc2 straddles.
        df = spark.createDataFrame(
            [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("b", 1, 7), ("b", 2, 5)],
            "g string, i long, n long",
        )
        out = {
            (r.g, r.i): (r.chunk_id, r.chunk_last, r.chunks_spanned)
            for r in pack_concat_chunks(df, "g", "i", "n", budget=10).collect()
        }
        assert out[("a", 1)] == (0, 0, 1)
        assert out[("a", 2)] == (0, 0, 1)
        assert out[("a", 3)] == (0, 1, 2)  # tokens 9..12 straddle
        assert out[("b", 1)] == (0, 0, 1)
        assert out[("b", 2)] == (0, 1, 2)  # tokens 8..12 straddle

    def test_exact_budget_boundary(self, spark):
        # a doc ENDING exactly at the boundary stays in its chunk; the
        # next doc starts the next chunk.
        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 3)], "g string, i long, n long"
        )
        out = {
            (r.g, r.i): (r.chunk_id, r.chunk_last)
            for r in pack_concat_chunks(df, "g", "i", "n", budget=10).collect()
        }
        assert out[("a", 1)] == (0, 0)
        assert out[("a", 2)] == (1, 1)


class TestConnectedComponents:
    def test_known_graph(self, spark):
        # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star)
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
            "src long, dst long",
        )
        got = {
            r.n: r.component for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_chain_needs_iterations(self, spark):
        # a 9-node chain: diameter 8, exercises multi-round convergence.
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 9)], "src long, dst long"
        )
        got = {r.n: r.component for r in connected_components(edges).collect()}
        assert got == {i: 1 for i in range(1, 10)}


class TestChunkWithOverlap:
    def test_windows_and_overlap(self, spark):
        from timefusion_spark.operators.packing import chunk_with_overlap

        words = " ".join(f"w{i}" for i in range(50))
        df = spark.createDataFrame([(1, words)], "id long, text string").withColumn(
            "_toks", F.split(F.col("text"), r"\s+")
        )
        out = (
            chunk_with_overlap(df, F.col("_toks"), size=20, stride=15)
            .select("chunk_index", "chunk_tokens")
            .collect()
        )
        # 50 tokens, size 20, stride 15 → ceil((50-20)/15)+1 = 3 chunks
        assert [r["chunk_index"] for r in out] == [0, 1, 2]
        assert out[0]["chunk_tokens"][0] == "w0" and out[0]["chunk_tokens"][-1] == "w19"
        assert out[1]["chunk_tokens"][0] == "w15"  # 5-token overlap
        assert out[2]["chunk_tokens"] == [f"w{i}" for i in range(30, 50)]  # short tail

    def test_short_doc_single_chunk(self, spark):
        from timefusion_spark.operators.packing import chunk_with_overlap

        df = spark.createDataFrame([(1, "a b c")], "id long, text string").withColumn(
            "_toks", F.split(F.col("text"), r"\s+")
        )
        out = chunk_with_overlap(df, F.col("_toks"), size=20, stride=15).collect()
        assert len(out) == 1 and out[0]["chunk_tokens"] == ["a", "b", "c"]

    def test_exact_size_boundary(self, spark):
        from timefusion_spark.operators.packing import chunk_with_overlap

        words = " ".join(f"w{i}" for i in range(20))
        df = spark.createDataFrame([(1, words)], "id long, text string").withColumn(
            "_toks", F.split(F.col("text"), r"\s+")
        )
        assert chunk_with_overlap(df, F.col("_toks"), 20, 15).count() == 1


class TestRepetitionSignals:
    def test_ngrams_and_dup_fraction(self, spark):
        from timefusion_spark.operators.text_analysis import dup_token_fraction, ngrams

        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "x"), (3, "u v w")], "id long, text string"
        ).withColumn("_toks", F.split(F.col("text"), r"\s+"))
        out = {
            r["id"]: (r["g"], round(r["f"], 4))
            for r in df.select(
                "id",
                ngrams(F.col("_toks"), 2).alias("g"),
                dup_token_fraction(F.col("_toks")).alias("f"),
            ).collect()
        }
        assert out[1] == (["a b", "b a", "a b", "b a"], 0.6)  # 2 distinct of 5
        assert out[2] == ([], 0.0)  # single token → no bigrams, no repeats
        assert out[3][0] == ["u v", "v w"]
