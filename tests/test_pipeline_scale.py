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


class TestLeakageSafeSplit:
    """Cluster-keyed splitting: every member of a near-dup component must
    land in the SAME split (the structural zero-leak guarantee), and the
    multiplicative-hash bucketing must be exact int64 arithmetic."""

    def test_component_members_share_split(self, spark, sf_dir):
        from timefusion_spark.operators import dedup as dd
        from timefusion_spark.operators.graph import connected_components
        from timefusion_spark.queries._tables import t

        d = t(spark, sf_dir, "documents")
        pairs = dd.minhash_lsh_pairs(d, threshold=0.5).select("id_a", "id_b")
        comps = connected_components(pairs, src="id_a", dst="id_b")
        split = F.when((F.col("component") * 2654435761) % 10 < 8, "train").when(
            (F.col("component") * 2654435761) % 10 == 8, "val"
        ).otherwise("test")
        spans = (
            comps.withColumn("_split", split)
            .groupBy("component")
            .agg(F.countDistinct("_split").alias("ns"))
            .where(F.col("ns") > 1)
            .count()
        )
        assert spans == 0
        # sanity: clusters exist at this scale (the guarantee is not vacuous)
        assert comps.count() > 0

    def test_hash_bucket_is_engine_exact(self, spark):
        import duckdb

        ids = list(range(0, 5000, 7))
        df = spark.createDataFrame([(i,) for i in ids], "key long")
        got = {
            r["key"]: r["b"]
            for r in df.select("key", ((F.col("key") * 2654435761) % 10).alias("b")).collect()
        }
        duck = duckdb.connect().execute(
            "SELECT key, (key * 2654435761) % 10 AS b FROM "
            "(SELECT unnest(?) AS key)", [ids]
        ).fetchall()
        assert got == {k: b for k, b in duck}


class TestBigramPerplexity:
    def test_toy_corpus_hand_computed(self, spark):
        """2-doc toy corpus: add-one-smoothed bigram NLLs hand-computed.
        Corpus: 'a b a b' and 'a b c'. Bigrams: (a,b)x3, (b,a)x1, (b,c)x1.
        Prefix counts: a->3, b->2. Vocab = {a,b,c} = 3."""
        import math

        docs = spark.createDataFrame(
            [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
        )
        toks = docs.select(
            "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("tk")
        )
        bg = (
            toks.where(F.size("tk") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(tk) - 2), i -> "
                        "struct(element_at(tk, i + 1) AS w1, element_at(tk, i + 2) AS w2))"
                    )
                ).alias("b"),
            )
            .select("doc_id", "b.w1", "b.w2")
        )
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
        v = toks.select(F.explode("tk").alias("tok")).agg(
            F.countDistinct("tok").alias("v")
        )
        nll = -F.log(
            (F.col("c12").cast("double") + F.lit(1.0))
            / (F.col("c1").cast("double") + F.col("v"))
        )
        got = (
            bg.join(c12, ["w1", "w2"]).join(c1, ["w1"]).crossJoin(F.broadcast(v))
            .groupBy("doc_id")
            .agg(F.sum(nll).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        # P(b|a) = (3+1)/(3+3) = 2/3 ; P(a|b) = (1+1)/(2+3) = 2/5 ;
        # P(c|b) = (1+1)/(2+3) = 2/5
        p_ba, p_ab, p_cb = 2 / 3, 2 / 5, 2 / 5
        want = {
            0: (-(math.log(p_ba) * 2 + math.log(p_ab)), 3),  # a b a b
            1: (-(math.log(p_ba) + math.log(p_cb)), 2),  # a b c
        }
        for r in got:
            ws, wn = want[r["doc_id"]]
            assert abs(r["s"] - ws) < 1e-12 and r["n"] == wn

    def test_single_token_docs_score_nothing(self, spark, sf_dir):
        """The sequence(0, size-2) descending-sequence hazard: 1-token docs
        must contribute zero bigrams, not a wrapped negative range."""
        docs = spark.createDataFrame([(0, "solo"), (1, "x y")], "doc_id long, text string")
        toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk"))
        bg = toks.where(F.size("tk") >= 2).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), i -> "
                    "struct(element_at(tk, i + 1) AS w1, element_at(tk, i + 2) AS w2))"
                )
            ).alias("b"),
        )
        assert [r["doc_id"] for r in bg.collect()] == [1]


class TestTokenBudgetSample:
    def test_greedy_fill_boundary(self, spark):
        """Rank by tokens desc, cumsum <= budget keeps the prefix that
        fits; a doc exactly on the boundary is kept."""
        from pyspark.sql import Window

        rows = [(1, "s", 500), (2, "s", 300), (3, "s", 200), (4, "s", 100)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = (
            df.withColumn("cum", F.sum("n_tokens").over(w))
            .where(F.col("cum") <= 1000)
            .collect()
        )
        assert sorted(r["doc_id"] for r in picked) == [1, 2, 3]  # 500+300+200 = 1000 exactly


class TestPackingAndGraphHardening:
    """Review r11 operator findings: ROWS-frame prefix sums under tied
    order keys, NULL-array row survival with clamped chunk counts, and
    type-agnostic / fail-loud component convergence."""

    def test_tied_order_keys_get_distinct_prefix_sums(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 10), ("g", 1, 10)], "grp string, ord int, sz int"
        )
        out = pack_concat_chunks(df, "grp", "ord", "sz", budget=16)
        spans = sorted((r.chunk_id, r.chunk_last) for r in out.collect())
        # tokens 0-9 fit chunk 0; tokens 10-19 straddle chunks 0-1 —
        # the default RANGE frame gave BOTH rows the post-tie total
        # (both (0, 1))
        assert spans == [(0, 0), (0, 1)]

    def test_chunk_overlap_null_rows_survive_and_no_empty_chunks(self, spark):
        from timefusion_spark.operators.packing import chunk_with_overlap

        df = spark.createDataFrame(
            [(1, list(range(10))), (2, None)],
            "id int, toks array<int>",
        )
        out = chunk_with_overlap(df, F.col("toks"), size=1, stride=10).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.id, []).append(r)
        # stride past the end: exactly ONE chunk, no trailing empty one
        assert len(by_id[1]) == 1 and by_id[1][0].chunk_tokens == [0]
        # the NULL-array row is kept (not silently dropped from the set)
        assert len(by_id[2]) == 1 and by_id[2][0].chunk_tokens is None

    def test_connected_components_string_ids(self, spark):
        edges = spark.createDataFrame(
            [("doc_a", "doc_b"), ("doc_b", "doc_c")], "src string, dst string"
        )
        comps = {
            r.n: r.component for r in connected_components(edges).collect()
        }
        # the sum-of-labels probe returned NULL for string ids and
        # stopped after one round, leaving doc_c labeled doc_b
        assert comps == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a"}

    def test_connected_components_raises_when_unconverged(self, spark):
        import pytest as _pytest

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "src int, dst int"
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iter=2)


class TestR13OperatorEdges:
    """Regression pins for the round-13 operator review findings."""

    def test_pack_zero_size_doc_on_boundary(self, spark):
        # a zero-size doc ending exactly on a chunk boundary used to get
        # chunk_id = chunk_last + 1 (a phantom chunk) with spanned = 0
        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 0), ("a", 3, 3)], "g string, i long, n long"
        )
        out = {
            (r.g, r.i): (r.chunk_id, r.chunk_last, r.chunks_spanned)
            for r in pack_concat_chunks(df, "g", "i", "n", budget=10).collect()
        }
        assert out[("a", 1)] == (0, 0, 1)
        assert out[("a", 2)] == (0, 0, 0)  # anchored to preceding token's chunk
        assert out[("a", 3)] == (1, 1, 1)

    def test_pack_zero_size_doc_first_in_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 0), ("a", 2, 5)], "g string, i long, n long"
        )
        out = {
            r.i: (r.chunk_id, r.chunk_last, r.chunks_spanned)
            for r in pack_concat_chunks(df, "g", "i", "n", budget=10).collect()
        }
        assert out[1] == (0, 0, 0)
        assert out[2] == (0, 0, 1)

    def test_components_converge_at_diameter_eq_max_iter(self, spark):
        # diameter == max_iter must converge (propagation rounds + one
        # confirming round); the loop used to raise despite full labels
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        got = {
            r.n: r.component
            for r in connected_components(edges, max_iter=2).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}

    def test_quality_score_null_text_is_null(self, spark):
        from timefusion_spark.operators.text_analysis import quality_score

        df = spark.createDataFrame(
            [(1, "the cat sat on the mat with a hat"), (2, None)],
            "id long, text string",
        )
        rows = {r.id: r.q for r in df.select(
            "id", quality_score(F.col("text")).alias("q")
        ).collect()}
        assert rows[1] is not None and 0.0 <= rows[1] <= 1.0
        assert rows[2] is None  # used to score ~0.833 via least() NULL-skip

    def test_ngrams_null_tokens_is_null(self, spark):
        from timefusion_spark.operators.text_analysis import ngrams

        df = spark.createDataFrame(
            [(1, ["a", "b", "c"]), (2, None)], "id long, toks array<string>"
        )
        rows = {r.id: r.g for r in df.select(
            "id", ngrams(F.col("toks"), 2).alias("g")
        ).collect()}
        assert rows[1] == ["a b", "b c"]
        assert rows[2] is None  # used to come back as an empty array

    def test_mix_sample_null_source_and_key_not_dropped(self, spark):
        from timefusion_spark.operators.packing import (
            mix_sample,
            temperature_mix_rates,
        )

        rows = [(f"k{i}", "web") for i in range(50)]
        rows += [(f"n{i}", None) for i in range(50)]
        rows += [(None, "books")]
        df = spark.createDataFrame(rows, "k string, source string")
        rates = temperature_mix_rates(df, "source", alpha=0.5, target_rows=200)
        assert rates.count() == 3  # NULL source gets its own rates row
        assert all(r.rate_ppb >= 1 for r in rates.collect())
        kept = mix_sample(df, rates, "source", F.col("k"))
        # target_rows (200) > corpus (101): every rate saturates at 1.0,
        # so nothing may be dropped — including NULL source and NULL key
        assert kept.count() == 101
        assert kept.where(F.col("source").isNull()).count() == 50

    def test_redact_email_with_ip_domain(self, spark):
        from timefusion_spark.operators.text_analysis import redact_pii

        df = spark.createDataFrame(
            [(1, "contact john.doe@10.0.0.1 or jane@example.com")],
            "id long, t string",
        )
        out = df.select(redact_pii(F.col("t")).alias("r")).first().r
        # the local part used to survive as 'john.doe@<IP>'
        assert "john.doe" not in out
        assert out == "contact <EMAIL> or <EMAIL>"

    def test_sample_hash_salt_decorrelates(self, spark):
        from timefusion_spark.operators.packing import sample_hash

        df = spark.createDataFrame(
            [(f"key{i}",) for i in range(400)], "k string"
        )
        base = {r.k for r in df.where(sample_hash(F.col("k"), 10, 1)).collect()}
        salted = {
            r.k
            for r in df.where(
                sample_hash(F.col("k"), 10, 1, salt="v2")
            ).collect()
        }
        assert base and salted
        assert base != salted  # same call without salt returns base exactly
        rerun = {r.k for r in df.where(sample_hash(F.col("k"), 10, 1)).collect()}
        assert rerun == base
