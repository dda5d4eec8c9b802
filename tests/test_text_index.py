"""Trigram text index (tantivy-sidecar analog, pg_trgm design): indexed
search must return EXACTLY the scan path's rows — the index only prunes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefusion_spark.functions.text import text_match
from timefusion_spark.operators.text_index import (
    query_trigrams,
    trigram_index,
    trigram_search,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Apache Spark merges Delta tables"),
        (2, "spark and sparkle are different words"),
        (3, "MERGE INTO is a SQL statement"),
        (4, "parquet files store columns"),
        (5, "no relevant content here"),
        (6, "ok"),  # shorter than one trigram
        (7, None),  # NULL text never matches, never indexes
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestTrigramIndex:
    def test_query_trigrams(self):
        assert query_trigrams("spark") == ["spa", "par", "ark"]
        assert query_trigrams("ab") == []

    def test_index_shape(self, docs):
        idx = trigram_index(docs)
        assert idx.columns == ["doc_id", "gram", "gbucket"]
        assert idx.where(
            (F.col("gbucket") < 0) | (F.col("gbucket") >= 64)
        ).count() == 0
        assert idx.where(F.length("gram") != 3).count() == 0
        assert idx.where(F.col("doc_id") == 6).count() == 0  # too short
        assert idx.where(F.col("doc_id") == 7).count() == 0  # NULL text
        # distinct: "spark"'s repeated grams in doc 2 appear once
        assert (
            idx.groupBy("doc_id", "gram").count().where(F.col("count") > 1).count()
            == 0
        )

    @pytest.mark.parametrize(
        "query",
        [
            "spark",  # plain token
            "Spark MERGE",  # AND of tokens, case-insensitive
            "park",  # substring INSIDE words (sparkle, Spark) — the case
            #          a token-inverted index would miss; trigrams catch it
            "is a",  # both tokens < 3 chars: pure verify fallback
            "merge xyzzyplugh",  # one token matches nothing
            "",  # empty query matches everything (text_match contract)
        ],
    )
    def test_indexed_equals_scan(self, docs, query):
        idx = trigram_index(docs)
        indexed = sorted(
            r["doc_id"] for r in trigram_search(docs, idx, query).collect()
        )
        scan = sorted(
            r["doc_id"]
            for r in docs.where(text_match(F.col("text"), query)).collect()
        )
        assert indexed == scan

    def test_pruning_happens(self, docs):
        idx = trigram_index(docs)
        grams = query_trigrams("parquet")
        cand = (
            idx.where(F.col("gram").isin(grams))
            .groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("ng"))
            .where(F.col("ng") == len(grams))
        )
        assert cand.count() == 1  # only doc 4 survives candidate generation

    def test_search_plan_is_equi_join_only(self, docs):
        """Scale pin: candidate generation is equi-joins on gram literals
        (hash/merge), the verify is a semi-join on id — never a
        cartesian/BNLJ over the corpus, no row-path Python."""
        idx = trigram_index(docs)
        out = trigram_search(docs, idx, "spark merge")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
        assert (
            "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan
        )
