"""BM25 ranked retrieval (operators/ranking.py) — formula and plan shape."""

import math

import pytest

from timefusion_spark.operators.ranking import bm25_scores


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark filter join filter"),
        (2, "window window window window window window"),
        (3, "merge sort"),
        (4, "the quick brown fox"),
        (5, "filter"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected(rows, terms, k1=1.2, b=0.75):
    docs = {i: txt.split(" ") for i, txt in rows}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    out = {}
    for i, toks in docs.items():
        dl = len(toks)
        s = 0.0
        for term in terms:
            tf = toks.count(term)
            df = sum(1 for tk in docs.values() if term in tk)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out[i] = (dl, s)
    return out


def test_scores_match_reference_formula(corpus):
    rows = [
        (1, "spark filter join filter"),
        (2, "window window window window window window"),
        (3, "merge sort"),
        (4, "the quick brown fox"),
        (5, "filter"),
    ]
    terms = ["filter", "merge"]
    got = {r["doc_id"]: (r["dl"], r["score"]) for r in bm25_scores(
        corpus, "doc_id", "text", terms).collect()}
    want = _expected(rows, terms)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-12)
    # no-match doc scores exactly 0
    assert got[4][1] == 0.0


def test_rarer_term_outranks_common_at_equal_tf(spark):
    rows = [(i, "common filler") for i in range(1, 9)]
    rows += [(100, "common rare"), (101, "common text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(
        df, "doc_id", "text", ["rare", "common"]).collect()}
    assert got[100] > got[101] > 0


def test_requires_terms(corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, "doc_id", "text", [])


def test_plan_is_two_scans_no_explode(corpus):
    plan = bm25_scores(corpus, "doc_id", "text", ["filter"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Generate" not in plan  # no explode — tf is a map-side HOF
    assert "BatchEvalPython" not in plan
    # the stats side reaches the scorer as a broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan


def test_bm25_all_empty_corpus_scores_zero(spark):
    """avgdl = 0 (all-NULL/empty text) must not NULL every score: the
    documented contract is no-match rows score 0.0 (review r11)."""
    from timefusion_spark.operators.ranking import bm25_scores

    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.score
        for r in bm25_scores(docs, "doc_id", "text", ["merge"]).collect()
    }
    assert got == {1: 0.0, 2: 0.0}
