"""PG SQL/JSON-path lax dialect (functions/json_fns.py jsonpath compiler).

Cases ported from the reference's own suites:
/root/reference/tests/slt/variant_functions.slt:105-150 and
/root/reference/tests/suite/test_postgres_json_functions.rs:118-160
(functions.rs:1273-1502 sql_json_path dialect)."""

from __future__ import annotations

import pytest

from timefusion_spark.functions.json_fns import jsonpath_exists_sql

REFERENCE_CASES = [
    # variant_functions.slt:105-150
    ('{"user": {"name": "Alice"}}', "$.user.name", True),
    ('{"user": {"name": "Alice"}}', "$.nonexistent", False),
    ('{"items": [{"name": "a"}, {"name": "b"}]}', "$.items[*].name", True),
    ("[1, 2, 3]", "$[*]", True),
    ("null", "$.any", False),
    ('{"a": 1}', "$.a", True),
    ('{"a": 1}', "$.b", False),
    # test_postgres_json_functions.rs:118-160
    ('["pat:ed6bf5b6","other"]', '$[*] ? (@ == "pat:ed6bf5b6")', True),
    ('["other"]', '$[*] ? (@ == "pat:ed6bf5b6")', False),
    ('[{"error_type":"boom"}]', '$[*]."error_type" ? (@ == "boom")', True),
    ('{"msg":"ABCdef"}', '$."msg" ? (@ like_regex "^abc.*" flag "i")', True),
    ('{"msg":"xyz"}', '$."msg" ? (@ like_regex "^abc.*" flag "i")', False),
    ('[{"path":"/api/x"}]', '$[*]."path" ? (@ starts with "/api")', True),
    ('[{"path":"/web/x"}]', '$[*]."path" ? (@ starts with "/api")', False),
]

DIALECT_CASES = [
    # filter on a member of the wildcard element
    ('{"items": [{"qty": 1}, {"qty": 3}]}', "$.items[*] ? (@.qty > 1)", True),
    ('{"items": [{"qty": 1}]}', "$.items[*] ? (@.qty > 1)", False),
    # type strictness: a number never equals a string and vice versa
    ('{"a": 5}', '$.a ? (@ == "5")', False),
    ('{"a": "5"}', '$.a ? (@ == "5")', True),
    ('{"a": 5}', "$.a ? (@ == 5)", True),
    ('{"a": 5.0}', "$.a ? (@ == 5)", True),  # int/float unify numerically
    ('{"a": "true"}', "$.a ? (@ == true)", False),
    ('{"a": true}', "$.a ? (@ == true)", True),
    # JSON null exists; == null matches only JSON null
    ('{"a": null}', "$.a", True),
    ('{"a": null}', "$.a ? (@ == null)", True),
    ('{"a": 1}', "$.a ? (@ == null)", False),
    # boolean connectives
    ('{"a": 1, "b": 2}', "$ ? (@.a == 1 && @.b == 2)", True),
    ('{"a": 1, "b": 0}', "$ ? (@.a == 2 || @.b == 0)", True),
    ('{"a": 1, "b": 0}', "$ ? (@.a == 2 && @.b == 0)", False),
    # subscripts
    ('{"a": [1,2]}', "$.a[1]", True),
    ('{"a": [1,2]}', "$.a[5]", False),
    # != is type-strict and missing-safe
    ('{"a": 1}', "$.a ? (@ != 1)", False),
    ('{"a": 2}', "$.a ? (@ != 1)", True),
    ('{"a": "x"}', '$.a ? (@ != "y")', True),
    ('{"b": 1}', "$.a ? (@ != 1)", False),  # missing → empty seq → no match
    # lax auto-unwrap: member access reaches into arrays without [*]
    ('{"items": [{"name": "a"}]}', "$.items.name", True),
    # string ordering through the unquoted form
    ('{"a": "zz"}', '$.a ? (@ > "y")', True),
    ('{"a": "aa"}', '$.a ? (@ > "y")', False),
]


@pytest.mark.parametrize("j,path,want", REFERENCE_CASES + DIALECT_CASES)
def test_jsonpath_exists(spark, j, path, want):
    sql = jsonpath_exists_sql("j", path)
    got = spark.createDataFrame([(j,)], "j string").selectExpr(f"{sql} AS r").collect()[0]["r"]
    assert got is want, (path, j)


def test_null_input_yields_null(spark):
    sql = jsonpath_exists_sql("j", "$.a")
    got = spark.createDataFrame([(None,)], "j string").selectExpr(f"{sql} AS r").collect()[0]["r"]
    assert got is None


def test_pgshim_rewrites_filter_paths(spark):
    from timefusion_spark.pgshim import pg_sql

    r = pg_sql(
        spark,
        """SELECT jsonb_path_exists('["pat:x","other"]', '$[*] ? (@ == "pat:x")') AS a,
                  jsonb_path_exists('{"q": 3}', '$.q ? (@ > 1 && @ < 5)') AS b,
                  jsonb_path_exists('{"q": 3}', '$.q ? (@ > 5)'::jsonpath) AS c""",
    ).collect()[0]
    assert (r["a"], r["b"], r["c"]) == (True, True, False)


def test_unsupported_paths_raise():
    for bad in ("$..a", "$.*", "$.a ? (@.size() > 1)", "a.b"):
        with pytest.raises(ValueError):
            jsonpath_exists_sql("j", bad)


from pyspark.sql import functions as F  # noqa: E402


class TestJsonFnReviewFixes:
    """Review r11 findings across the JSON function surface — each was
    live-verified broken before the fix."""

    def _one(self, spark, c):
        return spark.range(1).select(c.alias("x")).collect()[0]["x"]

    def test_json_to_pg_text_unquotes(self, spark):
        # from_json(col, "string") raised DATATYPE_MISMATCH on every call
        import timefusion_spark.functions.json_fns as J

        assert self._one(spark, J.json_to_pg_text(F.lit('"café \\"q\\""'))) == 'café "q"'
        assert self._one(spark, J.json_to_pg_text(F.lit("123"))) == "123"
        assert self._one(spark, J.json_to_pg_text(F.lit("null"))) is None

    def test_keys_with_dots_and_quotes(self, spark):
        import timefusion_spark.functions.json_fns as J

        assert self._one(spark, J.json_get_text(F.lit('{"a.b": 1}'), "a.b")) == "1"
        assert self._one(spark, J.json_get(F.lit('{"a.b": "x"}'), "a.b")) == '"x"'

    def test_json_contains_null_value_key_and_null_input(self, spark):
        import timefusion_spark.functions.json_fns as J

        # PG `?`: an existing key with a JSON null VALUE is contained
        assert self._one(spark, J.json_contains(F.lit('{"a": null}'), "a")) is True
        assert self._one(spark, J.json_contains(F.lit("{}"), "a")) is False
        assert (
            self._one(spark, J.json_contains(F.lit(None).cast("string"), "a"))
            is None
        )

    def test_pg_to_json_null_without_sniffing(self, spark):
        import timefusion_spark.functions.json_fns as J

        assert (
            self._one(
                spark, J.pg_to_json(F.lit(None).cast("string"), sniff_json=False)
            )
            is None
        )

    def test_string_input_simple_path_is_lax(self, spark):
        import timefusion_spark.functions.json_fns as J

        # lax member access auto-unwraps arrays; the variant fast path
        # (strict) answered False for the same path string
        assert (
            self._one(
                spark,
                J.jsonb_path_exists(
                    "'{\"items\":[{\"name\":1}]}'", "$.items.name"
                ),
            )
            is True
        )
        # Column-input fast path: NULL in → NULL out (was False)
        assert (
            self._one(
                spark, J.jsonb_path_exists(F.lit(None).cast("string"), "$.k")
            )
            is None
        )

    def test_non_ascii_string_filter_matches(self, spark):
        import timefusion_spark.functions.json_fns as J

        # ensure_ascii=True escaped the literal to \uXXXX while to_json
        # renders raw UTF-8 — accented text never matched
        assert (
            self._one(
                spark,
                J.jsonb_path_exists("'[\"café\"]'", '$[*] ? (@ == "café")'),
            )
            is True
        )
