"""JSON function surface (SURVEY §2.9; reference: datafusion-functions-json
via database.rs:3350 + src/functions.rs JSON builders).

All JVM-side compositions over `get_json_object` / `to_json` /
`from_json` — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _path(key: str | int) -> str:
    if isinstance(key, int):
        return f"$[{key}]"
    return f"$.{key}"


def json_get(col: Column, key: str | int) -> Column:
    """PG `->`: extract a field as JSON text (objects/arrays stay JSON,
    strings stay quoted).  get_json_object returns scalars unquoted, so
    re-quote strings to keep `->` (json) semantics distinct from `->>`."""
    raw = F.get_json_object(col, _path(key))
    # get_json_object strips quotes from string scalars; detect scalars that
    # were strings by round-tripping: if the raw extract is valid JSON
    # (object/array/number/bool/null) keep it, else re-quote.
    return F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(
            raw.rlike(r"^(\{.*\}|\[.*\]|-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?|true|false|null)$"),
            raw,
        ).otherwise(F.concat(F.lit('"'), raw, F.lit('"')))
    )


def json_get_text(col: Column, key: str | int) -> Column:
    """PG `->>` text semantics (functions.rs:256-303 `json_to_pg_text`):
    string unquoted, JSON null → SQL NULL, number/bool → literal text,
    object/array → their JSON text."""
    return F.get_json_object(col, _path(key))


def json_to_pg_text(json_text: Column) -> Column:
    """PG text rendering of a JSON value (functions.rs:256-303)."""
    trimmed = F.trim(json_text)
    return (
        F.when(json_text.isNull() | (trimmed == "null"), F.lit(None).cast("string"))
        .when(
            trimmed.startswith('"') & trimmed.endswith('"'),
            # unquote + unescape via from_json to a string
            F.from_json(json_text, "string"),
        )
        .otherwise(json_text)
    )


def json_build_array(*cols: Column) -> Column:
    """PG json_build_array(variadic) → JSON array text
    (functions.rs:829-869). Renders each argument by type and joins —
    linear, like the reference's perf-noted implementation."""
    # to_json(array(x)) == "[<json of x>]"; strip brackets and re-join.
    rendered = [F.to_json(F.array(c)) for c in cols]
    stripped = [F.regexp_replace(F.regexp_replace(r, r"^\[", ""), r"\]$", "") for r in rendered]
    return F.concat(F.lit("["), F.concat_ws(",", *stripped), F.lit("]"))


def json_length(col: Column) -> Column:
    """Number of elements of a JSON array / keys of an object."""
    arr = F.from_json(col, "array<string>")
    obj = F.from_json(col, "map<string,string>")
    return F.when(arr.isNotNull(), F.size(arr)).otherwise(
        F.when(obj.isNotNull(), F.size(F.map_keys(obj))).otherwise(F.lit(None).cast("int"))
    )


def json_contains(col: Column, key: str) -> Column:
    """True if the JSON object contains `key` (json_contains parity)."""
    return F.get_json_object(col, _path(key)).isNotNull()
