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
    strings stay QUOTED — distinct from `->>`).

    Structural, not heuristic: the value is extracted as a Variant and
    re-rendered with to_json, so a string scalar that happens to look like
    a number/bool ({"k":"123"}) keeps its quotes and embedded quotes are
    escaped correctly (the regex re-quoting approach misclassified both).
    Mirrors the reference's `->` rewrite to variant_get + variant_to_json
    (functions.rs:94-254)."""
    return F.to_json(F.variant_get(F.try_parse_json(col), _path(key), "variant"))


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


def _quote_json_string(c: Column) -> Column:
    # JSON-escape + quote a scalar via the to_json(array(x)) trick.
    return F.regexp_replace(F.regexp_replace(F.to_json(F.array(c)), r"^\[", ""), r"\]$", "")


def pg_to_json(c: Column, sniff_json: bool = True) -> Column:
    """PG to_json/to_jsonb value rendering (functions.rs:871-937, sniff
    rules functions.rs:987-1040): strings that LOOK like top-level JSON
    ({...} / [...]) and parse surface as real JSON; any other string is a
    quoted JSON string; numbers/bools render literally (pass a non-string
    column). Sniffing applies only at the top level — inside text[] the
    reference keeps elements as JSON strings (use to_json(array) there)."""
    t = F.trim(c)
    looks = (t.startswith("{") & t.endswith("}")) | (t.startswith("[") & t.endswith("]"))
    parsed = F.try_parse_json(c)
    if not sniff_json:
        return _quote_json_string(c)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(looks & parsed.isNotNull(), F.to_json(parsed)).otherwise(_quote_json_string(c))
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


_SIMPLE_JSONPATH = __import__("re").compile(r"^\$(\.[A-Za-z_][A-Za-z0-9_]*|\[\d+\])*$")


def jsonb_path_exists(col: Column, path: str) -> Column:
    """PG jsonb_path_exists for SIMPLE lax paths ($.a.b[0] grammar): true
    iff the path resolves to a value. Pure expression — matches the
    reference's variant_get fast path (functions.rs:1273-1502, which
    short-circuits simple paths the same way before engaging its full
    jsonpath engine). Filter expressions (`? (@ > 1)`), wildcards and
    recursive descent are NOT supported here and raise: a Python-UDF
    jsonpath engine would put Python in the row path, which this engine
    bans (SURVEY §2.11); the slt corpus only exercises simple paths."""
    if not _SIMPLE_JSONPATH.match(path):
        raise ValueError(f"unsupported jsonpath (simple $.a.b[0] paths only): {path!r}")
    # JSON null is an existing value for jsonb_path_exists; variant_get
    # distinguishes it (variant null) from a missing path (SQL NULL).
    v = F.variant_get(F.try_parse_json(col), path, "variant")
    return v.isNotNull() | F.is_variant_null(v)


def json_array_elements(col: Column) -> Column:
    """PG jsonb_array_elements as array<variant> for `explode` (the
    reference stubs this pending table-function support,
    functions.rs:823-827 — Spark's generator + Variant do it natively;
    render elements with to_json for PG's jsonb element output)."""
    return F.from_json(col, "array<variant>")
