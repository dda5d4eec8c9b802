"""JSON function surface (SURVEY §2.9; reference: datafusion-functions-json
via database.rs:3350 + src/functions.rs JSON builders).

All JVM-side compositions over `get_json_object` / `to_json` /
`from_json` — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _path(key: str | int) -> str:
    """JSON/Variant extraction path for a literal key.

    Keys containing '.', '[', quotes or spaces must bracket-quote —
    `$.a.b` would navigate a NESTED path instead of the literal key
    'a.b' and silently return NULL (review r11; PG -> accepts any text).

    Neither Spark path dialect has an ESCAPE form (verified live:
    backslash and quote-doubling both raise INVALID_VARIANT_GET_PATH /
    return NULL — review r11-judge #5), so the quote kind is chosen per
    key: `$['…']` (the only form get_json_object accepts) unless the key
    contains a single quote, then `$["…"]` (variant_get-only — see
    _GJO_SAFE); a key containing BOTH quote kinds is unaddressable in
    every Spark dialect and raises rather than silently returning NULL.
    """
    if isinstance(key, int):
        return f"$[{key}]"
    import re as _re

    if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
        return f"$.{key}"
    if "'" not in key:
        return "$['" + key + "']"
    if '"' not in key:
        return '$["' + key + '"]'
    raise ValueError(
        f"JSON key {key!r} contains both quote kinds — not addressable by "
        "any Spark JSON/Variant path dialect"
    )


def _gjo_safe(path: str) -> bool:
    # get_json_object accepts only $.name and $['…'] forms; the
    # double-quoted bracket form silently returns NULL there.
    return not path.startswith('$["')


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
    object/array → their JSON text. Keys containing a single quote are
    outside get_json_object's path dialect — those route through the
    Variant extraction + PG text rendering instead (same semantics,
    review r11-judge #5)."""
    p = _path(key)
    if _gjo_safe(p):
        return F.get_json_object(col, p)
    return json_to_pg_text(F.to_json(F.variant_get(F.try_parse_json(col), p, "variant")))


def json_to_pg_text(json_text: Column) -> Column:
    """PG text rendering of a JSON value (functions.rs:256-303).

    The string branch unquotes/unescapes via the Variant cast —
    `from_json(col, "string")` is not a legal primitive schema and
    raised DATATYPE_MISMATCH on every call (review r11: this export was
    analysis-time broken)."""
    trimmed = F.trim(json_text)
    return (
        F.when(json_text.isNull() | (trimmed == "null"), F.lit(None).cast("string"))
        .when(
            trimmed.startswith('"') & trimmed.endswith('"'),
            F.try_variant_get(F.try_parse_json(json_text), "$", "string"),
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
        # same NULL guard as the sniffing branch: to_json(array(NULL))
        # renders '[null]' and the bracket strip left the literal text
        # 'null' where PG's to_json(NULL) is SQL NULL (review r11)
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            _quote_json_string(c)
        )
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
    """True if the JSON object contains `key` (json_contains / PG `?`
    parity). Variant-based: get_json_object conflates a JSON null VALUE
    with a missing key — `{"a": null} ? 'a'` is true in PG (review r11);
    NULL input yields NULL, like the PG operator."""
    v = F.variant_get(F.try_parse_json(col), _path(key), "variant")
    return F.when(
        col.isNull(), F.lit(None).cast("boolean")
    ).otherwise(v.isNotNull() | F.is_variant_null(v))


_SIMPLE_JSONPATH = __import__("re").compile(r"^\$(\.[A-Za-z_][A-Za-z0-9_]*|\[\d+\])*$")


def jsonb_path_exists(col: Column | str, path: str) -> Column:
    """PG jsonb_path_exists, lax mode (functions.rs:1273-1502 sql_json_path
    dialect). Simple `$.a.b[0]` paths take a direct variant_get fast path
    (the reference short-circuits them the same way). The full dialect —
    `[*]` wildcards, `?(@ ... )` comparison filters, `like_regex`,
    `starts with`, `&&`/`||` — compiles to nested higher-order
    transform/filter expressions over Variant (see jsonpath_exists_sql);
    no Python in the row path (SURVEY §2.11). Filter paths need the json
    argument as a column name / SQL expression string (the compiler emits
    SQL text shared with the pgshim rewrite)."""
    if isinstance(col, str):
        # SQL-expression input: ALWAYS the compiled path — the variant
        # fast path implements STRICT member access (no lax array
        # auto-unwrap) and returned a different answer than the compiler
        # for the same path string (review r11)
        return F.expr(jsonpath_exists_sql(col, path))
    if _SIMPLE_JSONPATH.match(path):
        # Column input, simple path: variant fast path. JSON null is an
        # existing value for jsonb_path_exists; variant_get distinguishes
        # it (variant null) from a missing path (SQL NULL). NULL input
        # yields NULL, like PG (review r11). CAVEAT: member access here
        # is STRICT — lax array auto-unwrap ($.a over [{"a":1}]) needs
        # the compiled path, i.e. a SQL-expression argument.
        v = F.variant_get(F.try_parse_json(col), path, "variant")
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            v.isNotNull() | F.is_variant_null(v)
        )
    raise ValueError(
        "jsonpath with wildcards/filters needs the json argument as a "
        "column name or SQL expression string (the path compiles to SQL text)"
    )


# ── PG SQL/JSON path compiler (lax mode) ─────────────────────────────────
#
# Grammar (the subset the reference's tests exercise — functions.rs:1273-
# 1502 via the sql_json_path crate, tests/suite/test_postgres_json_
# functions.rs:118-160, tests/slt/variant_functions.slt:105-150):
#
#   path    := '$' step*
#   step    := '.' key | '[' INT ']' | '[' '*' ']' | '?' '(' pred ')'
#   pred    := or-chain of: '(' pred ')' | operand cmp literal
#              | operand 'like_regex' STR ['flag' STR]
#              | operand 'starts' 'with' STR
#   operand := '@' ('.' key | '[' INT ']')*
#   cmp     := == | != | <> | < | <= | > | >=
#   literal := STR | NUMBER | true | false | null
#
# Lax-mode behaviors implemented: member access auto-unwraps arrays;
# [*] on a scalar wraps it; a missing path yields an empty sequence
# (filter comparisons against missing → no match). Type strictness rides
# on to_json(variant): strings compare through their quoted JSON form
# (a number never equals a string), numbers through try_cast of the
# unquoted form. Not implemented (raise): recursive descent ($..),
# .* member wildcard, arithmetic in predicates, exists()/is unknown.

import json as _json
import re as _re

_JP_TOKENS = _re.compile(
    r"""\s*(?:
        (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<op>==|!=|<>|<=|>=|&&|\|\||<|>)
      | (?P<sym>[$@.\[\]*?()])
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    _re.VERBOSE,
)


def _tokenize_jsonpath(path: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(path):
        m = _JP_TOKENS.match(path, pos)
        if not m or m.end() == pos:
            if path[pos:].strip():
                raise ValueError(f"bad jsonpath at {path[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _JsonPathParser:
    def __init__(self, path: str):
        self.toks = _tokenize_jsonpath(path)
        self.i = 0
        self.path = path

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val: str):
        k, v = self._next()
        if v != val:
            raise ValueError(f"jsonpath {self.path!r}: expected {val!r}, got {v!r}")

    def parse(self) -> list:
        self._expect("$")
        steps = []
        while self.i < len(self.toks):
            k, v = self._next()
            if v == ".":
                steps.append(("member", self._key()))
            elif v == "[":
                k2, v2 = self._next()
                if v2 == "*":
                    steps.append(("wild",))
                elif k2 == "num" and "." not in v2:
                    steps.append(("index", int(v2)))
                else:
                    raise ValueError(f"jsonpath {self.path!r}: bad subscript {v2!r}")
                self._expect("]")
            elif v == "?":
                self._expect("(")
                steps.append(("filter", self._pred()))
                self._expect(")")
            else:
                raise ValueError(f"jsonpath {self.path!r}: unexpected {v!r}")
        return steps

    def _key(self) -> str:
        k, v = self._next()
        if k == "ident":
            return v
        if k == "str":
            return _json.loads(v)
        raise ValueError(f"jsonpath {self.path!r}: bad member key {v!r}")

    def _pred(self):
        left = self._pred_and()
        while self._peek()[1] == "||":
            self._next()
            left = ("or", left, self._pred_and())
        return left

    def _pred_and(self):
        left = self._pred_primary()
        while self._peek()[1] == "&&":
            self._next()
            left = ("and", left, self._pred_primary())
        return left

    def _pred_primary(self):
        k, v = self._peek()
        if v == "(":
            self._next()
            p = self._pred()
            self._expect(")")
            return p
        accs = self._operand()
        k, v = self._next()
        if k == "op" and v not in ("&&", "||"):
            return ("cmp", accs, v, self._literal())
        if k == "ident" and v == "like_regex":
            pat = self._str_literal()
            flags = ""
            if self._peek() == ("ident", "flag"):
                self._next()
                flags = self._str_literal()
            return ("like", accs, pat, flags)
        if k == "ident" and v == "starts":
            if self._next() != ("ident", "with"):
                raise ValueError(f"jsonpath {self.path!r}: expected 'starts with'")
            return ("starts", accs, self._str_literal())
        raise ValueError(f"jsonpath {self.path!r}: bad predicate near {v!r}")

    def _operand(self):
        self._expect("@")
        accs = []
        while True:
            k, v = self._peek()
            if v == ".":
                self._next()
                accs.append(("member", self._key()))
            elif v == "[":
                self._next()
                k2, v2 = self._next()
                if k2 != "num" or "." in v2:
                    raise ValueError(f"jsonpath {self.path!r}: bad operand subscript")
                self._expect("]")
                accs.append(("index", int(v2)))
            else:
                return accs

    def _literal(self):
        k, v = self._next()
        if k == "str":
            return _json.loads(v)
        if k == "num":
            return float(v)
        if k == "ident" and v in ("true", "false"):
            return v == "true"
        if k == "ident" and v == "null":
            return None
        raise ValueError(f"jsonpath {self.path!r}: bad literal {v!r}")

    def _str_literal(self) -> str:
        k, v = self._next()
        if k != "str":
            raise ValueError(f"jsonpath {self.path!r}: expected string, got {v!r}")
        return _json.loads(v)


def _sq(s: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _vkey(key: str) -> str:
    if "'" in key or "\\" in key:
        raise ValueError(f"unsupported characters in jsonpath key {key!r}")
    return f"$['{key}']"


_CMP_SQL = {"==": "=", "!=": "!=", "<>": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


class _SqlEmitter:
    def __init__(self):
        self.n = 0

    def var(self) -> str:
        self.n += 1
        return f"x{self.n}"

    def unwrap(self, cur: str) -> str:
        v = self.var()
        return (
            f"flatten(transform({cur}, {v} -> "
            f"coalesce(try_variant_get({v}, '$', 'array<variant>'), array({v}))))"
        )

    def access(self, x: str, accs: list) -> str:
        for a in accs:
            p = _vkey(a[1]) if a[0] == "member" else f"$[{a[1]}]"
            x = f"try_variant_get({x}, {_sq(p)}, 'variant')"
        return x

    def pred(self, x: str, p) -> str:
        kind = p[0]
        if kind == "or":
            return f"(({self.pred(x, p[1])}) OR ({self.pred(x, p[2])}))"
        if kind == "and":
            return f"(({self.pred(x, p[1])}) AND ({self.pred(x, p[2])}))"
        e = self.access(x, p[1])
        tj = f"to_json({e})"
        if kind == "cmp":
            op, lit = _CMP_SQL[p[2]], p[3]
            if lit is None:
                if op == "=":
                    return f"is_variant_null({e})"
                return f"({e} IS NOT NULL AND NOT is_variant_null({e}))"
            if isinstance(lit, bool):
                guard = f"{tj} IN ('true', 'false')"
                return f"({guard} AND {tj} {op} {_sq('true' if lit else 'false')})"
            if isinstance(lit, float):
                # integers/floats unify through their JSON normal form
                return f"try_cast({tj} AS DOUBLE) {op} {lit!r}"
            # string literal: compare the QUOTED JSON form for equality
            # (type-strict — a number's to_json never starts with a quote),
            # the unquoted form for ordering. Unquoting goes through the
            # variant string cast, gated by the quote guard so its
            # number→string coercion can never fire.
            if op in ("=", "!="):
                # ensure_ascii=False: to_json renders raw UTF-8, while
                # dumps' default \uXXXX escapes would never match any
                # non-ASCII literal (review r11)
                return (
                    f"(startswith({tj}, '\"') AND {tj} {op} "
                    f"{_sq(_json.dumps(lit, ensure_ascii=False))})"
                )
            s = f"try_variant_get({e}, '$', 'string')"
            return f"(startswith({tj}, '\"') AND {s} {op} {_sq(lit)})"
        s = f"try_variant_get({e}, '$', 'string')"
        if kind == "like":
            pat = ("(?i)" if "i" in p[3] else "") + p[2]
            return f"(startswith({tj}, '\"') AND {s} RLIKE {_sq(pat)})"
        if kind == "starts":
            return f"(startswith({tj}, '\"') AND startswith({s}, {_sq(p[2])}))"
        raise AssertionError(kind)


def jsonpath_exists_sql(json_expr: str, path: str, *, variant_input: bool = False) -> str:
    """Compile a PG jsonpath (lax) into a Spark SQL boolean expression over
    `json_expr` — shared by jsonb_path_exists and the pgshim rewrite.
    The value set flows as array<variant> through transform/filter/flatten;
    existence = non-empty at the end. NULL input → NULL (PG semantics).

    `variant_input=True` treats `json_expr` as an ALREADY-PARSED Variant
    column (the reference evaluates jsonb_path_exists directly on Variant
    columns, functions.rs:1273) — callers evaluating several paths against
    one payload stage `try_parse_json` once and skip the per-predicate
    re-parse, which is the dominant cost on JSON-string inputs."""
    steps = _JsonPathParser(path).parse()
    em = _SqlEmitter()
    v0 = em.var()
    root = json_expr if variant_input else f"try_parse_json({json_expr})"
    cur = f"filter(array({root}), {v0} -> {v0} IS NOT NULL)"
    for st in steps:
        if st[0] == "member":
            v, w = em.var(), em.var()
            cur = (
                f"filter(transform({em.unwrap(cur)}, {v} -> "
                f"try_variant_get({v}, {_sq(_vkey(st[1]))}, 'variant')), "
                f"{w} -> {w} IS NOT NULL)"
            )
        elif st[0] == "index":
            v, w = em.var(), em.var()
            cur = (
                f"filter(transform({cur}, {v} -> "
                f"try_variant_get({v}, '$[{st[1]}]', 'variant')), "
                f"{w} -> {w} IS NOT NULL)"
            )
        elif st[0] == "wild":
            cur = em.unwrap(cur)
        elif st[0] == "filter":
            v = em.var()
            cur = f"filter({cur}, {v} -> ({em.pred(v, st[1])}))"
        else:
            raise AssertionError(st)
    return (
        f"CASE WHEN ({json_expr}) IS NULL THEN CAST(NULL AS BOOLEAN) "
        f"ELSE size({cur}) > 0 END"
    )


def json_array_elements(col: Column) -> Column:
    """PG jsonb_array_elements as array<variant> for `explode` (the
    reference stubs this pending table-function support,
    functions.rs:823-827 — Spark's generator + Variant do it natively;
    render elements with to_json for PG's jsonb element output)."""
    return F.from_json(col, "array<variant>")
