"""PG-dialect → Spark SQL shim (SURVEY §3.1 step 1).

The reference accepts PostgreSQL syntax over pgwire and rewrites the
PG-isms before planning (synonyms pgwire_handlers.rs:654; `->`/`->>`
arrow chains functions.rs:94-254; `&&` overlap functions.rs:104-114;
`= ANY` membership; array literals optimizers/pg_array_literal_rewriter.rs;
`::` casts). This shim is the same layer for Spark: a token-level (quote-
and comment-aware) translator producing `spark.sql`-ready text. No
Catalyst rule needed — the translation is purely syntactic.

Supported rewrites:
  - leading ABORT            → ROLLBACK (session-poison synonym)
  - expr -> 'k' / -> n       → chained JSON access, Variant-backed
    expr ->> 'k' / ->> n       (`->` keeps JSON rendering, `->>` is text)
  - expr::type               → CAST(expr AS type) with the PG type map
    ('{a,b}'::text[] array literals become array('a','b'))
  - lit = ANY(col)           → array_contains(col, lit)
  - a && b                   → arrays_overlap(a, b)  (list operands)
  - ARRAY[x, y]              → array(x, y)
  - x ~ 'p' / x ~* 'p'       → x RLIKE 'p' / x RLIKE '(?i)p'
  - now()                    → current_timestamp()

Unknown constructs pass through untouched — Spark SQL errors stay
debuggable against the translated text (returned verbatim).
"""

from __future__ import annotations

import re

# PG type name → Spark SQL type (for `::` casts and array element types).
PG_TYPE_MAP: dict[str, str] = {
    "int2": "SMALLINT",
    "int4": "INT",
    "int": "INT",
    "integer": "INT",
    "int8": "BIGINT",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "float4": "FLOAT",
    "real": "FLOAT",
    "float8": "DOUBLE",
    "double precision": "DOUBLE",
    "numeric": "DOUBLE",
    "decimal": "DOUBLE",
    "text": "STRING",
    "varchar": "STRING",
    "char": "STRING",
    "bpchar": "STRING",
    "bool": "BOOLEAN",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMP",
    "timestamp with time zone": "TIMESTAMP",
    "timestamp without time zone": "TIMESTAMP",
    "json": "STRING",
    "jsonb": "STRING",
    "uuid": "STRING",
}

_TOKEN_RE = re.compile(
    r"""
      (?P<string>'(?:''|[^'])*')
    | (?P<qident>"(?:""|[^"])*")
    | (?P<lcomment>--[^\n]*)
    | (?P<bcomment>/\*.*?\*/)
    | (?P<number>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>->>|->|::|~\*|&&|<=|>=|<>|!=|=|~|[(),\[\].*+\-/<>;])
    | (?P<ws>\s+)
""",
    re.VERBOSE | re.DOTALL,
)


_SQL_KEYWORDS = {
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "ON", "JOIN", "LEFT",
    "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "GROUP", "BY", "HAVING",
    "ORDER", "LIMIT", "OFFSET", "UNION", "ALL", "DISTINCT", "AS", "CASE",
    "WHEN", "THEN", "ELSE", "END", "IN", "EXISTS", "BETWEEN", "LIKE",
    "ILIKE", "IS", "NULL", "VALUES", "INSERT", "INTO", "UPDATE", "SET",
    "DELETE", "RETURNING", "WITH", "OVER", "PARTITION",
}


def _tokenize(sql: str) -> list[str]:
    out, i = [], 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if not m:
            out.append(sql[i])
            i += 1
            continue
        out.append(m.group(0))
        i = m.end()
    return out


def _is_ws(tok: str) -> bool:
    return tok.isspace() or tok.startswith("--") or tok.startswith("/*")


def _prev_idx(toks: list[str], i: int) -> int:
    j = i - 1
    while j >= 0 and _is_ws(toks[j]):
        j -= 1
    return j


def _next_idx(toks: list[str], i: int) -> int:
    j = i + 1
    while j < len(toks) and _is_ws(toks[j]):
        j += 1
    return j


def _operand_left(toks: list[str], i: int) -> tuple[int, str] | None:
    """Greedy simple-operand scan leftwards from operator at i: an
    identifier / dotted identifier / function call / parenthesized unit."""
    j = _prev_idx(toks, i)
    if j < 0:
        return None
    if toks[j] == ")":
        depth, k = 0, j
        while k >= 0:
            if toks[k] == ")":
                depth += 1
            elif toks[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        if depth != 0:
            return None
        p = _prev_idx(toks, k)
        if (
            p >= 0
            and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", toks[p])
            and toks[p].upper() not in _SQL_KEYWORDS
        ):
            k = p  # function call
        return (k, "".join(toks[k : j + 1]))
    # dotted identifier / literal
    start = j
    while True:
        p = _prev_idx(toks, start)
        if p >= 0 and toks[p] == "." and _prev_idx(toks, p) >= 0:
            start = _prev_idx(toks, p)
        else:
            break
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_\.]*", "".join(toks[start : j + 1])) or toks[
        j
    ].startswith("'"):
        return (start, "".join(toks[start : j + 1]))
    return None


def _operand_right(toks: list[str], i: int) -> tuple[int, str] | None:
    j = _next_idx(toks, i)
    if j >= len(toks):
        return None
    if toks[j] == "(" or (
        re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", toks[j])
        and _next_idx(toks, j) < len(toks)
        and toks[_next_idx(toks, j)] == "("
    ):
        k = j if toks[j] == "(" else _next_idx(toks, j)
        depth = 0
        while k < len(toks):
            if toks[k] == "(":
                depth += 1
            elif toks[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        return (k, "".join(toks[j : k + 1]))
    end = j
    while True:
        n = _next_idx(toks, end)
        if n < len(toks) and toks[n] == "." and _next_idx(toks, n) < len(toks):
            end = _next_idx(toks, n)
        else:
            break
    frag = "".join(toks[j : end + 1])
    if (
        re.fullmatch(r"[A-Za-z_][A-Za-z0-9_\.]*", frag)
        or toks[j].startswith("'")
        or re.fullmatch(r"\d+", frag)
    ):
        return (end, frag)
    return None


def _strip_quotes(s: str) -> str:
    return s[1:-1].replace("''", "'") if s.startswith("'") else s


def _translate_arrows(toks: list[str]) -> list[str]:
    """Collapse `base -> 'a' -> 2 ->> 'b'` chains into one Variant path
    extraction (functions.rs:94-254 semantics: `->` JSON rendering, final
    `->>` text rendering)."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if toks[i] in ("->", "->>") and out:
            left = _operand_left(out, len(out))
            right = _operand_right(toks, i)
            if left is None or right is None:
                out.append(toks[i])
                i += 1
                continue
            lstart, base = left
            path = []
            op = toks[i]
            key = right[1]
            path.append(f"[{key}]" if not key.startswith("'") else f".{_strip_quotes(key)}")
            i = right[0] + 1
            # chain further arrows
            while True:
                n = _next_idx(toks, i - 1)
                if n < len(toks) and toks[n] in ("->", "->>"):
                    nxt = _operand_right(toks, n)
                    if nxt is None:
                        break
                    op = toks[n]
                    key = nxt[1]
                    path.append(
                        f"[{key}]" if not key.startswith("'") else f".{_strip_quotes(key)}"
                    )
                    i = nxt[0] + 1
                else:
                    break
            jpath = "$" + "".join(path)
            del out[lstart:]
            if op == "->>":
                out.append(f"get_json_object({base}, '{jpath}')")
            else:
                out.append(f"to_json(variant_get(try_parse_json({base}), '{jpath}', 'variant'))")
            continue
        out.append(toks[i])
        i += 1
    return out


def _translate_casts(toks: list[str]) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(toks):
        if toks[i] == "::":
            j = _next_idx(toks, i)
            if j < len(toks) and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_ ]*", toks[j]):
                type_toks = [toks[j]]
                end = j
                # multi-word types (double precision, timestamp with time zone)
                while True:
                    n = _next_idx(toks, end)
                    if n < len(toks) and toks[n].lower() in (
                        "precision",
                        "with",
                        "without",
                        "time",
                        "zone",
                    ):
                        type_toks.append(toks[n])
                        end = n
                    else:
                        break
                pg_type = " ".join(t.lower() for t in type_toks)
                is_array = False
                n = _next_idx(toks, end)
                if n + 1 < len(toks) and toks[n] == "[" and toks[_next_idx(toks, n)] == "]":
                    is_array = True
                    end = _next_idx(toks, n)
                left = _operand_left(out, len(out))
                if left is not None and pg_type in PG_TYPE_MAP:
                    lstart, base = left
                    spark_type = PG_TYPE_MAP[pg_type]
                    del out[lstart:]
                    if is_array and base.startswith("'"):
                        elems = [
                            e.strip()
                            for e in _strip_quotes(base).strip().strip("{}").split(",")
                            if e.strip()
                        ]
                        rendered = ", ".join(
                            e if re.fullmatch(r"-?\d+(\.\d+)?", e) else "'" + e.replace("'", "''") + "'"
                            for e in elems
                        )
                        out.append(f"array({rendered})")
                    elif pg_type in ("json", "jsonb") and not is_array:
                        out.append(base)  # JSON columns are strings already
                    elif is_array:
                        out.append(f"CAST({base} AS ARRAY<{spark_type}>)")
                    else:
                        out.append(f"CAST({base} AS {spark_type})")
                    i = end + 1
                    continue
        out.append(toks[i])
        i += 1
    return out


def _translate_misc(sql: str) -> str:
    # lit = ANY(col) → array_contains(col, lit)
    sql = re.sub(
        r"('(?:''|[^'])*'|[A-Za-z_][\w\.]*|\d+)\s*=\s*ANY\s*\(\s*((?:[^()]|\([^()]*\))+?)\s*\)",
        r"array_contains(\2, \1)",
        sql,
        flags=re.IGNORECASE,
    )
    # ARRAY[...] → array(...)
    sql = re.sub(r"\bARRAY\s*\[([^\[\]]*)\]", r"array(\1)", sql, flags=re.IGNORECASE)
    # a ~* 'p' → a RLIKE '(?i)p'   |   a ~ 'p' → a RLIKE 'p'
    sql = re.sub(
        r"~\*\s*'((?:''|[^'])*)'", lambda m: f"RLIKE '(?i){m.group(1)}'", sql
    )
    sql = re.sub(r"(?<![~!<>=*])~\s*'((?:''|[^'])*)'", lambda m: f"RLIKE '{m.group(1)}'", sql)
    # a && b → arrays_overlap(a, b) for simple operands
    sql = re.sub(
        r"([A-Za-z_][\w\.]*(?:\([^()]*\))?|array\([^()]*\))\s*&&\s*"
        r"([A-Za-z_][\w\.]*(?:\([^()]*\))?|array\([^()]*\))",
        r"arrays_overlap(\1, \2)",
        sql,
    )
    sql = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", sql, flags=re.IGNORECASE)

    # time_bucket('5 minutes', ts) → time_bucket_secs(300, ts): the interval
    # literal parses driver-side with the reference grammar
    # (functions.rs:1043-1093); the SQL function stays JVM-side.
    def _tb(m: "re.Match[str]") -> str:
        from timefusion_spark.functions.time import parse_interval_to_micros

        micros = parse_interval_to_micros(m.group(1))
        return f"time_bucket_secs({micros // 1_000_000}, "

    sql = re.sub(r"\btime_bucket\s*\(\s*'([^']+)'\s*,\s*", _tb, sql, flags=re.IGNORECASE)
    return sql


def pg_to_spark_sql(sql: str) -> str:
    """Translate a PG-dialect SQL string to Spark SQL text."""
    stripped = sql.lstrip()
    if re.match(r"(?i)^ABORT\b", stripped):
        sql = sql[: len(sql) - len(stripped)] + "ROLLBACK" + stripped[5:]
    toks = _tokenize(sql)
    toks = _translate_arrows(toks)
    toks = _translate_casts(toks)
    return _translate_misc("".join(toks))


def pg_sql(spark, sql: str):
    """Run a PG-dialect query through the shim on a SparkSession."""
    return spark.sql(pg_to_spark_sql(sql))
