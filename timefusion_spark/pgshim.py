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
        # extend through `expr::type` chains: PG's cast binds tighter than
        # `->`/`->>`, so in `'{"a":3}'::jsonb ->> 'a'` the arrow's operand
        # is the WHOLE cast, not the bare type token (the cast pass runs
        # after the arrow pass and still sees the inline `::`)
        p = _prev_idx(toks, start)
        if p >= 0 and toks[p] == "::":
            inner = _operand_left(toks, p)
            if inner is not None:
                return (inner[0], "".join(toks[inner[0] : j + 1]))
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


# ── Variant-typed columns ─────────────────────────────────────────────────
#
# Storage tables persist Variant fields as physical Spark VariantType
# (functions.rs:364-369 parity). The SQL rewriter has no resolver, so the
# storage layer registers the NAMES of Variant-declared columns; a JSON
# operator whose base is such a column traverses the stored Variant binary
# directly instead of staging try_parse_json over text (the reference's
# DF54 regression — variant_column.slt — was exactly `->`/`->>` failing to
# bind on Variant COLUMNS while working on Utf8 ones).

_VARIANT_COLS: set[str] = set()

# Per-SparkSession variant registrations (weak keys: a dropped session
# drops its registrations). Two sessions in one process may register
# DIFFERENT Variant column sets — each session's translations see the
# global set plus its own, never another session's (the r7 staleness
# finding: a process-global generation let session A's cached translation
# serve session B).
import threading as _threading
import weakref as _weakref

_SESSION_VARIANT_COLS: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_ACTIVE_VARIANT = _threading.local()

_BARE_IDENT_RE = re.compile(r"(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)")


def register_variant_columns(names, spark=None) -> None:
    """Record column names that are VariantType in registered table views
    (called by the slt env / storage registration paths). With `spark`,
    the registration is scoped to that session; without, it is global
    (legacy callers / single-session processes). The translation cache
    needs no invalidation hook: its key embeds the resolved column set."""
    target = _VARIANT_COLS
    if spark is not None:
        target = _SESSION_VARIANT_COLS.setdefault(spark, set())
    target.update(n.lower() for n in names)


def _variant_cols_for(spark=None) -> frozenset[str]:
    """The Variant column set active for a translation: global
    registrations plus the session's own."""
    if spark is None:
        return frozenset(_VARIANT_COLS)
    return frozenset(_VARIANT_COLS | _SESSION_VARIANT_COLS.get(spark, set()))


def _active_variant_cols() -> frozenset[str]:
    """The set the CURRENT translation runs under (thread-local, bound by
    pg_to_spark_sql); falls back to the global set for direct calls into
    the rewrite helpers."""
    cols = getattr(_ACTIVE_VARIANT, "cols", None)
    return frozenset(_VARIANT_COLS) if cols is None else cols


def _variant_producing(x: str) -> str | None:
    """If `x` already evaluates to a Variant — a registered Variant column
    or a reference-style 2-arg variant_get over one — return an expression
    for it (3-arg Spark variant_get form, which the later variant_get
    rewrite pass leaves untouched). None ⇒ treat as JSON text."""
    x = x.strip()
    m = _BARE_IDENT_RE.fullmatch(x)
    if m:
        return f"({x})" if m.group(1).lower() in _active_variant_cols() else None
    m = re.match(r"(?is)^variant_get\s*\((.*)\)$", x)
    if m:
        args = _split_args(m.group(1))
        if len(args) == 2 and args[1].startswith("'"):
            inner = _variant_producing(args[0]) or f"try_parse_json({args[0]})"
            return f"variant_get({inner}, '{_variant_path(args[1])}', 'variant')"
    return None


def _as_variant(x: str) -> str:
    """Stage expression `x` as a Variant: pass-through for Variant-typed
    inputs, parse-once for JSON text."""
    return _variant_producing(x) or f"try_parse_json({x})"


def _variant_pg_text(v: str) -> str:
    """PG `->>` text rendering of a Variant expression (json_to_pg_text,
    functions.rs:256-303): JSON null → SQL NULL, string unquoted,
    number/bool literal text, object/array their JSON text. Missing path
    (SQL NULL variant) falls through every branch to NULL."""
    return (
        f"(CASE WHEN __ISVNULL__({v}) THEN CAST(NULL AS STRING)"
        f" WHEN startswith(__TOJSON__({v}), '\"')"
        f" THEN try_variant_get({v}, '$', 'string')"
        f" ELSE __TOJSON__({v}) END)"
    )


def _sql_str(s: str) -> str:
    """SQL single-quoted literal for `s` (quote-doubled)."""
    return "'" + s.replace("'", "''") + "'"


_SUBSCRIPT_STOPWORDS = frozenset(
    "select where and or not from join on when then else end case as in "
    "by group order having limit union all distinct values set returning "
    "between like ilike is exists any some".split()
)


def _subscripts_to_element_at(sql: str) -> str:
    """Rewrite PG 1-based integer subscripts to element_at: both
    `fn(...)[n]` and bare `col[n]`, outside string literals. One forward
    scan with an open-paren stack (literals are consumed atomically, so
    parens inside them never enter the balance — review r12). A
    keyword before '(' is a parenthesized expression, not a call name,
    and stays outside the wrapped base."""
    open_stack: list[int] = []
    last_call: tuple[int, int] | None = None  # (open_pos, one-past-')') of last close
    out = ""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            m = re.match(r"'(?:''|[^'])*'", sql[i:])
            frag = m.group(0) if m else ch
            out += frag
            i += len(frag)
            continue
        if ch == "(":
            open_stack.append(len(out))
        elif ch == ")":
            if open_stack:
                last_call = (open_stack.pop(), len(out) + 1)
        elif ch == "[":
            m = re.match(r"\[\s*(\d+)\s*\]", sql[i:])
            if m:
                stripped = out.rstrip()
                start = None
                if (
                    stripped.endswith(")")
                    and last_call
                    and last_call[1] == len(stripped)
                ):
                    start = last_call[0]
                    k = re.search(r"[A-Za-z_][\w\.]*\s*$", out[:start])
                    if k and k.group(0).strip().lower() not in _SUBSCRIPT_STOPWORDS:
                        start = k.start()
                else:
                    # match on the rstripped text: PG allows whitespace
                    # between the column and '[' ("tags [1]"), which the
                    # un-rstripped anchor silently missed (review r12)
                    k = re.search(r"[A-Za-z_][\w\.]*\s*$", out)
                    if (
                        k
                        and k.group(0).strip().lower() not in _SUBSCRIPT_STOPWORDS
                    ):
                        start = k.start()
                if start is not None:
                    base = out[start:].rstrip()
                    out = f"{out[:start]}element_at({base}, {m.group(1)})"
                    last_call = (start, len(out))
                    i += len(m.group(0))
                    continue
        out += ch
        i += 1
    return out


def _key_seg(key: str) -> str:
    """One member/bracket path segment for a literal JSON key — the shared
    json_fns._path rules (identifier → `.k`, else bracket-quoted with
    whichever quote kind the key does not contain; both kinds raise).
    Shared so the SQL path and the Column API address keys identically
    (review r11-judge #4/#5: the shim's `$.{key}` broke dotted/special
    keys the Column API handled)."""
    from timefusion_spark.functions.json_fns import _path

    return _path(key)[1:]


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

            def seg(key: str) -> str | None:
                if not key.startswith("'"):
                    # only INTEGER literals form a static path segment —
                    # a column ref / expression key (PG dynamic access)
                    # embedded as literal path text would silently return
                    # NULL for every row; decline instead (review r12)
                    return f"[{key}]" if re.fullmatch(r"-?\d+", key) else None
                k = _strip_quotes(key)
                # ->>'' : empty key = text rendering of the current value
                return _key_seg(k) if k else ""

            key = right[1]
            first = seg(key)
            if first is None:
                out.append(toks[i])  # untranslatable: leave the arrow verbatim
                i += 1
                continue
            path.append(first)
            i = right[0] + 1
            # chain further arrows
            while True:
                n = _next_idx(toks, i - 1)
                if n < len(toks) and toks[n] in ("->", "->>"):
                    nxt = _operand_right(toks, n)
                    if nxt is None:
                        break
                    s = seg(nxt[1])
                    if s is None:
                        break  # stop the chain BEFORE the dynamic key
                    op = toks[n]
                    path.append(s)
                    i = nxt[0] + 1
                else:
                    break
            jpath = "$" + "".join(path)
            del out[lstart:]
            # a trailing ::json/::jsonb cast on the operand is a no-op here
            # (JSON stays a string in this engine) and must not leak into
            # the emitted call as an un-translatable inline cast
            base = re.sub(r"(?is)\s*::\s*jsonb?$", "", base)
            vbase = _variant_producing(base)
            # bracket-quoted segments can contain a single quote (the
            # `$["o'k"]` form) — double it for the SQL literal; and
            # get_json_object accepts only the single-quoted bracket
            # dialect, so double-quoted-form paths on a text base route
            # through the Variant extraction instead of silently
            # returning NULL (review r11-judge #5)
            p_sql = _sql_str(jpath)
            if op == "->>":
                if vbase is None and '["' not in jpath:
                    out.append(f"get_json_object({base}, {p_sql})")
                else:
                    out.append(
                        _variant_pg_text(
                            f"variant_get({vbase or f'try_parse_json({base})'},"
                            f" {p_sql}, 'variant')"
                        )
                    )
            else:
                # __TOJSON__ sentinel: keep the user-facing to_json rewrite
                # pass from re-wrapping this engine-generated call.
                out.append(
                    f"__TOJSON__(variant_get({vbase or f'try_parse_json({base})'},"
                    f" {p_sql}, 'variant'))"
                )
            continue
        out.append(toks[i])
        i += 1
    return out


def _translate_variant_compare(toks: list[str]) -> list[str]:
    """Variant column compared against JSON-text literals (`body IN
    ('"a"', '"b"')`, `body = '…'` — variant_column.slt:145 'exercises
    coercion'): compare through the canonical JSON text, since Spark
    defines no ordering on VARIANT. Runs AFTER the arrow pass, so any
    remaining bare Variant identifier adjacent to a comparison/IN is a
    genuine variant-vs-text compare."""
    cmp_ops = {"=", "!=", "<>", "<", "<=", ">", ">="}
    out = list(toks)
    for i, tok in enumerate(out):
        if tok.lower() not in _active_variant_cols() or not _BARE_IDENT_RE.fullmatch(tok):
            continue
        p = _prev_idx(out, i)
        n = _next_idx(out, i)
        prev = out[p] if p >= 0 else ""
        nxt = out[n] if n < len(out) else ""
        if nxt == "(":
            continue  # function name
        qual_start = None
        if prev == "." or prev.endswith("."):
            # `t.body` — a RELATION-qualified variant ref is the same
            # compare (the old skip left raw VARIANT against text and
            # Spark has no such ordering — review r12); wrap the whole
            # qualified pair. A deeper path (a.b.body) is a struct/field
            # access, not a relation qualifier — skip those.
            q = _prev_idx(out, p)
            if (
                prev == "."
                and q >= 0
                and re.fullmatch(r"[A-Za-z_]\w*", out[q])
                and (
                    _prev_idx(out, q) < 0
                    or out[_prev_idx(out, q)] != "."
                )
            ):
                qual_start = q
            else:
                continue  # qualified tail beyond one level / dotted token
        if qual_start is None:
            cmp_left = prev
        else:
            ql = _prev_idx(out, qual_start)
            cmp_left = out[ql] if ql >= 0 else ""
        if (
            nxt in cmp_ops
            or nxt.upper() in ("IN", "LIKE")
            or cmp_left in cmp_ops
            or cmp_left.upper() == "IN"
        ):
            if qual_start is not None:
                out[i] = f"__TOJSON__({out[qual_start]}.{tok})"
                # spaces, not empty strings: later token passes
                # (_translate_casts) skip whitespace tokens via _is_ws
                out[qual_start] = " "
                out[p] = " "
            else:
                out[i] = f"__TOJSON__({tok})"
    return out


def _parse_pg_array_literal(s: str):
    """Parse a PG array literal ('{…}' contents, already unquoted) into
    nested lists of str | None — the array_in grammar (public PG syntax):
    `{}` nesting for multi-dimensional values, `"…"` quoting with
    backslash escapes, unquoted elements ending at `,`/`}` with the bare
    word NULL meaning SQL NULL. Raises ValueError on malformed input (PG
    errors there too)."""
    pos = 0
    n = len(s)

    def skip_ws() -> None:
        nonlocal pos
        while pos < n and s[pos].isspace():
            pos += 1

    def parse_array():
        nonlocal pos
        if pos >= n or s[pos] != "{":
            raise ValueError(f"malformed array literal: {s!r}")
        pos += 1
        items: list = []
        skip_ws()
        if pos < n and s[pos] == "}":
            pos += 1
            return items
        while True:
            skip_ws()
            if pos >= n:
                raise ValueError(f"malformed array literal: {s!r}")
            if s[pos] == "{":
                items.append(parse_array())
            elif s[pos] == '"':
                pos += 1
                buf: list[str] = []
                while pos < n and s[pos] != '"':
                    if s[pos] == "\\" and pos + 1 < n:
                        pos += 1
                    buf.append(s[pos])
                    pos += 1
                if pos >= n:
                    raise ValueError(f"unterminated quote in array literal: {s!r}")
                pos += 1
                items.append("".join(buf))
            else:
                start = pos
                while pos < n and s[pos] not in ",}":
                    pos += 1
                raw = s[start:pos].strip()
                if not raw:
                    # PG's array_in rejects empty unquoted elements —
                    # '{a,}' / '{,a}' / '{a,,b}' are all malformed (an
                    # empty STRING element must be quoted: '{""}')
                    raise ValueError(f"malformed array literal: {s!r}")
                items.append(None if raw.upper() == "NULL" else raw)
            skip_ws()
            if pos < n and s[pos] == ",":
                pos += 1
                continue
            if pos < n and s[pos] == "}":
                pos += 1
                return items
            raise ValueError(f"malformed array literal: {s!r}")

    out = parse_array()
    skip_ws()
    if pos != n:
        raise ValueError(f"trailing garbage in array literal: {s!r}")
    return out


def _pg_array_literal_sql(literal: str, spark_type: str) -> str:
    """Render a PG array literal as a Spark array(...) expression.
    1-D literals keep the bare `array(...)` form (Spark's element
    coercion types them, and downstream rewrites like `= ANY` pattern-
    match on it); multi-dimensional literals — which PG's cast accepts
    at any depth, the value carries the dims — render CAST-wrapped so
    `'{{1,2},{3,4}}'::int[]` becomes
    `CAST(array(array(1, 2), array(3, 4)) AS ARRAY<ARRAY<INT>>)`."""
    parsed = _parse_pg_array_literal(literal)

    def depth_of(node, d: int = 1) -> int:
        for x in node:
            if isinstance(x, list):
                return depth_of(x, d + 1)
        return d

    # with a NUMERIC target type ('{1.50}'::float8[]), the element's text
    # form is irrelevant — PG parses it as a number — so any valid
    # numeric renders as a TYPED bare literal ('1.50' → 1.50D, value
    # semantics, exactly PG's float8in/int4in). Quoting them instead
    # types the array STRING and breaks numeric = ANY / unnest; a
    # per-element CAST(...) would nest parens past what the downstream
    # `= ANY` matcher accepts — Spark's typed-literal suffixes (D double,
    # L bigint) keep the rendered array() flat (review r11). Non-numeric
    # text against a numeric target stays quoted and surfaces as a type
    # error, like PG's invalid-input-syntax.
    floatish = spark_type in ("FLOAT", "DOUBLE")
    intish = spark_type in ("SMALLINT", "INT", "BIGINT")

    def render(node) -> str:
        if isinstance(node, list):
            return "array(" + ", ".join(render(x) for x in node) + ")"
        if node is None:
            return "NULL"
        if floatish and re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)", node):
            return node + "D"
        if floatish and re.fullmatch(
            r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+", node
        ):
            return node  # exponent literals are DOUBLE already
        if intish and re.fullmatch(r"[+-]?\d+", node):
            return node + ("L" if spark_type == "BIGINT" else "")
        # STRING target: only CANONICAL-form numerics render bare — '007'
        # must stay text (against a text LHS PG compares the literal text,
        # '007' <> '7', which a bare 7 would silently match — review r10);
        # same for trailing fraction zeros ('1.50' re-renders as '1.5',
        # ADVICE r10) — the fraction must end in a nonzero digit.
        if re.fullmatch(r"-?(0|[1-9]\d*)(\.\d*[1-9])?", node):
            return node
        return "'" + node.replace("'", "''") + "'"

    d = depth_of(parsed)
    if d == 1:
        return render(parsed)
    typed = "ARRAY<" * d + spark_type + ">" * d
    return f"CAST({render(parsed)} AS {typed})"


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
                        out.append(
                            _pg_array_literal_sql(
                                _strip_quotes(base).strip(), spark_type
                            )
                        )
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


def _split_args(argtext: str) -> list[str]:
    """Split a function-call argument list at top-level commas
    (paren/bracket/quote aware)."""
    args, depth, buf, i = [], 0, [], 0
    while i < len(argtext):
        ch = argtext[i]
        if ch == "'":
            m = re.match(r"'(?:''|[^'])*'", argtext[i:])
            frag = m.group(0) if m else ch
            buf.append(frag)
            i += len(frag)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        args.append(tail)
    return args


def _rewrite_calls(sql: str, name: str, fn) -> str:
    """Rewrite every call of `name(...)` via fn(args list) → replacement
    text (or None to leave unchanged). Handles nesting by repeating from the
    innermost match until fixpoint."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    changed = True
    while changed:
        changed = False
        for m in pat.finditer(sql):
            # Skip if inside a string literal (count quotes before).
            if sql.count("'", 0, m.start()) % 2 == 1:
                continue
            depth, i = 0, m.end() - 1
            while i < len(sql):
                if sql[i] == "'":
                    mm = re.match(r"'(?:''|[^'])*'", sql[i:])
                    i += len(mm.group(0)) if mm else 1
                    continue
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            if depth != 0:
                continue
            # Nested same-name calls converge without inner-first ordering:
            # the replacement embeds inner text verbatim and the loop
            # re-scans until no 2-arg/user-form occurrence remains.
            inner = sql[m.end() : i]
            repl = fn(_split_args(inner))
            if repl is None:
                continue
            sql = sql[: m.start()] + repl + sql[i + 1 :]
            changed = True
            break
    return sql


def _variant_path(path_lit: str) -> str:
    """'a.b[0]' (reference variant_get grammar, functions.rs:145) →
    Spark JSON path '$.a.b[0]'."""
    p = _strip_quotes(path_lit)
    return "$" + ("" if p.startswith("[") else ".") + p


def _pg_json_render(x: str) -> str:
    """PG value → JSON text rendering, type-universal: Variant casts accept
    any input type, and to_json(variant) renders canonical JSON. Uses the
    __TOJSON__ sentinel so the user-facing to_json rewrite pass does not
    re-process generated calls."""
    return f"__TOJSON__(cast({x} AS variant))"


def _to_char_sql(ts: str, fmt: str) -> str:
    """SQL-text twin of functions.pg_format.to_char — same parser, same
    segment semantics (functions.rs:537-775 incl. divergences), emitted as
    date_format/dayofweek compositions.

    Literal runs inside a java pattern ('-', 'T', …) are emitted as plain
    SQL string fragments instead of quoted pattern text: SQL quote escaping
    differs between Spark's two string-literal parse modes, while pattern
    fragments and bare literals are mode-independent."""
    from timefusion_spark.functions.pg_format import _PATTERN, _parse

    frags: list[str] = []

    def emit_pattern(payload: str) -> None:
        # split "yyyy'-'MM''dd" into pattern vs quoted-literal runs
        for piece in re.split(r"('(?:''|[^'])*')", payload):
            if not piece:
                continue
            if piece.startswith("'"):
                lit = piece[1:-1].replace("''", "'") if piece != "''" else "'"
                frags.append("'" + lit.replace("'", "''") + "'")
            else:
                frags.append(f"date_format({ts}, '{piece}')")

    for kind, payload in _parse(fmt):
        if kind == _PATTERN:
            emit_pattern(payload)
        elif payload == "D":
            frags.append(f"cast(dayofweek({ts}) as string)")
        elif payload == "DY":
            frags.append(f"upper(date_format({ts}, 'EEE'))")
        elif payload == "TZ":
            frags.append("'UTC'")
        elif payload in ("AM", "PM"):
            frags.append(f"date_format({ts}, 'a')")
        else:  # am / pm
            frags.append(f"lower(date_format({ts}, 'a'))")
    body = f"concat({', '.join(frags)})" if len(frags) > 1 else (frags[0] if frags else "''")
    return f"(CASE WHEN ({ts}) IS NULL THEN CAST(NULL AS STRING) ELSE {body} END)"


def _translate_fn_calls(sql: str) -> str:
    """PG/reference function-surface rewrites that need argument structure
    (the token passes handle operators; these handle named calls).

    The Variant family binds directly on physical VariantType columns
    (storage/schema.py: Variant → Spark VariantType, parsed once at
    insert), mirroring functions.rs:395-450 semantics: json_to_variant
    parses JSON text, variant_to_json renders canonical JSON,
    variant_get extracts a typed sub-document. `register_variant_columns`
    wires `->`/`->>` so shimmed SQL hits the binary encoding, never a
    JSON re-parse."""
    # PG ordered-aggregate forms: array_agg/string_agg(e ORDER BY k [DESC]).
    # Spark has no per-aggregate ORDER BY, so the order key rides inside the
    # collected element — struct sorting gives (key, value) order, which is
    # PG's order plus a deterministic value tiebreak where PG leaves ties
    # unspecified. DISTINCT requires key == expr (the PG rule) and maps to
    # sort_array(collect_set).
    def _ordered_collect(e: str, k: str, direction: str, distinct: bool) -> str | None:
        if distinct and k != e:
            return None  # PG: DISTINCT requires ORDER BY expr == the argument
        # Both the key==expr and key!=expr forms ride the SAME struct sort,
        # so NULL elements survive in both (collect_list would drop a bare
        # NULL element, but not a struct with NULL fields). The leading
        # IS-NULL flag pins PG's null placement: ASC → NULLS LAST,
        # DESC (reverse) → NULLS FIRST. DISTINCT is array_distinct over the
        # sorted array: duplicates are adjacent so order is preserved, and
        # the one NULL element PG keeps survives (collect_set would drop it).
        arr = (
            f"transform(array_sort(collect_list("
            f"named_struct('_n', ({k}) IS NULL, '_o', {k}, '_x', {e}))), s -> s._x)"
        )
        if direction == "DESC":
            arr = f"reverse({arr})"
        return f"array_distinct({arr})" if distinct else arr

    _ORD = r"(?is)^\s*(DISTINCT\s+)?(.*?)\s+ORDER\s+BY\s+(.+?)(?:\s+(ASC|DESC))?\s*$"

    def _ordered_array_agg(a: list[str]) -> str | None:
        if len(a) != 1 or not re.search(r"(?i)\bORDER\s+BY\b", a[0]):
            return None
        m = re.match(_ORD, a[0])
        if not m:
            return None
        return _ordered_collect(
            m.group(2).strip(), m.group(3).strip(), (m.group(4) or "ASC").upper(),
            bool(m.group(1)),
        )

    def _ordered_string_agg(a: list[str]) -> str | None:
        # string_agg(e, sep ORDER BY k): the split puts ORDER BY in arg 2.
        if len(a) != 2 or not re.search(r"(?i)\bORDER\s+BY\b", a[1]):
            return None
        m = re.match(r"(?is)^\s*(.+?)\s+ORDER\s+BY\s+(.+?)(?:\s+(ASC|DESC))?\s*$", a[1])
        if not m:
            return None
        dm = re.match(r"(?is)^\s*DISTINCT\s+(.*)$", a[0])
        arr = _ordered_collect(
            (dm.group(1) if dm else a[0]).strip(), m.group(2).strip(),
            (m.group(3) or "ASC").upper(), bool(dm),
        )
        return None if arr is None else f"array_join({arr}, {m.group(1).strip()})"

    sql = _rewrite_calls(sql, "array_agg", _ordered_array_agg)
    sql = _rewrite_calls(sql, "string_agg", _ordered_string_agg)
    # to_char(ts, 'fmt') — PG format tokens (functions.rs:537-775).
    sql = _rewrite_calls(
        sql,
        "to_char",
        lambda a: (
            _to_char_sql(a[0], _strip_quotes(a[1]))
            if len(a) == 2 and a[1].strip().startswith("'")
            else None
        ),
    )
    # PG to_json / to_jsonb value rendering (functions.rs:871-937). Spark's
    # to_json only accepts container/variant input; the Variant cast makes
    # the rewrite type-universal (string → quoted, number → literal,
    # array → JSON array). The reference's JSON-sniffing of string inputs
    # (functions.rs:987-1040) lives in the Column API (json_fns.pg_to_json);
    # the slt corpus does not exercise it through SQL.
    def _pg_to_json(a: list[str]) -> str | None:
        return _pg_json_render(a[0]) if len(a) == 1 else None

    sql = _rewrite_calls(sql, "to_json", _pg_to_json)
    sql = _rewrite_calls(sql, "to_jsonb", _pg_to_json)
    # json_build_array(variadic) → JSON array text (functions.rs:829-869);
    # per-element Variant casts keep mixed argument types uncoerced, and
    # string elements that LOOK like top-level JSON embed as real JSON
    # (the reference's sniff rule, functions.rs:987-1040).
    def _sniff_elem(x: str) -> str:
        s = f"cast({x} AS string)"
        return (
            f"coalesce(CASE WHEN (startswith(ltrim({s}), '{{') OR"
            f" startswith(ltrim({s}), '[')) THEN try_parse_json({s}) END,"
            f" cast({x} AS variant))"
        )

    def _build_array(a: list[str]) -> str | None:
        if not a or not a[0]:
            return "'[]'"
        return "__TOJSON__(array(" + ", ".join(_sniff_elem(x) for x in a) + "))"

    sql = _rewrite_calls(sql, "json_build_array", _build_array)
    sql = _rewrite_calls(sql, "jsonb_build_array", _build_array)
    sql = _rewrite_calls(
        sql, "json_to_variant", lambda a: f"({a[0]})" if len(a) == 1 else None
    )
    # variant_pretty: DataFusion-variant's Debug rendering of the decoded
    # scalar (variant_functions.slt:100 pins `Int8(123)`). Integers print
    # with the narrowest Rust width tag (Int8/Int16/Int32/Int64 — the
    # decoder picks the smallest fitting type), strings as String("…")
    # (the JSON rendering already carries the quotes); everything else —
    # floats, bools, arrays, objects, whose internal tags the corpus does
    # not pin — falls back to the canonical JSON text.
    def _variant_pretty(a: list[str]) -> str | None:
        if len(a) != 1:
            return None
        j = f"coalesce(to_json({_as_variant(a[0])}), 'null')"
        b = f"try_cast({j} AS bigint)"
        return (
            f"(CASE WHEN {b} IS NOT NULL AND NOT contains({j}, '.') THEN"
            f" CASE WHEN {b} BETWEEN -128 AND 127 THEN concat('Int8(', {j}, ')')"
            f" WHEN {b} BETWEEN -32768 AND 32767 THEN concat('Int16(', {j}, ')')"
            f" WHEN {b} BETWEEN -2147483648 AND 2147483647 THEN concat('Int32(', {j}, ')')"
            f" ELSE concat('Int64(', {j}, ')') END"
            f" WHEN startswith({j}, '\"') THEN concat('String(', {j}, ')')"
            f" ELSE {j} END)"
        )

    sql = _rewrite_calls(sql, "variant_pretty", _variant_pretty)
    # variant_to_json renders a missing/NULL variant as JSON 'null' (the
    # DataFusion-variant behavior the slt corpus pins).
    sql = _rewrite_calls(
        sql,
        "variant_to_json",
        lambda a: (
            f"coalesce(to_json({_as_variant(a[0])}), 'null')" if len(a) == 1 else None
        ),
    )
    sql = _rewrite_calls(
        sql,
        "variant_get",
        lambda a: (
            f"to_json(variant_get({_as_variant(a[0])}, '{_variant_path(a[1])}', 'variant'))"
            if len(a) == 2 and a[1].strip().startswith("'")
            else None
        ),
    )
    # sentinel: the replacement contains the pattern name itself
    sql = _rewrite_calls(
        sql,
        "is_variant_null",
        lambda a: f"__ISVNULL__({_as_variant(a[0])})" if len(a) == 1 else None,
    )

    # jsonb_path_exists (functions.rs:1273-1502): the PG SQL/JSON-path lax
    # dialect — member/index steps, [*] wildcards, ?(@ ...) comparison
    # filters, like_regex, starts with — compiled to higher-order variant
    # expressions by functions/json_fns.jsonpath_exists_sql (one compiler
    # shared with the DataFrame API).
    def _path_exists(a: list[str]) -> str | None:
        if len(a) != 2 or not a[1].strip().startswith("'"):
            return None
        from timefusion_spark.functions.json_fns import jsonpath_exists_sql

        arg = a[1].strip().removesuffix("::jsonpath").rstrip()
        path = _strip_quotes(arg)
        if not path.startswith("$"):
            return None
        vexpr = _variant_producing(a[0])
        return "(" + jsonpath_exists_sql(
            vexpr or a[0], path, variant_input=vexpr is not None
        ) + ")"

    sql = _rewrite_calls(sql, "jsonb_path_exists", _path_exists)
    # percentile two-step (functions.rs:1096-1267): the composed form maps
    # to Spark's interpolating percentile aggregate — the t-digest
    # interpolates between centroids, so nearest-value percentile_approx
    # diverges on small groups while percentile() matches; a bare
    # percentile_agg keeps digest-nullability semantics (NULL iff no rows).
    # The engine's own sketch path (functions/percentile.py) stays
    # percentile_approx — this is the PG-surface parity mapping.
    sql = _rewrite_calls(
        sql,
        "approx_percentile",
        lambda a: (
            f"percentile({a[1].strip()[len('percentile_agg('):-1].strip()}, {a[0]})"
            if len(a) == 2 and re.match(r"(?i)^percentile_agg\(", a[1].strip())
            else None
        ),
    )
    sql = _rewrite_calls(
        sql,
        "percentile_agg",
        lambda a: f"percentile({a[0]}, 0.5)" if len(a) == 1 else None,
    )

    # string_to_array (the bulk-insert summary round-trip:
    # string_to_array(_, chr(31)) in insert_unnest_variant.rs). PG rules:
    # '' → empty array, empty delimiter → whole string as one element,
    # NULL string → NULL. The delimiter is a literal string, so it is
    # regex-quoted (\Q…\E) before Spark's regex-based split.
    def _string_to_array(a: list[str]) -> str | None:
        if len(a) != 2:
            return None
        s, d = a[0], a[1]
        return (
            f"CASE WHEN ({s}) = '' THEN array() "
            f"WHEN ({d}) = '' THEN array({s}) "
            f"ELSE split({s}, concat('\\\\Q', {d}, '\\\\E'), -1) END"
        )

    sql = _rewrite_calls(sql, "string_to_array", _string_to_array)
    # datafusion-functions-json surface (database.rs:3350).
    def _json_length(a: list[str]) -> str | None:
        if len(a) > 2:
            return None
        if len(a) == 1:
            target = a[0]
        else:
            # literal keys only (a column-valued key has no static path);
            # shared _key_seg rules so dotted/special keys address the
            # LITERAL key, not a nested path (review r11-judge #4 class)
            if not a[1].strip().startswith("'"):
                return None
            try:
                p = "$" + _key_seg(_strip_quotes(a[1].strip()))
            except ValueError:
                return None
            target = f"__TOJSON__(variant_get({_as_variant(a[0])}, {_sql_str(p)}, 'variant'))"
        arr = f"try_variant_get(try_parse_json({target}), '$', 'array<variant>')"
        obj = f"try_variant_get(try_parse_json({target}), '$', 'map<string,variant>')"
        return f"coalesce(size({arr}), size(map_keys({obj})))"

    sql = _rewrite_calls(sql, "json_length", _json_length)
    # json_contains / PG `?`: ONE compilation with the Column API
    # (json_fns.json_contains) — the old get_json_object form conflated a
    # JSON null VALUE with a missing key ({"a": null} ? 'a' is TRUE in PG)
    # and broke dotted/special keys via `$.{key}` (review r11-judge #4).
    def _json_contains(a: list[str]) -> str | None:
        if len(a) != 2 or not a[1].strip().startswith("'"):
            return None
        try:
            p = "$" + _key_seg(_strip_quotes(a[1].strip()))
        except ValueError:
            return None  # both quote kinds: unaddressable — fail loud, not wrong
        v = f"variant_get({_as_variant(a[0])}, {_sql_str(p)}, 'variant')"
        return (
            f"(CASE WHEN ({a[0]}) IS NULL THEN CAST(NULL AS BOOLEAN)"
            f" ELSE (({v}) IS NOT NULL OR __ISVNULL__({v})) END)"
        )

    sql = _rewrite_calls(sql, "json_contains", _json_contains)
    # DataFusion 1-arg array_length (0 for empty); PG's 2-arg (arr, dim=1).
    sql = _rewrite_calls(
        sql,
        "array_length",
        lambda a: f"size({a[0]})" if len(a) == 1 or (len(a) == 2 and a[1] == "1") else None,
    )

    # coalesce(list_col, '{a,b}') — PG array literal in coalesce
    # (optimizers/pg_array_literal_rewriter.rs semantics): rewrite brace
    # literals to array(...) when another argument is a non-literal operand.
    def _coalesce(a: list[str]) -> str | None:
        if not any(re.fullmatch(r"'\{[^{}]*\}'", x.strip()) for x in a):
            return None
        if not any(not x.strip().startswith("'") for x in a):
            return None
        out = []
        for x in a:
            x = x.strip()
            if re.fullmatch(r"'\{[^{}]*\}'", x):
                # REAL PG array parsing (quoted elements, embedded commas,
                # NULL sentinel) — the old naive comma split broke
                # '{"x,y"}' apart and stringified NULL (review r12).
                # Untyped context: canonical numerics render bare so the
                # coalesce arms coerce like PG's unknown-literal
                # resolution; every other element stays a quoted string
                # (the r10 canonical rule — '007' must not become 7).
                try:
                    parsed = _parse_pg_array_literal(_strip_quotes(x))
                except ValueError:
                    return None  # malformed: leave verbatim for the error
                parts = []
                for e in parsed:
                    if e is None:
                        parts.append("NULL")
                    elif isinstance(e, str) and re.fullmatch(
                        r"-?(0|[1-9]\d*)(\.\d*[1-9])?", e
                    ):
                        parts.append(e)
                    elif isinstance(e, str):
                        parts.append("'" + e.replace("'", "''") + "'")
                    else:
                        return None  # nested literal can't appear in '{[^{}]*}'
                out.append(f"array({', '.join(parts)})")
            else:
                out.append(x)
        return f"coalesce({', '.join(out)})"

    sql = _rewrite_calls(sql, "coalesce", _coalesce)
    # DataFusion EXTRACT(SECOND ...) yields whole seconds; Spark yields
    # DECIMAL(8,6) with the fraction — truncate to match.
    sql = re.sub(
        r"(?i)\bEXTRACT\s*\(\s*SECOND\s+FROM\s+([^()]+)\)",
        r"CAST(EXTRACT(SECOND FROM \1) AS BIGINT)",
        sql,
    )
    return sql.replace("__TOJSON__", "to_json").replace("__ISVNULL__", "is_variant_null")


def _find_close_paren(sql: str, open_idx: int) -> int | None:
    """Index of the ')' balancing the '(' at open_idx (quote-aware)."""
    depth, j = 0, open_idx
    while j < len(sql):
        if sql[j] == "'":
            mm = re.match(r"'(?:''|[^'])*'", sql[j:])
            j += len(mm.group(0)) if mm else 1
            continue
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    return None


def _translate_select_list_unnest(sql: str) -> str:
    """``SELECT unnest(e1) AS c1, unnest(e2) AS c2, …`` (no FROM) →
    zipped-rows subquery. This is the reference's PRODUCTION enrichment
    source shape (tests/suite/unnest_optimizer_regression_test.rs quotes
    it: ``UPDATE … FROM (SELECT unnest($1) AS span_id, unnest($2) AS
    trace_id, unnest($3) AS tag) u``): PG ≥10 advances parallel
    set-returning functions in lockstep, padding exhausted ones with
    NULL — exactly arrays_zip. Only fires when EVERY projection item is
    an aliased unnest and the statement has no FROM (next token is ')'
    or end), so ordinary scalar subqueries are untouched."""
    pat = re.compile(r"\bSELECT\s+", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if m is None:
            return sql
        j = m.end()
        items: list[tuple[str, str]] = []
        ok = True
        while True:
            mu = re.match(r"unnest\s*\(", sql[j:], re.IGNORECASE)
            if not mu:
                ok = False
                break
            close = _find_close_paren(sql, j + mu.end() - 1)
            if close is None:
                ok = False
                break
            arg = sql[j + mu.end() : close]
            ma = re.match(r"\s+AS\s+(\w+)", sql[close + 1 :], re.IGNORECASE)
            if not ma:
                ok = False
                break
            items.append((arg, ma.group(1)))
            j = close + 1 + ma.end()
            mc = re.match(r"\s*,\s*", sql[j:])
            if mc:
                j += mc.end()
                continue
            break
        if ok and items and re.match(r"\s*(\)|$)", sql[j:]):
            cols = ", ".join(a for _, a in items)
            args = ", ".join(a for a, _ in items)
            repl = (
                f"SELECT {cols} FROM (SELECT inline(arrays_zip({args})))"
                f" AS __unnest_zip({cols})"
            )
            sql = sql[: m.start()] + repl + sql[j:]
            pos = m.start() + len(repl)
        else:
            pos = m.end()


def _last_clause_keyword(prev: str) -> str | None:
    """The last SELECT/FROM/WHERE/GROUP/ORDER/HAVING keyword at the SAME
    paren depth as the end of ``prev`` (quote-aware) — decides whether a
    trailing comma belongs to a select list or a FROM list."""
    kw_re = re.compile(r"\b(SELECT|FROM|WHERE|GROUP|ORDER|HAVING)\b", re.IGNORECASE)
    depth, j, marks = 0, 0, []
    while j < len(prev):
        ch = prev[j]
        if ch == "'":
            mm = re.match(r"'(?:''|[^'])*'", prev[j:])
            j += len(mm.group(0)) if mm else 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        else:
            km = kw_re.match(prev, j)
            if km:
                marks.append((depth, km.group(1).upper()))
                j = km.end()
                continue
        j += 1
    for d, kw in reversed(marks):
        if d == depth:
            return kw
    return None


def _translate_unnest(sql: str) -> str:
    """FROM-position ``unnest(a1, a2, …)`` → ``(SELECT inline(arrays_zip(
    a1, a2, …)))`` — the column-oriented bulk-insert source
    (tests/e2e/insert_unnest_variant.rs: INSERT…SELECT…FROM unnest(<array
    per column>) keeps planning O(cols) instead of O(rows×cols)).

    PG zip semantics (multi-array unnest pads the shorter arrays with
    NULL) match arrays_zip exactly. A following ``AS t(c1, …)`` alias is
    valid Spark for a subquery and passes through verbatim; PG's
    column-name defaults (alias name, else ``unnest``) are materialized
    when the column list is absent (single-array form only)."""
    out = []
    i = 0
    pat = re.compile(r"\bunnest\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if m is None:
            out.append(sql[i:])
            break
        # FROM-position check: previous non-ws token must end the FROM
        # introduction (FROM / JOIN / a comma INSIDE a FROM list — a comma
        # is ambiguous, so resolve it by the last same-depth clause
        # keyword). Select-list unnest (a PG set-returning projection) is
        # handled by _translate_select_list_unnest, not here.
        prev = sql[: m.start()].rstrip()
        if prev.endswith(","):
            if _last_clause_keyword(prev) != "FROM":
                out.append(sql[i : m.end()])
                i = m.end()
                continue
        elif not re.search(r"(?i)(\bFROM|\bJOIN)$", prev):
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        # balanced-paren arg extraction (quote-aware)
        depth, j = 0, m.end() - 1
        while j < len(sql):
            if sql[j] == "'":
                mm = re.match(r"'(?:''|[^'])*'", sql[j:])
                j += len(mm.group(0)) if mm else 1
                continue
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        args = _split_args(sql[m.end() : j])
        repl = f"(SELECT inline(arrays_zip({', '.join(args)})))"
        tail = sql[j + 1 :]
        am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s*(\()?", tail, re.IGNORECASE)
        alias_kw = {"WHERE", "GROUP", "ORDER", "LIMIT", "ON", "JOIN", "CROSS",
                    "INNER", "LEFT", "RIGHT", "FULL", "UNION", "HAVING"}
        if am and am.group(1).upper() not in alias_kw:
            if am.group(2) is None and len(args) == 1:
                # alias without column list → PG names the column after it
                repl += f" AS {am.group(1)}({am.group(1)})"
                tail = tail[am.end(1) :]
        elif len(args) == 1:
            repl += " AS unnest(unnest)"
        out.append(sql[i : m.start()])
        out.append(repl)
        sql = tail
        i = 0
    return "".join(out)


def _translate_distinct_on(sql: str) -> str:
    """PG `SELECT DISTINCT ON (keys) select_list ... ORDER BY o...` →
    row_number window rewrite (keep the first row per key group under the
    ORDER BY, which is PG's semantic)."""
    m = re.search(r"(?is)\bSELECT\s+DISTINCT\s+ON\s*\(", sql)
    if not m:
        return sql
    # keys list — balanced parens
    depth, i = 0, m.end() - 1
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    keys = [k.strip() for k in _split_args(sql[m.end() : i])]
    rest = sql[i + 1 :]
    # Bound the statement scope: it ends where paren depth goes negative
    # (the ')' closing an enclosing subquery) or at end of text.
    depth, j = 0, 0
    while j < len(rest):
        ch = rest[j]
        if ch == "'":
            mm = re.match(r"'(?:''|[^'])*'", rest[j:])
            j += len(mm.group(0)) if mm else 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                break
        j += 1
    rest, trailer = rest[:j], rest[j:]
    om = re.search(r"(?is)\bORDER\s+BY\s+", rest)
    if not om:
        return sql
    body, order_text = rest[: om.start()], rest[om.end() :]
    fm = re.search(r"(?is)\bFROM\b", body)
    if not fm:
        return sql
    select_list, from_part = body[: fm.start()].strip(), body[fm.end() :].strip()
    order_items = _split_args(order_text)
    # window order = ORDER BY items minus the leading DISTINCT ON keys
    tail = [
        o
        for o in order_items
        if re.split(r"\s+", o.strip())[0].lower() not in {k.lower() for k in keys}
    ]
    order_clause = ", ".join(tail) if tail else ", ".join(keys)
    part = ", ".join(keys)
    return (
        f"{sql[: m.start()]}SELECT * EXCEPT (__rn) FROM (SELECT {select_list},"
        f" row_number() OVER (PARTITION BY {part} ORDER BY {order_clause}) AS __rn"
        f" FROM {from_part}) WHERE __rn = 1{trailer}"
    )


def _similar_to_regex(pat: str) -> str:
    """SQL SIMILAR TO pattern → anchored Java regex: % → .*, _ → . ;
    `\\%` / `\\_` (SQL escapes) are LITERAL wildcards; regex
    metacharacters that are LITERAL in SQL regex syntax (., ^, $) are
    escaped; the SQL-regex operators (| * + ? {} () []) pass through.
    Bracket expressions keep their contents verbatim.

    This replacement lands AFTER the token pass that DOUBLES backslashes
    for Spark's string parser, so (a) each original pattern backslash
    arrives as two chars, and (b) every regex escape emitted here must
    itself be doubled to survive one level of string-literal unescaping."""

    def orig(i: int) -> tuple[str, int]:
        # one ORIGINAL pattern char (collapsing the token-pass doubling)
        if pat[i] == "\\" and i + 1 < len(pat) and pat[i + 1] == "\\":
            return "\\", i + 2
        return pat[i], i + 1

    def emit_literal(ch: str) -> str:
        if ch == "\\":
            return "\\\\\\\\"  # regex \\ , doubled
        if ch in ".^$|*+?{}()[]":
            return "\\\\" + ch  # regex \<ch> , doubled
        return ch

    out: list[str] = []
    i, in_br = 0, False
    while i < len(pat):
        ch, i = orig(i)
        if in_br:
            out.append("\\\\" if ch == "\\" else ch)
            if ch == "]":
                in_br = False
        elif ch == "\\" and i < len(pat):
            # SQL escape: next char is literal (PG \% and \_ wildcards)
            lit, i = orig(i)
            out.append(emit_literal(lit))
        elif ch == "[":
            out.append(ch)
            in_br = True
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch in ".^$":
            out.append("\\\\" + ch)
        elif ch == "\\":
            out.append("\\\\\\\\")  # trailing lone backslash: literal
        else:
            out.append(ch)
    return "^(?:" + "".join(out) + ")$"


def _translate_misc(sql: str) -> str:
    # gen_random_uuid() → uuid()  (pgcrypto's UUID generator)
    sql = re.sub(r"(?i)\bgen_random_uuid\s*\(\s*\)", "uuid()", sql)
    # EXTRACT(EPOCH FROM x) → seconds-since-epoch double with µs preserved
    # (functions.rs:939-967; Spark's EXTRACT has no EPOCH field).
    def _extract_epoch(a: list[str]) -> str | None:
        if len(a) != 1:
            return None
        m = re.match(r"(?is)^\s*EPOCH\s+FROM\s+(.+)$", a[0])
        if not m:
            return None
        return f"(cast(unix_micros({m.group(1).strip()}) AS double) / 1000000.0)"

    sql = _rewrite_calls(sql, "EXTRACT", _extract_epoch)
    # age(a[, b]) → timestamp subtraction (PG returns an interval; the
    # one-arg form measures from now()).
    def _age(a: list[str]) -> str | None:
        if len(a) == 2:
            return f"(({a[0].strip()}) - ({a[1].strip()}))"
        if len(a) == 1:
            return f"(current_timestamp() - ({a[0].strip()}))"
        return None

    sql = _rewrite_calls(sql, "age", _age)
    # regexp_replace(s, p, r, 'flags'): PG flags — 'g' is Spark's default
    # (global) and drops; 'i' folds into the pattern as (?i).
    def _regexp_flags(a: list[str]) -> str | None:
        if len(a) != 4 or not a[3].strip().startswith("'"):
            return None
        flags = _strip_quotes(a[3].strip())
        if not set(flags) <= {"g", "i"}:
            return None
        pat = a[1].strip()
        if "i" in flags and pat.startswith("'"):
            pat = f"'(?i){pat[1:-1]}'"
        return f"regexp_replace({a[0].strip()}, {pat}, {a[2].strip()})"

    sql = _rewrite_calls(sql, "regexp_replace", _regexp_flags)
    # x AT TIME ZONE 'z' → at-timezone shift (functions.rs:777-818: render
    # the UTC-stored instant as z-local wall-clock). The operand is the
    # token-unit to the left (cast/paren/identifier/literal).
    def _at_tz(m: "re.Match[str]") -> str:
        return f"from_utc_timestamp({m.group(1)}, {m.group(2)})"

    sql = re.sub(
        r"((?:CAST\s*\([^()]*\)|[A-Za-z_][\w\.]*\s*\([^()]*\)|[A-Za-z_][\w\.]*|"
        r"'[^']*'|\([^()]*\)))\s+AT\s+TIME\s+ZONE\s+('[^']*')",
        _at_tz,
        sql,
        flags=re.IGNORECASE,
    )
    # FETCH FIRST/NEXT n ROWS ONLY (SQL-standard LIMIT spelling) → LIMIT n
    sql = re.sub(
        r"(?is)\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)?\s*ROWS?\s+ONLY\b",
        lambda m: f"LIMIT {m.group(1) or 1}",
        sql,
    )
    # x [NOT] SIMILAR TO 'pat' → x [NOT] RLIKE '^(?:converted)$'
    sql = re.sub(
        r"(?is)\b(NOT\s+)?SIMILAR\s+TO\s+'((?:''|[^'])*)'",
        lambda m: f"{m.group(1) or ''}RLIKE '{_similar_to_regex(m.group(2))}'",
        sql,
    )
    # lit = ANY(col) → array_contains(col, lit). An UNCAST brace literal
    # on the array side — `x = ANY('{a,b}')`, PG types the elements from
    # the LHS (unknown-literal resolution) — rewrites to an IN-list of
    # QUOTED literals instead: Spark's comparison coercion then resolves
    # each element against the LHS type exactly like PG (double_col IN
    # ('1.50') casts to 1.5; text_col IN ('1.50') compares text), which
    # no fixed array() element typing can do (review r11 — bare doubles
    # broke text compares, quoted text broke numeric = ANY). A ::type[]
    # cast is already rendered as a TYPED array by the cast pass upstream.
    def _any_rewrite(m: "re.Match[str]") -> str:
        needle, side = m.group(1), m.group(2).strip()
        # = ANY(SELECT …) is PG's IN-subquery spelling — array_contains
        # over a subquery is a parse error; leave verbatim (review r12)
        if re.match(r"(?is)^\s*SELECT\b", side):
            return m.group(0)
        m2 = re.fullmatch(r"'(\{(?:''|[^'])*\})'", side)
        if m2:
            try:
                parsed = _parse_pg_array_literal(m2.group(1).replace("''", "'"))
            except ValueError:
                # malformed literal: leave verbatim for the analysis error
                return f"array_contains({side}, {needle})"
            if all(x is None or isinstance(x, str) for x in parsed):
                if not parsed:
                    return "FALSE"  # = ANY('{}') is FALSE for every LHS
                elems = ", ".join(
                    "NULL" if x is None else "'" + x.replace("'", "''") + "'"
                    for x in parsed
                )
                return f"{needle} IN ({elems})"
            # nested (multi-dim) literal: typed array rendering
            side = _pg_array_literal_sql(m2.group(1).replace("''", "'"), "STRING")
        return f"array_contains({side}, {needle})"

    # needle boundary (?<![\w.']): without it `1.5 = ANY(vals)` matched
    # only the trailing '5', leaving '1.' behind and corrupting the
    # statement; decimals now match whole (review r12)
    sql = re.sub(
        r"(?<![\w.'])('(?:''|[^'])*'|[A-Za-z_][\w\.]*|\d+(?:\.\d+)?)"
        r"\s*=\s*ANY\s*\(\s*((?:[^()]|\([^()]*\))+?)\s*\)",
        _any_rewrite,
        sql,
        flags=re.IGNORECASE,
    )
    # ARRAY[...] → array(...)
    sql = re.sub(r"\bARRAY\s*\[([^\[\]]*)\]", r"array(\1)", sql, flags=re.IGNORECASE)
    # a !~ 'p' / a !~* 'p' → a NOT RLIKE … (before ~*/~ so the tail of
    # !~* never matches the positive rules)
    sql = re.sub(
        r"!~\*\s*'((?:''|[^'])*)'", lambda m: f"NOT RLIKE '(?i){m.group(1)}'", sql
    )
    sql = re.sub(r"!~\s*'((?:''|[^'])*)'", lambda m: f"NOT RLIKE '{m.group(1)}'", sql)
    # a ~* 'p' → a RLIKE '(?i)p'   |   a ~ 'p' → a RLIKE 'p'
    sql = re.sub(
        r"~\*\s*'((?:''|[^'])*)'", lambda m: f"RLIKE '(?i){m.group(1)}'", sql
    )
    sql = re.sub(r"(?<![~!<>=*])~\s*'((?:''|[^'])*)'", lambda m: f"RLIKE '{m.group(1)}'", sql)
    # PG array-typed CAST: CAST(x AS VARCHAR[]) → CAST(x AS ARRAY<STRING>)
    sql = re.sub(
        r"(?i)\bAS\s+([A-Za-z_]+)\s*\[\s*\]",
        lambda m: f"AS ARRAY<{PG_TYPE_MAP.get(m.group(1).lower(), m.group(1))}>",
        sql,
    )
    _operand = (
        r"CAST\s*\((?:[^()]|\([^()]*\))*\)|"
        r"[A-Za-z_][\w\.]*(?:\([^()]*\))?|array\([^()]*\)"
    )
    # a && b → arrays_overlap(a, b) for simple operands
    sql = re.sub(
        rf"({_operand})\s*&&\s*({_operand})",
        r"arrays_overlap(\1, \2)",
        sql,
        flags=re.IGNORECASE,
    )
    # a @> b (PG array containment: a ⊇ b) → no element of b missing from a
    sql = re.sub(
        r"([A-Za-z_][\w\.]*(?:\([^()]*\))?|array\([^()]*\))\s*@>\s*"
        r"(CAST\s*\((?:[^()]|\([^()]*\))*\)|[A-Za-z_][\w\.]*(?:\([^()]*\))?|array\([^()]*\))",
        r"(size(array_except(\2, \1)) = 0)",
        sql,
        flags=re.IGNORECASE,
    )
    # PG 1-based subscripts → element_at (Spark's native arr[n] subscript
    # is 0-based, so EVERY PG integer subscript must translate): both the
    # call form fn(...)[n] and the bare-column form col[n] — the old loop
    # handled only the call form, so `SELECT tags[1]` silently returned
    # the SECOND element, and its paren backtrack was not quote-aware
    # (a '(' inside a string literal broke the balance) (review r12).
    sql = _subscripts_to_element_at(sql)
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


# Translation cache — the analog of the reference's PlanCacheHook
# (plan_cache.rs:1-31, an LRU of parsed plans keyed on canonical SQL): the
# token-pass translation is pure given (sql, resolved variant-column set),
# so a repeated dashboard statement pays the regex/token passes once per
# session instead of per execution. Catalyst's own analysis still runs per
# statement — this caches the REWRITE layer, the part the engine owns.
# The key EMBEDS the variant-column set a translation was produced under
# (global ∪ session registrations), so two sessions with different
# registrations can never replay each other's translations and no
# generation counter or invalidation hook is needed.
_TRANSLATION_CACHE: dict[tuple[str, frozenset[str]], str] = {}
_TRANSLATION_CACHE_MAX = 4096


_STMT_TABLE_RE = re.compile(
    r"(?is)\b(?:FROM|JOIN|INTO|UPDATE)\s+([A-Za-z_]\w*)"
)


# per-session memo of {table → {column (lower) → is_variant}} so the
# statement-scoped narrowing doesn't pay a JVM catalog round-trip per
# statement on 100%-cache-hit pgwire traffic (review r10). POSITIVE
# resolutions only; SltEnv._refresh invalidates a table's entry whenever
# its view is (re)registered — the only path that can change a mounted
# relation's column types (CREATE/ALTER/refresh all re-register).
_TABLE_TYPE_MEMO: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def invalidate_table_types(spark, name: str | None = None) -> None:
    memo = _TABLE_TYPE_MEMO.get(spark)
    if memo is None:
        return
    if name is None:
        memo.clear()
    else:
        memo.pop(name.lower(), None)


def _table_variant_types(spark, t: str) -> dict[str, bool] | None:
    memo = _TABLE_TYPE_MEMO.setdefault(spark, {})
    hit = memo.get(t.lower())
    if hit is not None:
        return hit
    from pyspark.sql import types as _T

    try:
        fields = spark.table(t).schema.fields
    except Exception:  # noqa: BLE001 — alias/CTE/unknown: no evidence
        return None  # not cached: the table may be created later
    out = {
        f.name.lower(): isinstance(f.dataType, _T.VariantType) for f in fields
    }
    memo[t.lower()] = out
    return out


def _narrow_variant_cols(spark, sql: str, cols: frozenset[str]) -> frozenset[str]:
    """Statement-scoped variant binding: registration is by bare column
    NAME per session, so a plain TEXT column that happens to share a name
    with some other table's Variant field (`body`, `attributes`, …) would
    otherwise translate through to_json()/variant operators and fail
    analysis. For each relation the statement references, resolve the
    actual field types; a registered name POSITIVELY seen as non-Variant
    in the statement's tables — and not Variant in any of them — drops
    out of the active set. Unresolvable names (aliases, CTEs, missing
    views) contribute no evidence, so behavior degrades to the session-
    wide set, never the other way."""
    mentioned = [
        c
        for c in cols
        if re.search(
            # bare mention, or ONE-level relation-qualified (`t.col`) —
            # a statement whose only reference is qualified previously
            # skipped narrowing and misrouted a plain text column through
            # variant operators (review r12); deeper dotted paths are
            # struct-field accesses and still don't count
            rf"(?i)(?<![\w.])(?:[A-Za-z_]\w*\.)?{re.escape(c)}(?!\w)",
            sql,
        )
    ]
    if not mentioned:
        return cols
    # a CTE or derived relation can expose a Variant under ANY alias
    # (`WITH j AS (SELECT attributes AS body …)`) that this pass cannot
    # resolve — but a base table's plain column of the same name WOULD
    # contribute plain evidence and wrongly drop the registration. Any
    # statement defining derived relations keeps the session-wide set
    # (degrade direction only, VERDICT r10 #7). The derived-source probe
    # requires the paren to open a SELECT/VALUES/WITH: a bare `FROM (`
    # also appears in EXTRACT(YEAR FROM (expr)) / SUBSTRING(x FROM (n)),
    # which define nothing and must keep narrowing (review r11); the
    # leading-comma alternative catches `FROM a, (SELECT …) b`.
    if re.match(r"(?is)^\s*WITH\b", sql) or re.search(
        r"(?is)(?:\bFROM\b|\bJOIN\b|,)\s*\(\s*(?:SELECT|VALUES|WITH)\b", sql
    ):
        return cols
    names = set(_STMT_TABLE_RE.findall(sql))
    if not names:
        return cols
    variant_evidence: set[str] = set()
    plain_evidence: set[str] = set()
    for t in names:
        types = _table_variant_types(spark, t)
        if types is None:
            continue
        for lf, is_variant in types.items():
            if lf in mentioned:
                (variant_evidence if is_variant else plain_evidence).add(lf)
    return frozenset(cols - (plain_evidence - variant_evidence))


def pg_to_spark_sql(sql: str, spark=None) -> str:
    """Translate a PG-dialect SQL string to Spark SQL text. With `spark`,
    the translation binds Variant operators against that session's
    registered Variant columns (plus global registrations), narrowed to
    the STATEMENT's own tables when a registered name resolves to a
    non-Variant column there (see _narrow_variant_cols); without, the
    global set alone."""
    cols = _variant_cols_for(spark)
    if cols and spark is not None:
        cols = _narrow_variant_cols(spark, sql, cols)
    key = (sql, cols)
    hit = _TRANSLATION_CACHE.get(key)
    if hit is not None:
        return hit
    prev = getattr(_ACTIVE_VARIANT, "cols", None)
    _ACTIVE_VARIANT.cols = cols
    try:
        out = _pg_to_spark_sql_uncached(sql)
    finally:
        _ACTIVE_VARIANT.cols = prev
    if len(_TRANSLATION_CACHE) >= _TRANSLATION_CACHE_MAX:
        _TRANSLATION_CACHE.clear()  # simple bound; refill is cheap
    _TRANSLATION_CACHE[key] = out
    return out


def _pg_to_spark_sql_uncached(sql: str) -> str:
    stripped = sql.lstrip()
    if re.match(r"(?i)^ABORT\b", stripped):
        sql = sql[: len(sql) - len(stripped)] + "ROLLBACK" + stripped[5:]
    sql = _translate_distinct_on(sql)
    sql = _translate_select_list_unnest(sql)
    sql = _translate_unnest(sql)
    # ARRAY[...] → array(...) BEFORE the cast pass, so ARRAY[..]::VARCHAR[]
    # presents a ')'-terminated operand to the `::` translator.
    sql = re.sub(r"\bARRAY\s*\[([^\[\]]*)\]", r"array(\1)", sql, flags=re.IGNORECASE)
    toks = _tokenize(sql)
    # PG standard strings treat backslash literally; Spark's default parser
    # treats it as an escape. Double backslashes inside string literals so
    # the PG text survives verbatim (also the right semantics for ~ regex
    # literals: PG '\d+' must reach Spark's RLIKE as \d+).
    toks = [
        t if not t.startswith("'") else t.replace("\\", "\\\\") for t in toks
    ]
    # PG double-quoted identifiers → Spark backticks ("Name" → `Name`;
    # "" escapes a quote in PG, `` escapes a backtick in Spark)
    toks = [
        t
        if not (t.startswith('"') and t.endswith('"') and len(t) >= 2)
        else "`" + t[1:-1].replace('""', '"').replace("`", "``") + "`"
        for t in toks
    ]
    toks = _translate_arrows(toks)
    toks = _translate_variant_compare(toks)
    toks = _translate_casts(toks)
    return _translate_fn_calls(_translate_misc("".join(toks)))


# ── PG settings surface (SET / SHOW / set_config / current_setting /
# pg_settings — database.rs:3283-3348 registers the same plumbing) ────────
#
# Settings are recorded per SparkSession and echoed back with PG behavior;
# they do NOT re-configure the engine (the engine contract pins UTC
# rendering and µs timestamps — the reference likewise serves a fixed
# server configuration and keeps these for client compatibility).

_DEFAULT_SETTINGS: dict[str, str] = {
    "timezone": "UTC",
    "search_path": "public",
    "server_version": "16.4",
    "application_name": "",
    "client_encoding": "UTF8",
    "standard_conforming_strings": "on",
    # the engine is auto-commit with snapshot-isolated reads; PG's
    # default spelling, served to JDBC handshakes via the multi-word SHOW
    "transaction_isolation": "read committed",
    "default_transaction_isolation": "read committed",
    "session_authorization": "postgres",
    # PG default: disabled. When set (ms), a wire BEGIN declares it as
    # the transaction's pending-group abort threshold, so an idle-in-
    # transaction session ages out on the PG-documented knob instead of
    # the engine's day-long interactive default (server.py BEGIN path).
    "idle_in_transaction_session_timeout": "0",
    # PG default: disabled. When set (ms), the pgwire server arms a
    # watchdog per statement that cancels the connection's Spark jobs at
    # the deadline — the statement errors with PG's 57014 timeout
    # message and the connection stays usable (server.py watchdog).
    "statement_timeout": "0",
}

_SESSION_SETTINGS: dict[tuple, dict[str, str]] = {}
# PG scopes SET to the CONNECTION, not the server: the pgwire handler
# binds a per-connection token on its thread (set_settings_scope), so two
# wire sessions never see each other's SETs; sessionless callers (tests,
# notebooks) share the None scope — the old per-SparkSession behavior.
_SETTINGS_SCOPE = _threading.local()


def set_settings_scope(token: str | None) -> None:
    _SETTINGS_SCOPE.token = token


def drop_settings_scope(spark, token: str) -> None:
    """Forget a disconnected connection's settings (PG: session state dies
    with the backend)."""
    _SESSION_SETTINGS.pop((id(spark), token), None)


def _settings_key(spark) -> tuple:
    return (id(spark), getattr(_SETTINGS_SCOPE, "token", None))


def _settings_for(spark) -> dict[str, str]:
    return _SESSION_SETTINGS.setdefault(_settings_key(spark), dict(_DEFAULT_SETTINGS))


def _setting_literal(raw: str) -> str:
    raw = raw.strip()
    if raw.startswith("'"):
        # _strip_quotes already collapses '' → '; a second replace
        # double-unescaped values containing literal quote pairs
        # (review r12)
        return _strip_quotes(raw)
    return raw


def _apply_settings_statement(spark, stripped: str):
    """Handle SET / RESET / SHOW statements. Returns a DataFrame for SHOW,
    True for a handled side-effect statement, None if not a settings
    statement."""
    # Transaction verbs: every pgwire client library emits these (psycopg2
    # sends BEGIN on the first statement unless autocommit). The engine is
    # auto-commit — each statement's commit-log publish is already atomic —
    # so they complete as no-ops, exactly how the reference's pgwire layer
    # acks them. DISCARD resets session state (settings) per PG semantics.
    if re.match(r"(?is)^(BEGIN|END|COMMIT|ROLLBACK|ABORT|START\s+TRANSACTION)\b", stripped):
        # Only KNOWN transaction modifiers may trail the verb; anything else
        # (SAVEPOINT forms, COMMIT PREPARED, a compound `BEGIN ; DELETE …`)
        # must NOT be silently acked as a no-op — the client would believe
        # work executed (pgwire_handlers.rs:648 only aliases ABORT→ROLLBACK
        # and passes statements through).
        modifier = (
            r"(WORK|TRANSACTION|AND\s+(NO\s+)?CHAIN|READ\s+(ONLY|WRITE)|"
            r"(NOT\s+)?DEFERRABLE|ISOLATION\s+LEVEL\s+(SERIALIZABLE|"
            r"REPEATABLE\s+READ|READ\s+(COMMITTED|UNCOMMITTED)))"
        )
        if re.match(
            r"(?is)^(BEGIN|END|COMMIT|ROLLBACK|ABORT|START\s+TRANSACTION)"
            rf"(\s*,?\s+{modifier})*\s*$",
            stripped,
        ):
            return True
        raise ValueError(f"unsupported transaction statement: {stripped!r}")
    if re.match(r"(?is)^DISCARD\s+(ALL|PLANS|SEQUENCES|TEMP|TEMPORARY)$", stripped):
        _SESSION_SETTINGS.pop(_settings_key(spark), None)
        return True
    st = _settings_for(spark)
    m = re.match(r"(?is)^SET\s+(?:SESSION\s+|LOCAL\s+)?TIME\s+ZONE\s+(.+)$", stripped)
    if m:
        st["timezone"] = _setting_literal(m.group(1))
        return True
    m = re.match(
        r"(?is)^SET\s+(?:SESSION\s+|LOCAL\s+)?([A-Za-z_][\w.]*)\s*(?:TO|=)\s*(.+)$",
        stripped,
    )
    if m:
        st[m.group(1).lower()] = _setting_literal(m.group(2))
        return True
    m = re.match(r"(?is)^RESET\s+([A-Za-z_][\w.]*)$", stripped)
    if m:
        name = m.group(1).lower()
        st[name] = _DEFAULT_SETTINGS.get(name, "")
        return True
    m = re.match(r"(?is)^SHOW\s+TIME\s+ZONE$", stripped)
    if m:
        return spark.createDataFrame([(st["timezone"],)], "TimeZone string")
    if re.match(r"(?is)^SHOW\s+TABLES$", stripped):
        # DataFusion's SHOW TABLES catalog listing (enabled by
        # information_schema, database.rs:2988) — NOT a settings variable
        # named 'tables', which the generic SHOW below would fabricate.
        _ensure_information_schema(spark)
        return spark.sql(
            "SELECT table_catalog, table_schema, table_name, table_type "
            "FROM __info_schema_tables ORDER BY table_name"
        )
    m = re.match(r"(?is)^SHOW\s+ALL$", stripped)
    if m:
        rows = sorted(st.items())
        return spark.createDataFrame(rows, "name string, setting string")
    # PG multi-word SHOW spellings (JDBC drivers issue these during the
    # connection handshake; the single-word pattern below missed them and
    # the statement leaked to the Spark parser as query text — review r12)
    m = re.match(
        r"(?is)^SHOW\s+(TRANSACTION\s+ISOLATION\s+LEVEL|SESSION\s+AUTHORIZATION"
        r"|STANDARD\s+CONFORMING\s+STRINGS|DEFAULT\s+TRANSACTION\s+ISOLATION)$",
        stripped,
    )
    if m:
        name = re.sub(r"\s+", "_", m.group(1).lower())
        # PG's column name for SHOW TRANSACTION ISOLATION LEVEL
        name = {
            "transaction_isolation_level": "transaction_isolation",
        }.get(name, name)
        return spark.createDataFrame([(st.get(name, ""),)], f"{name} string")
    m = re.match(r"(?is)^SHOW\s+([A-Za-z_][\w.]*)$", stripped)
    if m:
        name = m.group(1).lower()
        return spark.createDataFrame([(st.get(name, ""),)], f"{name} string")
    return None


def _apply_settings_functions(spark, sql: str) -> str:
    """Rewrite set_config('n','v',is_local) (side effect + returns value)
    and current_setting('n') to string literals against the session store —
    the same eager resolution the reference's scalar UDFs perform."""
    st = _settings_for(spark)

    def _q(v: str) -> str:
        return "'" + v.replace("'", "''") + "'"

    def _set_config(a: list[str]):
        if len(a) != 3:
            return None
        name = _strip_quotes(a[0]).lower()
        # _strip_quotes already collapses '' → ' (review r12: the second
        # replace double-unescaped values with literal quote pairs)
        value = _strip_quotes(a[1])
        st[name] = value
        return _q(value)

    def _current_setting(a: list[str]):
        if len(a) not in (1, 2):
            return None
        name = _strip_quotes(a[0]).lower()
        if name not in st and len(a) == 2 and a[1].strip().lower() == "true":
            return "CAST(NULL AS STRING)"
        return _q(st.get(name, ""))

    sql = _rewrite_calls(sql, "set_config", _set_config)
    return _rewrite_calls(sql, "current_setting", _current_setting)


def _apply_clock_functions(sql: str) -> str:
    """Rewrite the engine-clock SQL functions (functions.rs:505-535:
    timefusion_set_clock / timefusion_advance_clock / timefusion_now_micros)
    to eager bigint literals — the same volatile-UDF semantics, resolved
    once per statement."""
    from timefusion_spark import clock

    def _set(a: list[str]):
        if len(a) != 1:
            return None
        return str(clock.set_rfc3339(_strip_quotes(a[0]))) + "L"

    def _advance(a: list[str]):
        if len(a) != 1:
            return None
        return str(clock.advance_micros(int(a[0].strip()))) + "L"

    def _now(a: list[str]):
        if a and a != [""]:
            return None
        return str(clock.now_micros()) + "L"

    sql = _rewrite_calls(sql, "timefusion_set_clock", _set)
    sql = _rewrite_calls(sql, "timefusion_advance_clock", _advance)
    return _rewrite_calls(sql, "timefusion_now_micros", _now)


def _ensure_pg_settings_view(spark) -> None:
    rows = sorted(_settings_for(spark).items())
    spark.createDataFrame(rows, "name string, setting string").createOrReplaceTempView(
        "pg_settings"
    )


_COUNT_RANGE_RE = re.compile(
    r"(?is)^SELECT\s+COUNT\s*\(\s*\*\s*\)(?:\s+AS\s+(\w+))?\s+"
    r"FROM\s+([A-Za-z_]\w*)\s+WHERE\s+"
    r"(\w+)\s*>=\s*(?:TIMESTAMP\s*)?'([^']+)'\s+AND\s+"
    r"\3\s*<\s*(?:TIMESTAMP\s*)?'([^']+)'\s*$"
)


def _apply_count_statement(spark, stripped: str, tables):
    """Time-range COUNT(*) pushdown — the reference's count-index
    interception (count_pushdown.rs try_count_pushdown + the logical
    count index): `SELECT COUNT(*) FROM t WHERE ts >= '…' AND ts < '…'`
    on a registered storage table routes to Table.count_range, which
    serves fully-covered files from commit-log stats and scans only
    boundaries. Only the exact half-open two-bound shape on the table's
    declared time column is intercepted; anything else plans normally
    (decline-on-doubt lives inside count_range itself)."""
    m = _COUNT_RANGE_RE.match(stripped)
    if not m:
        return None
    alias, name, col, lo, hi = m.groups()
    tbl = (tables or {}).get(name)
    if tbl is None or col != tbl.schema.time_column:
        return None
    n = tbl.count_range(lo, hi)
    return spark.createDataFrame([(n,)], f"{alias or 'count'} bigint")


_TM_PRED_RE = re.compile(
    r"(?is)^text_match\(\s*([A-Za-z_]\w*)\s*,\s*'([^']*)'\s*\)$"
)
_EQ_PRED_RE = re.compile(r"(?is)^([A-Za-z_]\w*)\s*=\s*'([^']*)'$")
_LIKE_PRED_RE = re.compile(
    r"(?is)^([A-Za-z_]\w*)\s+(NOT\s+)?(I?LIKE)\s+'([^']*)'$"
)
# col [::text] ~ 'pat' / ~* 'pat' — routable only when the pattern is a
# plain literal substring (regex_literal_substring): this is the shape
# monoscope renders KQL has/contains into (tantivy_rewriter.rs:41-47).
# The negated forms (!~, !~*) never route.
_REGEX_PRED_RE = re.compile(
    r"(?is)^([A-Za-z_]\w*)(?:\s*::\s*text)?\s*(!?~\*?)\s*'([^']*)'$"
)
# col [NOT] IN ('a', 'b', …) — string-literal lists only
_IN_PRED_RE = re.compile(
    r"(?is)^([A-Za-z_]\w*)\s+(NOT\s+)?IN\s*\(\s*('[^']*'(?:\s*,\s*'[^']*')*)\s*\)$"
)
# col = ANY('{a,b}') / = ANY(ARRAY['a','b']) — the PG-array membership
# twin of IN (what psycopg/JDBC emit for list binds); routes identically
_ANY_PRED_RE = re.compile(
    r"(?is)^([A-Za-z_]\w*)\s*=\s*ANY\s*\(\s*"
    r"(?:'(\{[^']*\})'(?:\s*::\s*\w+\s*\[\s*\])?"
    r"|ARRAY\s*\[\s*('[^']*'(?:\s*,\s*'[^']*')*)\s*\])\s*\)$"
)
# IN-lists longer than this never route (tantivy_rewriter.rs:135)
MAX_ROUTED_IN_LIST = 100

_REGEX_META_RE = re.compile(r"[\\^$.|?*+()\[\]{}]")


def _classify_like(pattern: str) -> tuple[str, str] | None:
    """Classify a LIKE/ILIKE pattern into the shapes the routing table
    serves (tantivy_rewriter.rs:29-48 + classify_like_pattern):
    ('exact'|'prefix'|'suffix'|'substring', literal_chunk), or None to
    DECLINE — backslash (PG's default escape), `_` (no tantivy
    primitive), empty chunks, and multi-chunk patterns like 'a%b' all
    fall back to the scan path (correctness preserved by the original
    predicate; these return None, never a wrong route)."""
    if "\\" in pattern or "_" in pattern:
        return None
    lead, trail = pattern.startswith("%"), pattern.endswith("%")
    core = pattern.strip("%")
    if not core or "%" in core:
        return None
    if lead and trail:
        return ("substring", core)
    if trail:
        return ("prefix", core)
    if lead:
        return ("suffix", core)
    return ("exact", core)


# Observability for tests: bumped each time a statement is served from a
# text-index sidecar instead of the scan path.
TEXT_INDEX_SERVED = 0


def _route_text_pred(tbl, conj: str):
    """Try to serve ONE conjunct from a fresh text-index sidecar.
    Returns the candidate-pruned, predicate-reapplied DataFrame, or None
    to decline. The routing table is the reference's
    (tantivy_rewriter.rs:29-48), by the TARGET COLUMN's tokenizer:

      shape            | raw                  | ngram3
      -----------------|----------------------|---------------------------
      text_match(c,'q')| decline              | trigram AND-of-tokens
      c = 'lit'        | term probe           | decline (bloom/stats)
      c LIKE 'lit'     | term probe           | grams of lit (>=3 chars)
      c LIKE 'pre%'    | term-range startswith| grams of pre (>=3 chars)
      c LIKE '%suf'    | decline              | grams of suf (>=3 chars)
      c LIKE '%mid%'   | decline              | grams of mid (>=3 chars)
      c ILIKE <any>    | decline              | lowercased grams, >=3 chars
      c IN ('a','b')   | OR of term probes    | decline (bloom/stats)
                         (<= MAX_ROUTED_IN_LIST items)
      c [::text] ~ 's' | decline              | grams of s — ONLY when s is
      c [::text] ~* 's'|                        a plain literal substring
                                                (regex_literal_substring)
      c NOT LIKE / !~ /| decline              | decline (negation has no
      NOT IN             term form)

    Every route re-applies the ORIGINAL predicate over the pruned rows
    (additive contract, tantivy_rewriter.rs invariant #1), so the answer
    is byte-identical to the scan path even with a stale-over-selecting
    or lowercase-folded index."""
    from timefusion_spark.storage.maintenance import text_index_for

    from pyspark.sql import functions as F  # noqa: PLC0415 — local by style

    kind = None
    in_terms: list[str] | None = None
    if m := _TM_PRED_RE.match(conj):
        col, arg = m.groups()
        kind = "text_match"
    elif m := _EQ_PRED_RE.match(conj):
        col, arg = m.groups()
        kind = "eq"
    elif m := _LIKE_PRED_RE.match(conj):
        col, neg, op, arg = m.groups()
        if neg:
            return None  # negation has no term form
        kind = op.lower()
    elif m := _REGEX_PRED_RE.match(conj):
        col, op, arg = m.groups()
        if op.startswith("!"):
            return None  # negation has no term form
        kind = op  # "~" or "~*"
    elif m := _IN_PRED_RE.match(conj):
        col, neg, items = m.groups()
        if neg:
            return None  # NOT IN has no term form
        in_terms = re.findall(r"'([^']*)'", items)
        if not in_terms or len(in_terms) > MAX_ROUTED_IN_LIST:
            return None
        arg = ""
        kind = "in"
    elif m := _ANY_PRED_RE.match(conj):
        col, brace, arr = m.groups()
        if brace is not None:
            try:
                parsed = _parse_pg_array_literal(brace)
            except ValueError:
                return None
            if any(not isinstance(x, str) for x in parsed):
                return None  # nested / NULL elements: scan path
            in_terms = parsed
        else:
            in_terms = re.findall(r"'([^']*)'", arr)
        if not in_terms or len(in_terms) > MAX_ROUTED_IN_LIST:
            return None
        arg = ""
        kind = "in"
    else:
        return None
    found = text_index_for(tbl, col)
    if found is None:
        return None
    sidecar, meta = found
    tokenizer = meta.get("tokenizer", "ngram3")
    id_col = meta["id_col"]
    from timefusion_spark.operators.text_index import (
        raw_prefix_search,
        raw_term_search,
        raw_terms_search,
        trigram_like_search,
        trigram_search,
    )

    docs, index = tbl.read(), sidecar.read()
    if kind == "text_match":
        if tokenizer != "ngram3":
            return None  # raw field: substring probe → scan path
        return trigram_search(docs, index, arg, id_col=id_col, text_col=col)
    if kind == "eq":
        if tokenizer != "raw":
            return None  # ngram3 field: equality → bloom/stats planning
        return raw_term_search(docs, index, arg, id_col=id_col, text_col=col)
    if kind == "in":
        if tokenizer != "raw":
            return None  # IN routes as OR of term probes: raw only
        return raw_terms_search(docs, index, in_terms, id_col=id_col, text_col=col)
    if kind in ("~", "~*"):
        # routable only as a plain literal substring (the reference's
        # regex_literal_substring gate): any metacharacter — anchors,
        # classes, escapes — leaves the predicate to the scan path
        if tokenizer != "ngram3" or _REGEX_META_RE.search(arg):
            return None
        pred = (
            F.col(col).rlike(arg)
            if kind == "~"
            else F.col(col).rlike("(?i)" + arg)
        )
        return trigram_like_search(docs, index, arg, pred, id_col=id_col)
    shape = _classify_like(arg)
    if shape is None:
        return None
    what, lit = shape
    if tokenizer == "raw":
        if kind != "like":  # ILIKE needs case folding a raw term lacks
            return None
        if what == "exact":
            return raw_term_search(docs, index, lit, id_col=id_col, text_col=col)
        if what == "prefix":
            return raw_prefix_search(docs, index, lit, id_col=id_col, text_col=col)
        return None  # %suf / %mid%: no term form on a whole-value index
    # ngram3: every shape serves via grams of the literal chunk when a
    # full trigram exists (NGRAM_MIN_QUERY_LEN analog — trigram_like_search
    # returns None for sub-trigram literals and the route declines)
    pred = (
        F.col(col).like(arg) if kind == "like" else F.col(col).ilike(arg)
    )
    return trigram_like_search(docs, index, lit, pred, id_col=id_col)


def _apply_text_match_statement(spark, stripped: str, tables):
    """Index-first serving of text predicates when a FRESH sidecar exists
    for the probed column — the TantivyPredicateRewriter analog
    (tantivy_rewriter.rs:23-26: the index is an additive AND prefilter,
    the original predicate ALWAYS re-applies, so the answer is
    byte-identical to the scan path). Statement envelope: `SELECT
    COUNT(*)` or `SELECT *` over one table; the WHERE splits into
    top-level AND conjuncts, the FIRST index-servable conjunct routes
    (see _route_text_pred's tokenizer table) and the REMAINING conjuncts
    re-apply over the pruned rows through normal shim planning — so
    `WHERE project_id='p1' AND body LIKE '%needle%'` is served
    index-first too (VERDICT r9 wrong-#3). Anything unroutable plans
    normally through the registered text_match SQL function (the
    correctness fallback, udf.rs:1-60). A missing or STALE sidecar (base
    table advanced past the build version) declines: the index may only
    over-select, never miss a newer row.

    Envelope (round 11, generalized): any single-table SELECT with a
    WHERE — arbitrary projection, GROUP BY / ORDER BY / HAVING / LIMIT /
    OFFSET / FETCH / WINDOW tails all serve, because the ENTIRE
    statement re-plans over the candidate view aliased back to the table
    name with the FULL original WHERE re-applied (routed conjunct
    included): the index can only over-select, never change the answer.
    Declines: joins / derived sources, set ops, locking clauses, and a
    TOP-LEVEL OR in the WHERE (routing one AND-conjunct under an OR
    would change precedence — VERDICT r10 #1)."""
    from timefusion_spark import slt as _slt

    m = re.match(r"(?is)^SELECT\s+(.+)$", stripped)
    if not m:
        return None
    parts = _slt._split_top_kw(m.group(1), "FROM")
    if len(parts) != 2:
        return None  # no table, or multiple top-level FROMs (set ops)
    proj, after = parts[0].strip(), parts[1].strip()
    fm = re.match(r"(?is)^([A-Za-z_]\w*)\s+WHERE\s+(.+)$", after)
    if not fm:
        return None  # joins / aliases / derived sources: scan path
    name, rest = fm.groups()
    tbl = (tables or {}).get(name)
    if tbl is None:
        return None
    # cheap early decline: no text-index sidecar directory → nothing can
    # route, and the per-conjunct probes below would otherwise pay a
    # commit-log LISTING (freshness check) on EVERY single-table SELECT
    # over an unindexed table — measurable p50 latency on the hot pgwire
    # path now that the envelope accepts arbitrary projections (r11)
    import os as _os

    from timefusion_spark.storage.maintenance import TEXT_INDEX_DIR

    if not _os.path.isdir(_os.path.join(tbl.path, TEXT_INDEX_DIR)):
        return None
    # table_changes() is substituted by a LATER pg_sql pass the re-plan
    # would bypass — a routed statement referencing it would fail with an
    # unresolved relation where the scan path serves it; decline
    if re.search(r"(?i)\btable_changes\s*\(", stripped):
        return None
    # _split_top (not _split_top_kw): the keyword may sit flush against
    # ')' or a closing quote — `…)UNION SELECT` is valid SQL the
    # whitespace-bounded splitter misses (review r12, ADVICE r11 #1 class)
    for kw in ("UNION", "INTERSECT", "EXCEPT", "FOR"):
        if (
            len(_slt._split_top(rest, kw)) > 1
            or len(_slt._split_top(proj, kw)) > 1
        ):
            return None
    # split the WHERE region from trailing clauses; the tail re-applies
    # verbatim in the re-planned statement, AFTER the re-verified
    # predicate — exactly the scan path's evaluation order
    where = rest
    for kw in ("GROUP", "ORDER", "HAVING", "LIMIT",
               "WINDOW", "OFFSET", "FETCH"):
        pieces = _slt._split_top(where, kw)
        if len(pieces) > 1:
            where = pieces[0]
    tail = rest[len(where):]
    # a top-level OR changes precedence: routing one AND-conjunct as a
    # prefilter would compute `like AND (a OR b)` where SQL means
    # `(like AND a) OR b` — decline so the additive contract
    # (tantivy_rewriter.rs:23-26: routing never changes answers) holds
    # for mixed AND/OR statements (VERDICT r10 #1). Punctuation-
    # permissive split: `…'%x%' AND lang='en' OR(author='bob')` has no
    # whitespace after OR, which the _split_top_kw form missed — the
    # LIKE conjunct routed and rows satisfying only the OR arm were
    # silently dropped (ADVICE r11 #1)
    if len(_slt._split_top(where, "OR")) > 1:
        return None

    hits = None
    for conj in _slt._split_top(where, "AND"):
        if conj.strip():
            hits = _route_text_pred(tbl, conj.strip())
            if hits is not None:
                break
    if hits is None:
        return None
    global TEXT_INDEX_SERVED
    TEXT_INDEX_SERVED += 1
    # The view name is UNIQUE per statement — concurrent pgwire
    # connections routing the same table must never read each other's
    # candidate frames — and dropped immediately: the returned DataFrame
    # captures the ANALYZED plan, not the view name. Column order is
    # pinned to the scan layout so `SELECT *` answers byte-identically.
    import uuid as _uuid

    view = f"__tf_textroute_{name}_{_uuid.uuid4().hex[:12]}"
    # schema fields ARE the scan's column order (Table.read selects
    # exactly them) — don't build a read() plan just to ask for .columns
    hits.select(*[f.name for f in tbl.schema.fields]).createOrReplaceTempView(view)
    try:
        # aliased back to the table's own name so qualified references
        # (`docs.lang='en'`) and correlated subqueries keep resolving
        # (VERDICT r10 #2); the full WHERE (routed conjunct included)
        # and any trailing clauses re-plan through the full shim dialect
        out = spark.sql(
            pg_to_spark_sql(
                f"SELECT {proj} FROM {view} AS {name} WHERE {where}{tail}",
                spark,
            )
        )
        cm = re.fullmatch(r"(?is)COUNT\(\s*\*\s*\)(?:\s+AS\s+(\w+))?", proj)
        if cm and not tail.strip():
            # bare-count column naming parity with the count-range
            # interception (and PG's default `count` label)
            out = out.toDF(cm.group(1) or "count")
        return out
    finally:
        spark.catalog.dropTempView(view)


def _apply_delta_statement(spark, rest: str, tables):
    """`DELTA HISTORY <t> [LIMIT n]` / `DELTA ACTIONS <t> VERSION n` /
    `DELTA RECOVERY AUDIT <t> VERSION n` — the reference's read-only
    commit-log introspection verbs (pgwire_handlers.rs:287-443 runners,
    449-520 parsers), served here from the table's own commit log. Arg
    grammar and bounds mirror the reference exactly: HISTORY's LIMIT
    defaults to 100 and must be 1..=10000; ACTIONS/RECOVERY AUDIT require
    a numeric VERSION; every result column is text (VARCHAR rows in the
    reference). RECOVERY AUDIT reconstructs, for each file REMOVED by
    `version`, its full pre-commit add entry from the version-1 snapshot
    — read-only, and it FAILS unless every removal has a source."""
    import datetime as _dt
    import json as _json
    import os as _os

    def _tbl(verb: str, name: str):
        t = (tables or {}).get(name)
        if t is None or not t.log.exists():
            raise ValueError(f"DELTA {verb}: open table '{name}': unknown table")
        return t

    def _entry(verb: str, tbl, name: str, version: int) -> dict:
        try:
            return tbl.log.entry(version)
        except FileNotFoundError:
            raise ValueError(
                f"DELTA {verb} '{name}' VERSION {version}: commit not found"
            ) from None

    parts = rest.split()
    verb = parts[0].upper() if parts else ""
    if verb == "HISTORY":
        if len(parts) < 2:
            raise ValueError(
                "DELTA HISTORY requires a table: DELTA HISTORY <table> [LIMIT <n>]"
            )
        name = parts[1]
        if len(parts) == 2:
            limit = 100
        elif len(parts) == 4 and parts[2].upper() == "LIMIT":
            try:
                limit = int(parts[3])
            except ValueError:
                raise ValueError(f"invalid DELTA HISTORY limit '{parts[3]}'") from None
            if not 1 <= limit <= 10_000:
                raise ValueError("DELTA HISTORY limit must be between 1 and 10000")
        else:
            raise ValueError("expected: DELTA HISTORY <table> [LIMIT <n>]")
        tbl = _tbl("HISTORY", name)
        latest = tbl.log.latest_version()
        rows = []
        for v in range(latest, max(latest - limit, -1), -1):
            rec = _entry("HISTORY", tbl, name, v)
            path = _os.path.join(tbl.log.log_dir, f"{v:08d}.json")
            ts = _dt.datetime.fromtimestamp(
                _os.path.getmtime(path), _dt.timezone.utc
            ).isoformat()
            op = rec.get("op", "")
            params = {
                "n_add": len(rec.get("add", [])),
                "n_remove": len(rec.get("remove", [])),
                **({"txn": rec["txn"]} if rec.get("txn") else {}),
                **({"group": rec["group"]["id"]} if rec.get("group") else {}),
            }
            # rows written by the commit, from the add-entries' footer
            # stats (the Delta commitInfo numOutputRows analog) — only
            # when every added file recorded stats, so the figure is
            # exact or absent, never an undercount
            row_counts = [
                (f.get("stats") or {}).get("rows") for f in rec.get("add", [])
            ]
            if row_counts and all(r is not None for r in row_counts):
                params["rows"] = int(sum(row_counts))
            rows.append((
                str(v),
                ts,
                op,
                str(v - 1) if v > 0 else "",
                str(op == "append" and not rec.get("remove")).lower(),
                _json.dumps(params, sort_keys=True),
                _json.dumps(rec, sort_keys=True),
            ))
        return spark.createDataFrame(
            rows,
            "version string, timestamp_utc string, operation string, "
            "read_version string, is_blind_append string, "
            "operation_parameters string, commit_info string",
        )
    if verb == "ACTIONS":
        if len(parts) != 4 or parts[2].upper() != "VERSION":
            raise ValueError("expected: DELTA ACTIONS <table> VERSION <n>")
        name = parts[1]
        try:
            version = int(parts[3])
            if version < 0:
                raise ValueError
        except ValueError:
            raise ValueError(f"invalid Delta version '{parts[3]}'") from None
        tbl = _tbl("ACTIONS", name)
        rec = _entry("ACTIONS", tbl, name, version)
        rows = []
        for f in rec.get("add", []):
            rows.append((
                str(version), "add", f["path"], str(f["size"]),
                _json.dumps({"add": f}, sort_keys=True),
            ))
        for p in rec.get("remove", []):
            rows.append((
                str(version), "remove", p, "",
                _json.dumps({"remove": {"path": p}}, sort_keys=True),
            ))
        info = {k: v for k, v in rec.items() if k not in ("add", "remove")}
        rows.append((
            str(version), "commitInfo", "", "", _json.dumps(info, sort_keys=True)
        ))
        return spark.createDataFrame(
            rows,
            "version string, action string, path string, size_bytes string, "
            "action_json string",
        )
    if verb == "RECOVERY":
        if len(parts) < 2 or parts[1].upper() != "AUDIT":
            raise ValueError(
                "DELTA RECOVERY supports only: "
                "DELTA RECOVERY AUDIT <table> VERSION <n>"
            )
        if len(parts) != 5 or parts[3].upper() != "VERSION":
            raise ValueError("expected: DELTA RECOVERY AUDIT <table> VERSION <n>")
        name = parts[2]
        try:
            version = int(parts[4])
            if version < 0:
                raise ValueError
        except ValueError:
            raise ValueError(f"invalid Delta version '{parts[4]}'") from None
        tbl = _tbl("RECOVERY AUDIT", name)
        rec = _entry("RECOVERY AUDIT", tbl, name, version)
        removed = set(rec.get("remove", []))
        if not removed:
            raise ValueError(
                f"DELTA RECOVERY AUDIT '{name}' VERSION {version}: "
                "commit removed no files"
            )
        if version == 0:
            raise ValueError("DELTA RECOVERY AUDIT cannot inspect before version 0")
        before = tbl.log.snapshot_at(version - 1)
        sources = {p: before.files[p] for p in removed if p in before.files}
        if len(sources) != len(removed):
            raise ValueError(
                f"DELTA RECOVERY AUDIT '{name}' VERSION {version}: "
                f"reconstructed {len(sources)} of {len(removed)} removed files"
            )
        rows = []
        for p in sorted(sources):
            add = {"path": p, "size": sources[p]}
            st = before.stats.get(p)
            if st:
                add["stats"] = st
            rows.append((
                str(version), p, str(sources[p]),
                _json.dumps({"add": add}, sort_keys=True),
            ))
        return spark.createDataFrame(
            rows,
            "removed_by_version string, path string, size_bytes string, "
            "source_add_json string",
        )
    raise ValueError("DELTA supports only: DELTA HISTORY <table> [LIMIT <n>]")


def _apply_admin_statement(spark, stripped: str, tables):
    """Admin verbs the reference intercepts before planning
    (pgwire_handlers.rs:634-640,768: FLUSH / OPTIMIZE / VACUUM; 449-520
    DELTA HISTORY / ACTIONS / RECOVERY AUDIT).
    `tables` maps table name → storage Table. Returns a result DataFrame
    or None when not an admin statement."""
    if m := re.match(r"(?is)^DELTA\s+(.+)$", stripped):
        return _apply_delta_statement(spark, m.group(1).strip(), tables)
    if re.match(r"(?i)^FLUSH$", stripped):
        # Batch appends commit synchronously and streaming ingest is
        # driven by its own trigger — FLUSH is complete by definition
        # (the reference drains MemBuffer; there is no unflushed tier here).
        return spark.createDataFrame([("ok",)], "flush string")
    # CREATE INDEX [name] ON t [USING gin] (col [gin_trgm_ops])
    # [WITH (key = 'id_col'[, tokenizer = 'ngram3'|'raw'])] — PostgreSQL's
    # pg_trgm DDL shape, building the text-index sidecar that
    # _apply_text_match_statement then serves transparently (the reference
    # builds its tantivy sidecar at ingest with a per-field tokenizer from
    # schemas/*.yaml; here the build is this explicit, re-runnable DDL and
    # the tokenizer is a WITH option).
    m = re.match(
        r"(?is)^CREATE\s+INDEX\s+(?:\w+\s+)?ON\s+([A-Za-z_]\w*)\s*"
        r"(?:USING\s+(?:gin|gist|trgm)\s*)?\(\s*([A-Za-z_]\w*)"
        r"(?:\s+gin_trgm_ops)?\s*\)\s*"
        r"(?:WITH\s*\(\s*([^)]*)\))?$",
        stripped,
    )
    if m:
        name, col, optstr = m.groups()
        opts = dict(re.findall(r"(\w+)\s*=\s*'([^']*)'", optstr or ""))
        unknown = set(opts) - {"key", "tokenizer"}
        if unknown:
            raise ValueError(
                f"CREATE INDEX: unknown option(s) {sorted(unknown)} "
                "(supported: key, tokenizer)"
            )
        tbl = (tables or {}).get(name)
        if tbl is None:
            raise ValueError(f"CREATE INDEX: unknown table {name!r}")
        from timefusion_spark.storage import maintenance

        maintenance.create_text_index(
            tbl,
            col,
            id_col=opts.get("key"),
            tokenizer=opts.get("tokenizer", "ngram3"),
        )
        return spark.createDataFrame([("ok",)], "create_index string")
    # REINDEX [TABLE] t — PG's refresh verb, served INCREMENTALLY: only
    # files committed since each sidecar's base version are indexed (the
    # ingest-maintained-tantivy analog; a full rebuild stays available as
    # re-running CREATE INDEX).
    m = re.match(r"(?is)^REINDEX\s+(?:TABLE\s+)?([A-Za-z_]\w*)$", stripped)
    if m:
        name = m.group(1)
        tbl = (tables or {}).get(name)
        if tbl is None:
            raise ValueError(f"REINDEX: unknown table {name!r}")
        from timefusion_spark.storage import maintenance

        cols = maintenance.text_indexes_of(tbl)
        if not cols:
            raise ValueError(f"REINDEX: {name!r} has no text indexes")
        states = [f"{c}:{maintenance.refresh_text_index(tbl, c)}" for c in cols]
        return spark.createDataFrame([(", ".join(states),)], "reindex string")
    m = re.match(
        r"(?is)^OPTIMIZE\s+([A-Za-z_][\w]*)(?:\s+WHERE\s+(.+))?$", stripped
    )
    if m:
        name, where = m.group(1), m.group(2)
        tbl = (tables or {}).get(name)
        if tbl is None:
            raise ValueError(f"OPTIMIZE: unknown table {name!r}")
        from timefusion_spark.storage import maintenance

        parts: dict[str, str] = {}
        for frag in re.split(r"(?i)\s+AND\s+", where or ""):
            km = re.match(r"\s*([A-Za-z_][\w]*)\s*=\s*'([^']*)'\s*", frag)
            if km:
                parts[km.group(1)] = km.group(2)
        # Both OPTIMIZE forms report the SAME metric: live-file delta from
        # the commit-log manifest (files before − files after), i.e. files
        # actually removed by the rewrite — not rows, not partition counts.
        before = len(tbl.log.snapshot().files) if tbl.log.exists() else None
        if parts:
            maintenance.compact(tbl, parts)
        else:
            # Bare OPTIMIZE = the reference's `optimize --consolidate` CLI:
            # metadata-driven leveled consolidation — only partitions whose
            # manifest shows unhealthy small files rewrite; healthy ones
            # cost zero I/O (vs compacting every partition, O(table)).
            # min_files=2: an explicit OPTIMIZE should merge any split
            # partition (the background job's default of 4 is for
            # unattended sweeps that shouldn't churn mildly-split dirs).
            maintenance.consolidate(tbl, min_files=2)
        n = (
            before - len(tbl.log.snapshot().files)
            if before is not None
            else 0
        )
        return spark.createDataFrame([(n,)], "files_removed int")
    m = re.match(
        r"(?is)^VACUUM\s+([A-Za-z_][\w]*)(?:\s+RETAIN\s+(\d+)\s+HOURS)?$", stripped
    )
    if m:
        tbl = (tables or {}).get(m.group(1))
        if tbl is None:
            raise ValueError(f"VACUUM: unknown table {m.group(1)!r}")
        from timefusion_spark.storage import maintenance

        removed = maintenance.vacuum(
            tbl, retain_hours=float(m.group(2)) if m.group(2) else 0.0
        )
        return spark.createDataFrame([(len(removed),)], "files_removed int")
    return None


def _ensure_information_schema(spark) -> None:
    """Materialize `information_schema.tables` / `.columns` over the
    session's registered tables (database.rs:2988 turns on DataFusion's
    information_schema; BI clients and monoscope's introspection queries
    read it). Spark has no dotted view names, so the shim rewrites the
    qualified references to these temp views, rebuilt on each use (table
    registration is session-local and cheap to list)."""
    from pyspark.sql import types as T

    tabs = [t.name for t in spark.catalog.listTables() if not t.name.startswith("__")]
    t_rows, c_rows = [], []
    for name in tabs:
        t_rows.append(("datafusion", "public", name, "VIEW"))
        try:
            schema = spark.table(name).schema
        except Exception:  # noqa: BLE001 — dropped concurrently
            continue
        for i, f in enumerate(schema.fields, start=1):
            c_rows.append(
                (
                    "datafusion", "public", name, f.name, i,
                    f.dataType.simpleString(),
                    "YES" if f.nullable else "NO",
                )
            )
    spark.createDataFrame(
        t_rows,
        T.StructType([
            T.StructField("table_catalog", T.StringType()),
            T.StructField("table_schema", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("table_type", T.StringType()),
        ]),
    ).createOrReplaceTempView("__info_schema_tables")
    spark.createDataFrame(
        c_rows,
        T.StructType([
            T.StructField("table_catalog", T.StringType()),
            T.StructField("table_schema", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("column_name", T.StringType()),
            T.StructField("ordinal_position", T.IntegerType()),
            T.StructField("data_type", T.StringType()),
            T.StructField("is_nullable", T.StringType()),
        ]),
    ).createOrReplaceTempView("__info_schema_columns")


# ── pg_catalog (psql meta-command surface) ─────────────────────────────────
#
# Beyond-reference: the reference's pgwire layer serves data queries but
# psql's introspection (`\dt`, `\d t`, tab completion) reads pg_catalog,
# which it does not provide. Enough of pg_class / pg_namespace /
# pg_attribute / pg_type is materialized here — over the session's live
# registered tables — for psql's table-listing and describe flows. OIDs
# are synthesized deterministically (16384 + rank of the table name), the
# PG convention that user relations start above the reserved range; they
# are stable for a given table set, so psql's two-step resolve-oid →
# query-by-oid flow works across statements.

_PG_TYPE_OIDS = {
    "boolean": 16, "bytea": 17, "bigint": 20, "smallint": 21, "integer": 23,
    "text": 25, "json": 114, "real": 700, "double precision": 701,
    "character varying": 1043, "date": 1082, "timestamp without time zone": 1114,
    "timestamp with time zone": 1184, "numeric": 1700, "jsonb": 3802,
}

_SPARK_TO_PG_TYPE = {
    "boolean": "boolean", "binary": "bytea", "bigint": "bigint",
    "smallint": "smallint", "int": "integer", "string": "text",
    "float": "real", "double": "double precision", "date": "date",
    "timestamp": "timestamp without time zone",
    "timestamp_ntz": "timestamp without time zone", "variant": "jsonb",
}


def _pg_type_name(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return "numeric"
    if spark_type.startswith("array<"):
        return _pg_type_name(spark_type[6:-1]) + "[]"
    return _SPARK_TO_PG_TYPE.get(spark_type, "text")


# temp-view names that are user VIEWs (CREATE VIEW), not storage tables —
# pg_catalog reports them relkind='v' so psql's \dv / \dt distinguish them
_SESSION_VIEW_NAMES: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def register_catalog_views(names, spark) -> None:
    target = _SESSION_VIEW_NAMES.setdefault(spark, set())
    target.clear()
    target.update(n.lower() for n in names)


# {table name → storage path} snapshot for pg_indexes, per session.
# PATHS, not Table objects: a Table holds .spark, and a WeakKeyDictionary
# value that references its key can never be collected — storing the live
# tables dict would pin every discarded SparkSession for the process
# lifetime. refresh_stale re-registers before each statement, so the
# snapshot is always current for the executing env.
_SESSION_STORAGE_TABLES: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def register_storage_tables(tables, spark) -> None:
    _SESSION_STORAGE_TABLES[spark] = {n: t.path for n, t in tables.items()}


def _ensure_pg_indexes(spark) -> None:
    """Materialize PG's `pg_indexes` system view (schemaname, tablename,
    indexname, tablespace, indexdef — pg_catalog's documented five
    columns) over the text-index sidecars of the session's mounted
    storage tables. Beyond-reference like the rest of pg_catalog: the
    reference serves no introspection for its tantivy sidecars, but a
    user debugging index routing asks `SELECT * FROM pg_indexes WHERE
    tablename = 't'` — the indexdef round-trips through the CREATE INDEX
    DDL this shim accepts, so it is copy-paste re-runnable."""
    import json as _json
    import os as _os

    from pyspark.sql import types as T

    from timefusion_spark.storage.maintenance import TEXT_INDEX_DIR

    rows = []
    for name, tpath in sorted((_SESSION_STORAGE_TABLES.get(spark) or {}).items()):
        root = _os.path.join(tpath, TEXT_INDEX_DIR)
        if not _os.path.isdir(root):
            continue
        for col in sorted(_os.listdir(root)):
            meta_path = _os.path.join(root, col, "_tf_textindex.json")
            if not _os.path.exists(meta_path):
                continue
            try:
                with open(meta_path) as fh:
                    meta = _json.load(fh)
            except (OSError, ValueError):  # racing rebuild: skip this row
                continue
            opts = [f"tokenizer = '{meta.get('tokenizer', 'ngram3')}'"]
            if meta.get("id_col"):
                opts.insert(0, f"key = '{meta['id_col']}'")
            rows.append((
                "public",
                name,
                f"{name}_{col}_tfidx",
                None,
                f"CREATE INDEX {name}_{col}_tfidx ON {name} USING gin "
                f"({col} gin_trgm_ops) WITH ({', '.join(opts)})",
            ))
    spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("schemaname", T.StringType()),
            T.StructField("tablename", T.StringType()),
            T.StructField("indexname", T.StringType()),
            T.StructField("tablespace", T.StringType()),
            T.StructField("indexdef", T.StringType()),
        ]),
    ).createOrReplaceTempView("__pg_indexes")


def _ensure_pg_catalog(spark) -> None:
    from pyspark.sql import types as T

    view_names = _SESSION_VIEW_NAMES.get(spark, set())
    tabs = sorted(
        tt.name for tt in spark.catalog.listTables() if not tt.name.startswith("__")
    )
    cls_rows, att_rows = [], []
    for i, name in enumerate(tabs):
        oid = 16384 + i
        relkind = "v" if name.lower() in view_names else "r"
        cls_rows.append((oid, name, 2200, relkind, 10, 0, "p", False))
        try:
            schema = spark.table(name).schema
        except Exception:  # noqa: BLE001 — dropped concurrently
            continue
        for n, f in enumerate(schema.fields, start=1):
            pg_t = _pg_type_name(f.dataType.simpleString())
            att_rows.append(
                (oid, f.name, _PG_TYPE_OIDS.get(pg_t, 25), n, not f.nullable,
                 -1, False, False, 0, "", "", pg_t)
            )
    spark.createDataFrame(
        cls_rows,
        T.StructType([
            T.StructField("oid", T.LongType()),
            T.StructField("relname", T.StringType()),
            T.StructField("relnamespace", T.LongType()),
            T.StructField("relkind", T.StringType()),
            T.StructField("relowner", T.LongType()),
            T.StructField("relchecks", T.IntegerType()),
            T.StructField("relpersistence", T.StringType()),
            T.StructField("relhasindex", T.BooleanType()),
        ]),
    ).createOrReplaceTempView("__pg_class")
    spark.createDataFrame(
        [(11, "pg_catalog", 10), (2200, "public", 10), (13000, "information_schema", 10)],
        T.StructType([
            T.StructField("oid", T.LongType()),
            T.StructField("nspname", T.StringType()),
            T.StructField("nspowner", T.LongType()),
        ]),
    ).createOrReplaceTempView("__pg_namespace")
    spark.createDataFrame(
        att_rows,
        T.StructType([
            T.StructField("attrelid", T.LongType()),
            T.StructField("attname", T.StringType()),
            T.StructField("atttypid", T.LongType()),
            T.StructField("attnum", T.IntegerType()),
            T.StructField("attnotnull", T.BooleanType()),
            T.StructField("atttypmod", T.IntegerType()),
            T.StructField("attisdropped", T.BooleanType()),
            T.StructField("atthasdef", T.BooleanType()),
            T.StructField("attcollation", T.LongType()),
            T.StructField("attidentity", T.StringType()),
            T.StructField("attgenerated", T.StringType()),
            T.StructField("__typname", T.StringType()),
        ]),
    ).createOrReplaceTempView("__pg_attribute")
    spark.createDataFrame(
        [(oid, name, 0) for name, oid in _PG_TYPE_OIDS.items()],
        T.StructType([
            T.StructField("oid", T.LongType()),
            T.StructField("typname", T.StringType()),
            T.StructField("typcollation", T.LongType()),
        ]),
    ).createOrReplaceTempView("__pg_type")
    # empty satellite catalogs psql's \d scalar subqueries probe — schema
    # only, never rows (no column defaults / non-default collations here)
    spark.createDataFrame(
        [],
        T.StructType([
            T.StructField("adrelid", T.LongType()),
            T.StructField("adnum", T.IntegerType()),
            T.StructField("adbin", T.StringType()),
        ]),
    ).createOrReplaceTempView("__pg_attrdef")
    spark.createDataFrame(
        [],
        T.StructType([
            T.StructField("oid", T.LongType()),
            T.StructField("collname", T.StringType()),
        ]),
    ).createOrReplaceTempView("__pg_collation")


_PG_CATALOG_VIEWS = (
    "pg_class", "pg_namespace", "pg_attribute", "pg_attrdef", "pg_collation",
    "pg_type",
)

# format_type(atttypid, atttypmod) folds to a map-literal lookup — a pure
# Catalyst expression, no UDF (typmod is always -1 in synthesized rows)
_FORMAT_TYPE_MAP = (
    "map("
    + ", ".join(f"{oid}, '{name}'" for name, oid in _PG_TYPE_OIDS.items())
    + ")"
)


def _apply_outside_quotes(sql: str, transform) -> str:
    """Apply `transform` (str → str) only to the segments of `sql`
    OUTSIDE quoted regions ('…' with '' escapes, "…" identifiers,
    $tag$…$tag$ bodies) and comments (`--` line, nesting /* */ block).
    psql's own catalog queries carry relation names inside string
    literals and regex patterns ('^(pg_class)$'); a whole-string re.sub
    would corrupt those literals."""
    out: list[str] = []
    plain: list[str] = []
    i, n = 0, len(sql)

    def flush():
        if plain:
            out.append(transform("".join(plain)))
            plain.clear()

    while i < n:
        c = sql[i]
        j = None
        if c == "'":
            m = re.match(r"'(?:''|[^'])*'", sql[i:])
            j = i + len(m.group(0)) if m else n
        elif c == '"':
            k = sql.find('"', i + 1)
            j = n if k < 0 else k + 1
        elif c == "$":
            m = re.match(r"\$[A-Za-z_]*\$", sql[i:])
            if m:
                tag = m.group(0)
                k = sql.find(tag, i + len(tag))
                j = n if k < 0 else k + len(tag)
        elif c == "-" and sql[i : i + 2] == "--":
            k = sql.find("\n", i)
            j = n if k < 0 else k + 1
        elif c == "/" and sql[i : i + 2] == "/*":
            depth, k = 1, i + 2
            while k < n and depth:
                if sql[k : k + 2] == "/*":
                    depth, k = depth + 1, k + 2
                elif sql[k : k + 2] == "*/":
                    depth, k = depth - 1, k + 2
                else:
                    k += 1
            j = k
        if j is not None:
            flush()
            out.append(sql[i:j])
            i = j
            continue
        plain.append(c)
        i += 1
    flush()
    return "".join(out)


def _rewrite_pg_catalog(sql: str) -> str:
    """Rewrite psql's pg_catalog references/idioms to the shim's views.

    Handles the syntax psql's \\dt and \\d flows emit: qualified
    relation names, pg_table_is_visible / pg_get_userbyid / format_type
    calls, OPERATOR(pg_catalog.~) and COLLATE clauses. Rewrites apply
    only OUTSIDE string literals/comments — psql's catalog queries
    compare relname against quoted patterns like '^(pg_class)$' that
    must pass through verbatim."""
    # COLLATE "name" spans a double-QUOTED IDENTIFIER (not a string
    # literal), which the segmenter would split mid-clause — strip it
    # over the full text first. Known residual: the clause text inside a
    # '-string literal would also be stripped, but psql's catalog
    # queries never quote a COLLATE clause into a literal.
    sql = re.sub(r"(?i)\s+COLLATE\s+(pg_catalog\s*\.\s*default|\"[A-Za-z_.]+\")", " ", sql)
    return _apply_outside_quotes(sql, _rewrite_pg_catalog_plain)


def _rewrite_pg_catalog_plain(sql: str) -> str:
    sql = re.sub(r"(?i)\bOPERATOR\s*\(\s*pg_catalog\s*\.\s*(~\*?|=|<>)\s*\)", r" \1 ", sql)
    sql = re.sub(
        r"(?i)\bpg_catalog\s*\.\s*pg_table_is_visible\s*\(([^()]*)\)", "(true)", sql
    )
    sql = re.sub(
        r"(?i)\bpg_catalog\s*\.\s*pg_get_userbyid\s*\(([^()]*)\)", "('timefusion')", sql
    )
    # no stored defaults/expressions in synthesized catalogs → NULL
    sql = re.sub(
        r"(?i)\bpg_catalog\s*\.\s*pg_get_expr\s*\(([^()]*)\)", "(NULL)", sql
    )
    sql = re.sub(
        r"(?i)\b(?:pg_catalog\s*\.\s*)?format_type\s*\(([^(),]+),\s*([^()]+)\)",
        lambda m: f"coalesce(element_at({_FORMAT_TYPE_MAP}, CAST({m.group(1)} AS BIGINT)), 'text')",
        sql,
    )
    for v in _PG_CATALOG_VIEWS:
        sql = re.sub(rf"(?i)\b(?:pg_catalog\s*\.\s*)?{v}\b", f"__{v}", sql)
    return sql


def expand_qualified_star_in_calls(spark, sql: str) -> str:
    """PG parity: a qualified wildcard inside a FUNCTION call —
    `SELECT jsonb_build_array(sub.*) FROM (…) sub` — expands to the
    qualifier's columns (json_functions.slt:212; pgwire resolves it at
    bind time with the derived schema). A text-only shim can't know that
    schema, so this probes the derived relation with a LIMIT-0 analysis
    pass (schema only — nothing executes) and splices the column list
    into the call. Only the `FROM (subquery) qual` shape is handled;
    anything else passes through unchanged."""
    m = re.search(r"\(\s*([A-Za-z_]\w*)\s*\.\s*\*\s*\)", sql)
    if not m:
        return sql
    qual = m.group(1)
    fm = re.search(r"(?is)\bFROM\s*\(", sql)
    if not fm:
        return sql
    start = fm.end() - 1
    depth, end = 0, None
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end is None:
        return sql
    am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", sql[end + 1 :], re.IGNORECASE)
    if am is None or am.group(1).lower() != qual.lower():
        return sql
    inner = sql[start + 1 : end]
    try:
        cols = spark.sql(
            pg_to_spark_sql(f"SELECT * FROM ({inner}) __star_probe LIMIT 0", spark)
        ).columns
    except Exception:
        return sql
    expansion = ", ".join(f"{qual}.{c}" for c in cols)
    return sql[: m.start()] + "(" + expansion + ")" + sql[m.end() :]


def pg_sql(spark, sql: str, tables=None):
    """Run a PG-dialect statement through the shim on a SparkSession.

    SET/RESET return an empty result frame (command-complete analog);
    SHOW returns the one-row PG shape; FLUSH/OPTIMIZE/VACUUM route to the
    maintenance jobs when a `tables` registry is supplied (the pgwire
    admin-verb interception); everything else translates and executes,
    with set_config/current_setting resolved against the per-session
    settings store and pg_settings available as a view."""
    stripped = sql.strip().rstrip(";").strip()
    handled = _apply_settings_statement(spark, stripped)
    if handled is True:
        return spark.createDataFrame([], "status string")
    if handled is not None:
        return handled
    admin = _apply_admin_statement(spark, stripped, tables)
    if admin is not None:
        return admin
    counted = _apply_count_statement(spark, stripped, tables)
    if counted is not None:
        return counted
    texted = _apply_text_match_statement(spark, stripped, tables)
    if texted is not None:
        return texted
    # table_changes('t', from [, to]) — the Delta-SQL change-data-feed
    # table function, served from the commit log (Table.read_changes).
    # Each call materializes as a temp view so the surrounding SQL can
    # select/filter/join it like any relation.
    def _table_changes(m: "re.Match[str]") -> str:
        name = m.group(1)
        tbl = (tables or {}).get(name)
        if tbl is None:
            raise ValueError(f"table_changes: unknown table {name!r}")
        lo = int(m.group(2))
        hi = int(m.group(3)) if m.group(3) else None
        view = f"__tf_changes_{name}_{lo}_{hi if hi is not None else 'tip'}"
        tbl.read_changes(lo, hi).createOrReplaceTempView(view)
        return view

    sql = re.sub(
        r"(?is)\btable_changes\s*\(\s*'([A-Za-z_]\w*)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
        _table_changes,
        sql,
    )
    stripped = sql.strip().rstrip(";").strip()
    # EXPLAIN [(options)] [ANALYZE] <query> — the pgwire EXPLAIN surface
    # (DataFusion renders its plan; here Catalyst renders its own). One row
    # per plan line, column name matching PG's ('QUERY PLAN').
    m = re.match(r"(?is)^EXPLAIN(?:\s*\(([^)]*)\))?(\s+ANALYZE)?\s+(.+)$", stripped)
    if m:
        analyze = bool(m.group(2))
        if m.group(1) is not None:
            # PG option-list form. Supported: ANALYZE [ON|TRUE|OFF|FALSE],
            # FORMAT TEXT, and the no-op display options. Anything else
            # (FORMAT JSON/XML/YAML, unknown words) is rejected explicitly
            # instead of falling into the Spark parser as query text.
            for opt in m.group(1).split(","):
                words = opt.strip().upper().split()
                if not words:
                    continue
                name, args = words[0], words[1:]
                if name == "ANALYZE":
                    analyze = not args or args[0] in ("ON", "TRUE", "1")
                elif name == "FORMAT":
                    if args != ["TEXT"]:
                        raise ValueError(
                            f"EXPLAIN (FORMAT {' '.join(args)}) is not supported; only TEXT"
                        )
                elif name not in ("VERBOSE", "COSTS", "BUFFERS", "TIMING", "SUMMARY", "SETTINGS"):
                    raise ValueError(f"unsupported EXPLAIN option {opt.strip()!r}")
        # the FULL rewrite pipeline, same as the non-EXPLAIN tail below:
        # the old branch applied only the settings functions, so
        # EXPLAIN SELECT * FROM pg_settings / information_schema /
        # pg_catalog (or a clock function) failed with an unresolved
        # relation while the same query without EXPLAIN worked
        # (review r12)
        inner = _translate_and_run(spark, m.group(3))
        qe = inner._jdf.queryExecution()
        if analyze:
            # PG semantics: ANALYZE EXECUTES the statement (including side
            # effects) and reports the actual plan — run it, then render the
            # post-execution (AQE-final) physical plan.
            inner.collect()
            text = qe.executedPlan().toString()
        else:
            text = qe.optimizedPlan().toString()
        return spark.createDataFrame(
            [(line,) for line in text.rstrip("\n").split("\n")], "`QUERY PLAN` string"
        )
    return _translate_and_run(spark, sql)


def _translate_and_run(spark: SparkSession, sql: str) -> DataFrame:
    """The tail of pg_sql's pipeline — catalog/settings/clock view
    wiring, qualified-star expansion, dialect translation, execution.
    Factored out so EXPLAIN renders the plan of EXACTLY the statement
    the non-EXPLAIN path would run (review r12)."""
    if re.search(r"(?i)\bpg_settings\b", sql):
        _ensure_pg_settings_view(spark)
    sql = _apply_settings_functions(spark, sql)
    sql = _apply_clock_functions(sql)
    if re.search(r"(?i)\binformation_schema\s*\.\s*(tables|columns)\b", sql):
        _ensure_information_schema(spark)
        # outside quotes only — same literal-safety rule as pg_indexes
        sql = _apply_outside_quotes(
            sql,
            lambda s: re.sub(
                r"(?i)\binformation_schema\s*\.\s*(tables|columns)\b",
                lambda m: f"__info_schema_{m.group(1).lower()}",
                s,
            ),
        )
    if re.search(r"(?i)\bpg_indexes\b", sql):
        _ensure_pg_indexes(spark)
        # outside quotes only: 'pg_indexes' as a STRING LITERAL (e.g. a
        # tablename predicate value) must not be rewritten
        sql = _apply_outside_quotes(
            sql,
            lambda s: re.sub(
                r"(?i)\b(?:pg_catalog\s*\.\s*)?pg_indexes\b", "__pg_indexes", s
            ),
        )
    if re.search(r"(?i)\b(pg_catalog\s*\.|pg_class\b|pg_namespace\b|pg_attribute\b|pg_type\b)", sql):
        _ensure_pg_catalog(spark)
        sql = _rewrite_pg_catalog(sql)
    sql = expand_qualified_star_in_calls(spark, sql)
    return spark.sql(pg_to_spark_sql(sql, spark))
