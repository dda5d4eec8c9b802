"""PostgreSQL `to_char(timestamp, fmt)` as a native expression composition.

Behavior parity with the reference (/root/reference/src/functions.rs:537-775),
including its documented intentional divergences (functions.rs:650-663):
- `Month`/`Day` unpadded (real PG pads to 9 chars);
- token matching is case-sensitive;
- unterminated `"..."` literals accepted (remainder copied verbatim);
- `HH` == `HH12` (12-hour), NOT `HH24`;
- unknown tokens pass through as literal text.

Design: the format string is parsed ONCE driver-side into segments; each
segment renders JVM-side (`date_format` / `dayofweek` / `upper`), and the
segments are `concat`ed — zero Python in the per-row path, so this stays
inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PG token → Spark/java.time datetime pattern fragment.
# ORDER IS LOAD-BEARING: longest-prefix first (YYYY before YY, HH24/HH12
# before HH, Month before Mon before MM, Day/Dy before DD handled by order).
_TOKENS: list[tuple[str, str]] = [
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("Month", "MMMM"),  # java unpadded full month == reference's divergence
    ("Mon", "MMM"),
    ("MM", "MM"),
    ("DD", "dd"),
    ("Day", "EEEE"),
    ("Dy", "EEE"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "hh"),  # PG HH is 12-hour — do NOT "fix" to HH24
    ("MI", "mm"),
    ("SS", "ss"),
    ("US", "SSSSSS"),
    ("MS", "SSS"),
]

# Segment kinds produced by the parser.
_PATTERN = "pattern"  # java.time pattern fragment (mergeable)
_SPECIAL = "special"  # needs its own expression: D, DY, am, pm, TZ, AM, PM


def _parse(fmt: str) -> list[tuple[str, str]]:
    parts: list[tuple[str, str]] = []
    buf: list[str] = []  # pending java-pattern fragment
    litbuf: list[str] = []  # pending RAW literal text, merged before quoting

    def flush_lit() -> None:
        # java.time quotes literals with single quotes; '' escapes a quote.
        # Contiguous literal text MUST be emitted as ONE quoted run: quoting
        # fragments individually yields adjacent quotes ('a''b') which
        # java.time reads as an escaped quote, not two literals.
        if litbuf:
            buf.append("'" + "".join(litbuf).replace("'", "''") + "'")
            litbuf.clear()

    def flush() -> None:
        flush_lit()
        if buf:
            parts.append((_PATTERN, "".join(buf)))
            buf.clear()

    def push_literal(text: str) -> None:
        if text:
            litbuf.append(text)

    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == '"':
            # PG literal escape: copy until matching quote, "" = literal ".
            i += 1
            lit: list[str] = []
            while i < n:
                if fmt[i] == '"':
                    if i + 1 < n and fmt[i + 1] == '"':
                        lit.append('"')
                        i += 2
                        continue
                    i += 1
                    break
                lit.append(fmt[i])
                i += 1
            push_literal("".join(lit))
            continue
        if fmt.startswith("DY", i):
            flush()
            parts.append((_SPECIAL, "DY"))
            i += 2
            continue
        if ch == "D" and (i + 1 >= n or not fmt[i + 1].isalnum()):
            flush()
            parts.append((_SPECIAL, "D"))
            i += 1
            continue
        if fmt.startswith("TZ", i):
            flush()
            parts.append((_SPECIAL, "TZ"))
            i += 2
            continue
        for pg, java in (("AM", "AM"), ("PM", "PM"), ("am", "am"), ("pm", "pm")):
            if fmt.startswith(pg, i):
                flush()
                parts.append((_SPECIAL, pg))
                i += 2
                break
        else:
            for pg, java in _TOKENS:
                if fmt.startswith(pg, i):
                    flush_lit()
                    buf.append(java)
                    i += len(pg)
                    break
            else:
                push_literal(ch)
                i += 1
    flush()
    return parts


def to_char(ts: Column, fmt: str) -> Column:
    """PG to_char over a UTC timestamp column → string column."""
    cols: list[Column] = []
    for kind, payload in _parse(fmt):
        if kind == _PATTERN:
            cols.append(F.date_format(ts, payload))
        elif payload == "D":
            # PG D: Sunday=1..Saturday=7 — Spark dayofweek() matches exactly.
            cols.append(F.dayofweek(ts).cast("string"))
        elif payload == "DY":
            cols.append(F.upper(F.date_format(ts, "EEE")))
        elif payload == "TZ":
            # Stored timestamps are UTC by contract (schema yaml Timestamp(µs,UTC)).
            cols.append(F.lit("UTC"))
        elif payload in ("AM", "PM"):
            cols.append(F.date_format(ts, "a"))
        else:  # am / pm — lowercase meridiem
            cols.append(F.lower(F.date_format(ts, "a")))
    # to_char(NULL, fmt) is NULL for EVERY format — including a
    # zero-segment one like '' (the early empty-literal return previously
    # bypassed this guard, review r11)
    out = F.lit("") if not cols else (F.concat(*cols) if len(cols) > 1 else cols[0])
    return F.when(ts.isNull(), F.lit(None).cast("string")).otherwise(out)
