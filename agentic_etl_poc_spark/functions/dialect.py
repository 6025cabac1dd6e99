"""DuckDB → Spark SQL dialect shim.

The reference's transform stage executes user SQL with DuckDB
(reference: etl_agent/templates.py:108,119), so shipped plans contain
DuckDB-isms.  Catalyst covers the semantics; this shim rewrites the
three constructs that differ in *spelling* (SURVEY §7 step 4):

1. ``try_strptime(expr, '%m/%d/%Y')`` → ``to_timestamp(expr, 'MM/dd/yyyy')``
   — same NULL-on-mismatch semantics given ANSI-off + CORRECTED parser
   (session.SEMANTIC_CONF).  strftime-style tokens are translated to
   JDK DateTimeFormatter patterns.  ``strptime`` (non-try) is rewritten
   the same way: DuckDB raises on mismatch while the rewrite yields NULL —
   the *forgiving* direction, matching the reference planner's intent of
   "parse date with fallback" (reference: agents.py conservative defaults).
2. ``TRY_CAST(x AS T)`` → ``CAST(x AS T)`` — identical under ANSI-off.
3. ``DATE_TRUNC('week'|..., x)`` wrapped in ``CAST(... AS DATE)`` when
   requested (plan SQL only): DuckDB returns DATE for DATE input while
   Spark always returns TIMESTAMP; the canonical plan feeds DATEs
   (reference: prompt.txt:53 after CAST(... AS DATE)).

Rewrites are token-aware (balanced parens) but not a full SQL parser;
occurrences inside string literals are left to keyword spelling being
unlikely in data.  That trade is documented and acceptable for the plan
surface, which is engine-generated or hand-written YAML.
"""

from __future__ import annotations

import re

# strftime → JDK DateTimeFormatter token map (only tokens DuckDB's
# strptime supports and JDK can express).
_TOKENS = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%I", "hh"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
    ("%g", "SSS"),
    ("%j", "DDD"),
    ("%b", "MMM"),
    ("%B", "MMMM"),
    ("%a", "EEE"),
    ("%A", "EEEE"),
    ("%p", "a"),
]


_TOKEN_MAP = dict(_TOKENS)


def translate_strftime_tokens(fmt: str) -> str:
    """strftime format → JDK DateTimeFormatter pattern, single pass.

    Sequential ``str.replace`` was wrong twice over: ``%%Y`` became ``%``
    then matched ``%Y`` (the literal percent swallowed a real token), and
    literal alphabetic characters (the ``T`` in ISO-8601) reached the JDK
    formatter unquoted, where every letter is a pattern letter.  The
    tokenizer walks left-to-right instead: ``%%`` emits a literal ``%``,
    known ``%X`` tokens map to their JDK pattern, and any literal run
    containing letters (or quotes) is wrapped in JDK single-quote
    literals with embedded quotes doubled."""
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if not lit:
            return
        s = "".join(lit)
        if any(c.isalpha() for c in s) or "'" in s:
            out.append("'" + s.replace("'", "''") + "'")
        else:
            out.append(s)
        lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok == "%%":
                lit.append("%")
                i += 2
                continue
            jdk = _TOKEN_MAP.get(tok)
            if jdk is not None:
                flush()
                out.append(jdk)
                i += 2
                continue
        lit.append(fmt[i])
        i += 1
    flush()
    return "".join(out)


def _find_balanced(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth = 0
    in_str: str | None = None
    i = open_idx
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def _split_top_level_comma(s: str) -> list[str]:
    parts, depth, in_str, cur = [], 0, None, []
    for ch in s:
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


def _rewrite_calls(sql: str, func_re: re.Pattern, replacer) -> str:
    out, pos = [], 0
    while True:
        m = func_re.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        open_idx = m.end() - 1  # the '('
        close = _find_balanced(sql, open_idx)
        args = _split_top_level_comma(sql[open_idx + 1 : close - 1])
        out.append(sql[pos : m.start()])
        out.append(replacer(args))
        pos = close


_STRPTIME_RE = re.compile(r"\btry_strptime\s*\(|\bstrptime\s*\(", re.IGNORECASE)
_DATE_TRUNC_RE = re.compile(r"\bdate_trunc\s*\(", re.IGNORECASE)
_FMT_LITERAL_RE = re.compile(r"^\s*'(.*)'\s*$", re.DOTALL)


def _strptime_replacer(args: list[str]) -> str:
    if len(args) != 2:
        raise ValueError(f"strptime expects 2 args, got {len(args)}")
    expr, fmt = args
    lit = _FMT_LITERAL_RE.match(fmt)
    if not lit:
        raise ValueError(f"strptime format must be a string literal: {fmt!r}")
    jdk = translate_strftime_tokens(lit.group(1))
    return f"to_timestamp({expr.strip()}, '{jdk}')"


#: Granularities where DuckDB's date_trunc over a DATE returns a DATE.
#: Sub-day granularities (hour/minute/...) return timestamps in BOTH
#: engines — casting those to DATE would silently drop the time part.
_DAY_OR_COARSER = {
    "day", "week", "month", "quarter", "year", "decade", "century",
    "millennium", "isoyear",
}


def _date_trunc_replacer(args: list[str]) -> str:
    inner = ", ".join(a.strip() for a in args)
    gran = args[0].strip().strip("'\"").lower() if args else ""
    if gran in _DAY_OR_COARSER:
        return f"CAST(date_trunc({inner}) AS DATE)"
    return f"date_trunc({inner})"


def rewrite_duckdb_sql(sql: str, date_trunc_as_date: bool = True) -> str:
    """Rewrite DuckDB-dialect SQL into Spark-dialect SQL."""
    out = _rewrite_calls(sql, _STRPTIME_RE, _strptime_replacer)
    out = re.sub(r"\bTRY_CAST\s*\(", "CAST(", out, flags=re.IGNORECASE)
    # DuckDB allows bare VARCHAR in casts; Spark demands a length — STRING
    # is the equivalent unbounded type.
    out = re.sub(r"\bVARCHAR\b(?!\s*\()", "STRING", out, flags=re.IGNORECASE)
    if date_trunc_as_date:
        out = _rewrite_calls(out, _DATE_TRUNC_RE, _date_trunc_replacer)
    return out
