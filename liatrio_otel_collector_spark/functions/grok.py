"""Grok-style text-line parsing, fully Catalyst-vectorized.

The north rule names "a vectorized grok/regex parse stage"; the flagship
pipeline does this over the TOKEN layout (functions/tokens.py).  This module
is the TEXT twin for unstructured log lines: a ``%{PATTERN:field}`` grok
expression compiles to ONE anchored Java-compatible regex, and each named
field becomes a ``regexp_extract`` column — JVM whole-stage codegen, no
Python in the hot path, the same shape logstash/vector grok stages have.

The pattern subset sticks to syntax DuckDB's RE2 and Java's regex agree on
(char classes, alternation, non-capturing groups, +/*/?), so the compiled
regex doubles as the DuckDB oracle's expression — one compiler, two engines,
hash-identical extracts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# dialect-portable pattern library (logstash-core names); every entry stays
# in the RE2 ∩ Java dialect (no backreferences, no lookaround) so the SAME
# compiled regex runs in Spark's Java engine and DuckDB's RE2 oracle.
GROK_PATTERNS: dict[str, str] = {
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN|ERROR|FATAL|debug|info|warn|error|fatal)",
    "WORD": r"\w+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "NOTSPACE": r"\S+",
    "GREEDYDATA": r".*",
    # COMBINEDAPACHELOG-class composites (the first patterns real log
    # pipelines reach for; logstash-core httpd/grok-patterns names)
    "MONTH": r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
    "HTTPDATE": (
        r"\d{2}/(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/\d{4}"
        r":\d{2}:\d{2}:\d{2} [+-]\d{4}"
    ),
    "QS": r'"(?:[^"\\]|\\.)*"',  # quoted string, escape-aware, no backrefs
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(),~:;=@#%&_\-]*)+",
    "USER": r"[a-zA-Z0-9._-]+",
    "HOSTNAME": r"(?:[A-Za-z0-9][A-Za-z0-9\-]*\.)*[A-Za-z0-9][A-Za-z0-9\-]*",
}

# %{NAME:field} captures; bare %{NAME} matches without capturing (the
# grok-filter syntax for structure-only tokens, e.g. a user agent you
# validate but don't extract)
_FIELD_RE = re.compile(r"%\{([A-Z0-9_]+)(?::([a-zA-Z_][a-zA-Z0-9_]*))?\}")


def grok_compile(expression: str) -> tuple[str, list[str]]:
    """``%{LOGLEVEL:level} %{WORD:service}: %{GREEDYDATA:msg}`` →
    (anchored regex with one capture group per field, field names in group
    order).  ``%{NAME}`` without a field compiles to a NON-capturing group.
    Unknown pattern names and duplicate field names are errors —
    the same strictness grok filters apply at config load."""
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        pname, fname = m.group(1), m.group(2)
        if pname not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{pname}}}")
        if fname is None:
            return f"(?:{GROK_PATTERNS[pname]})"
        if fname in fields:
            raise ValueError(f"duplicate grok field {fname!r}")
        fields.append(fname)
        return f"({GROK_PATTERNS[pname]})"

    # escape the literal text BETWEEN field refs, then re-inject the groups
    out: list[str] = []
    last = 0
    for m in _FIELD_RE.finditer(expression):
        out.append(re.escape(expression[last : m.start()]))
        out.append(sub(m))
        last = m.end()
    out.append(re.escape(expression[last:]))
    if not fields:
        raise ValueError("grok expression has no %{PATTERN:field} refs")
    return "^" + "".join(out) + "$", fields


def grok_parse(
    df: DataFrame, col: str | Column, expression: str, keep: bool = True
) -> DataFrame:
    """Extract every grok field as a string column (empty string = no
    match, the regexp_extract convention both Spark and DuckDB share).
    ``keep=False`` drops the raw line after extraction (column pruning then
    removes it from the scan entirely)."""
    regex, fields = grok_compile(expression)
    c = F.col(col) if isinstance(col, str) else col
    out = df.select(
        "*", *[F.regexp_extract(c, regex, i + 1).alias(f) for i, f in enumerate(fields)]
    )
    if not keep and isinstance(col, str):
        out = out.drop(col)
    return out


def grok_oracle_exprs(expression: str, col: str) -> dict[str, str]:
    """The DuckDB twin: field -> ``regexp_extract(col, regex, group)`` SQL
    snippets built from the SAME compiled regex."""
    regex, fields = grok_compile(expression)
    lit = regex.replace("'", "''")
    return {
        f: f"regexp_extract({col}, '{lit}', {i + 1})" for i, f in enumerate(fields)
    }
