"""Athena/Presto → Spark SQL dialect shim.

The reference emits Presto-flavored SQL to Athena (every generated query
in algorithms/sql/*; users write the same dialect against
DataSource.query, athena_source.py:206-244). Spark SQL is close but not
identical; this shim rewrites the syntactic differences so
reference-shaped SQL runs unchanged:

- double-quoted identifiers -> backticks ("col" -> `col`; Spark parses
  double quotes as string literals)
- TABLESAMPLE BERNOULLI(p) -> TABLESAMPLE (p PERCENT)
- CAST(x AS VARCHAR) (length-less) -> CAST(x AS STRING)
- random() -> rand()
- arbitrary(x) -> any_value(x)
- array_agg(x) -> collect_list(x)
- strpos(s, sub) -> instr(s, sub)  (same argument order)
- approx_distinct(x) -> approx_count_distinct(x)

String literals ('...', with '' escapes) are protected from all rewrites.
Not translated (raise-worthy differences are documented, not silently
wrong): date_parse/format_datetime MySQL-style patterns, Presto lambda
syntax differences (x -> f(x) is compatible), UNNEST WITH ORDINALITY.
"""

from __future__ import annotations

import re

_REPLACEMENTS = [
    (re.compile(r"\bTABLESAMPLE\s+BERNOULLI\s*\(\s*([0-9.]+)\s*\)", re.I), r"TABLESAMPLE (\1 PERCENT)"),
    (re.compile(r"\bAS\s+VARCHAR\s*\)", re.I), "AS STRING)"),
    (re.compile(r"\bRANDOM\s*\(\s*\)", re.I), "rand()"),
    (re.compile(r"\bARBITRARY\s*\(", re.I), "any_value("),
    (re.compile(r"\bARRAY_AGG\s*\(", re.I), "collect_list("),
    (re.compile(r"\bSTRPOS\s*\(", re.I), "instr("),
    (re.compile(r"\bAPPROX_DISTINCT\s*\(", re.I), "approx_count_distinct("),
]

_STRING_LITERAL = re.compile(r"'(?:[^']|'')*'")


def translate_athena_sql(sql: str) -> str:
    """Rewrite Athena/Presto SQL to Spark SQL (string literals protected)."""
    # protect string literals
    literals: list[str] = []

    def stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00LIT{len(literals) - 1}\x00"

    masked = _STRING_LITERAL.sub(stash, sql)
    # double-quoted identifiers -> backticks
    masked = re.sub(r'"([^"]+)"', r"`\1`", masked)
    for pat, repl in _REPLACEMENTS:
        masked = pat.sub(repl, masked)
    # restore literals
    return re.sub(r"\x00LIT(\d+)\x00", lambda m: literals[int(m.group(1))], masked)
