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
- contains(arr, x) -> array_contains(arr, x)
- codepoint(c) -> ascii(c)
- json_extract_scalar / json_extract -> get_json_object (string result;
  exact for the scalar form, type-tag-only difference for json_extract)

String literals ('...', with '' escapes) are protected from all rewrites
except MySQL-style datetime patterns inside date_parse/date_format (those
are translated to java.time patterns — see _mysql_to_java).

Date/time translation (Presto semantics → Spark equivalents):
- date_parse(s, '%Y-%m-%d...')  -> to_timestamp(s, 'yyyy-MM-dd...')
- date_format(ts, '%Y-%m')      -> date_format(ts, 'yyyy-MM')  (Presto's
  date_format takes MySQL patterns; Spark's takes java.time — the literal
  is converted, the name kept)
- format_datetime(ts, 'yyyy-MM')-> date_format(ts, 'yyyy-MM')  (Joda
  patterns are java.time-compatible for the common subset)
- date_add('day', n, x)         -> timestampadd(day, n, x)
- date_diff('day', a, b)        -> timestampdiff(day, a, b)
- from_iso8601_timestamp(s)     -> to_timestamp(s)
- from_iso8601_date(s)          -> to_date(s)
- to_unixtime(ts)               -> unix_timestamp(ts)  (Presto returns
  double, Spark bigint — integral seconds either way)

Not translated (raise-worthy differences are documented, not silently
wrong): Presto lambda syntax differences (x -> f(x) is compatible),
UNNEST WITH ORDINALITY.
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
    # Presto contains(array, elem) -> array_contains (Presto has no string
    # contains — strpos covers that — so the rename is dialect-safe)
    (re.compile(r"\bCONTAINS\s*\(", re.I), "array_contains("),
    (re.compile(r"\bCODEPOINT\s*\(", re.I), "ascii("),
    # json_extract returns a JSON value, json_extract_scalar a string;
    # get_json_object returns the string form either way — the scalar
    # case is exact, the JSON-value case differs only in type tag
    (re.compile(r"\bJSON_EXTRACT_SCALAR\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bJSON_EXTRACT\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bDATE_PARSE\s*\(", re.I), "to_timestamp("),
    (re.compile(r"\bFORMAT_DATETIME\s*\(", re.I), "date_format("),
    # Presto 3-arg unit forms -> Spark timestampadd/timestampdiff. The
    # unit arrives as a masked literal placeholder; unquoting happens in
    # the restore pass (Spark wants a bare keyword, not a string).
    (re.compile(r"\bDATE_ADD\s*\(\s*(\x00LIT\d+\x00)\s*,", re.I), r"timestampadd(\1,"),
    (re.compile(r"\bDATE_DIFF\s*\(\s*(\x00LIT\d+\x00)\s*,", re.I), r"timestampdiff(\1,"),
    (re.compile(r"\bFROM_ISO8601_TIMESTAMP\s*\(", re.I), "to_timestamp("),
    (re.compile(r"\bFROM_ISO8601_DATE\s*\(", re.I), "to_date("),
    (re.compile(r"\bTO_UNIXTIME\s*\(", re.I), "unix_timestamp("),
    (re.compile(r"\bCARDINALITY\s*\(", re.I), "size("),
    (re.compile(r"\bJSON_EXTRACT_SCALAR\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bCODEPOINT\s*\(", re.I), "ascii("),
    # Presto from_unixtime(double) -> TIMESTAMP; Spark's same-named builtin
    # returns a STRING, so map to timestamp_seconds for type parity
    (re.compile(r"\bFROM_UNIXTIME\s*\(", re.I), "timestamp_seconds("),
    # Presto reduce(arr, init, merge, finish) IS Spark aggregate(...)
    (re.compile(r"\bREDUCE\s*\(", re.I), "aggregate("),
    (re.compile(r"\bIS_NAN\s*\(", re.I), "isnan("),
    (re.compile(r"\bDAY_OF_YEAR\s*\(", re.I), "dayofyear("),
    (re.compile(r"\bDOY\s*\(", re.I), "dayofyear("),
    (re.compile(r"\bWEEK_OF_YEAR\s*\(", re.I), "weekofyear("),
    (re.compile(r"\bWEEK\s*\(", re.I), "weekofyear("),
    # Presto's zero-arg special values have no Spark function form
    (re.compile(r"\bNAN\s*\(\s*\)", re.I), "CAST('NaN' AS DOUBLE)"),
    (re.compile(r"\bINFINITY\s*\(\s*\)", re.I), "CAST('Infinity' AS DOUBLE)"),
]

# Presto day_of_week/dow: ISO numbering 1=Monday..7=Sunday. Spark's
# dayofweek is 1=Sunday..7=Saturday, but weekday() is 0=Monday..6=Sunday,
# so Presto day_of_week(x) == weekday(x) + 1. The +1 lands AFTER the
# argument, so this one needs a balanced-paren wrap, not a head rename.
_DOW_HEAD_RE = re.compile(r"\b(?:DAY_OF_WEEK|DOW)\s*\(", re.I)


def _wrap_dow_calls(masked: str) -> str:
    """Rewrite day_of_week(<args>) -> (weekday(<args>) + 1) with a
    balanced-paren walk so nested expressions survive."""
    while True:
        head = _DOW_HEAD_RE.search(masked)
        if head is None:
            return masked
        open_paren = head.end() - 1
        depth = 0
        close = None
        for i in range(open_paren, len(masked)):
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
        if close is None:
            return masked  # unbalanced — leave for Spark's parser to report
        args = masked[open_paren + 1 : close]
        masked = (
            masked[: head.start()]
            + f"(weekday({args}) + 1)"
            + masked[close + 1 :]
        )

_STRING_LITERAL = re.compile(r"'(?:[^']|'')*'")

# MySQL datetime format code -> java.time pattern (the date_parse subset
# Athena users actually hit; %x codes with no java equivalent raise).
_MYSQL_CODES = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "i": "mm", "s": "ss",
    "S": "ss", "f": "SSSSSS", "j": "DDD", "a": "EEE", "W": "EEEE",
    "b": "MMM", "M": "MMMM", "p": "a", "T": "HH:mm:ss", "%": "%",
}

_MYSQL_CODE_RE = re.compile(r"%[a-zA-Z%]")


def _mysql_to_java(fmt: str) -> str:
    """'%Y-%m-%dT%H:%i:%s' -> "yyyy-MM-dd'T'HH:mm:ss" — literal alphabetic
    runs are single-quoted so java.time doesn't read them as pattern
    letters."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            code = fmt[i + 1]
            if code not in _MYSQL_CODES:
                raise ValueError(f"unsupported MySQL datetime code %{code} in {fmt!r}")
            out.append(_MYSQL_CODES[code])
            i += 2
        elif ch.isalpha():
            j = i
            while j < len(fmt) and fmt[j].isalpha() and not (fmt[j] == "%"):
                j += 1
            # stop a literal run at the next % code
            run = fmt[i:j]
            nxt = run.find("%")
            if nxt != -1:
                run = run[:nxt]
            out.append("'" + run + "'")
            i += len(run)
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_FMT_HEAD_RE = re.compile(r"\b(?:to_timestamp|date_format)\s*\(", re.I)
_BARE_LIT_RE = re.compile(r"^\x00LIT(\d+)\x00$")
_ANY_LIT_RE = re.compile(r"\x00LIT(\d+)\x00")


def _convert_format_literals(masked: str, literals: list[str]) -> None:
    """Convert MySQL format literals in to_timestamp/date_format calls.

    Mutates ``literals`` in place (the masked text keeps its placeholders).
    For each call head (case-insensitive), walks to the matching close
    paren, splits top-level arguments, and converts the last argument when
    it is a bare string literal containing MySQL % codes. If a literal with
    MySQL codes sits anywhere else in the call's final argument (wrapped in
    an expression we can't safely rewrite), raise — the module's policy is
    to fail loudly rather than let Spark misread 'm' as minute-of-hour.
    """
    for head in _FMT_HEAD_RE.finditer(masked):
        open_paren = head.end() - 1
        depth = 0
        args: list[str] = []
        arg_start = open_paren + 1
        close = None
        for i in range(open_paren, len(masked)):
            ch = masked[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
            elif ch == "," and depth == 1:
                args.append(masked[arg_start:i])
                arg_start = i + 1
        if close is None:
            continue  # unbalanced — leave for Spark's parser to report
        args.append(masked[arg_start:close])
        if len(args) < 2:
            continue  # single-arg to_timestamp(s): no format literal
        last = args[-1].strip()
        bare = _BARE_LIT_RE.match(last)
        if bare:
            lit_id = int(bare.group(1))
            raw = literals[lit_id][1:-1].replace("''", "'")
            if _MYSQL_CODE_RE.search(raw):
                converted = _mysql_to_java(raw)
                literals[lit_id] = "'" + converted.replace("'", "''") + "'"
        else:
            for m in _ANY_LIT_RE.finditer(last):
                raw = literals[int(m.group(1))][1:-1].replace("''", "'")
                if _MYSQL_CODE_RE.search(raw):
                    raise ValueError(
                        "MySQL datetime pattern %r in a format argument this shim "
                        "cannot safely rewrite (wrapped in an expression); pass the "
                        "format as a plain string literal" % raw
                    )


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
    masked = _wrap_dow_calls(masked)

    # MySQL datetime patterns live in the final literal argument of a
    # to_timestamp( / date_format( call (whether produced by _REPLACEMENTS
    # or written by the user in any case). A balanced-paren walk handles
    # arbitrary nesting in the first argument — coalesce(a, cast(b as
    # timestamp)) etc. — and any format literal that still carries MySQL
    # codes but can't be converted raises instead of reaching Spark wrong.
    _convert_format_literals(masked, literals)

    # timestampadd/timestampdiff want a bare unit keyword, not a literal
    def unquote_unit(m: re.Match) -> str:
        fn, lit_id = m.group(1), int(m.group(2))
        unit = literals[lit_id][1:-1].strip()
        return f"{fn}({unit},"

    masked = re.sub(
        r"\b(timestampadd|timestampdiff)\s*\(\s*\x00LIT(\d+)\x00\s*,",
        unquote_unit,
        masked,
    )

    # restore literals
    return re.sub(r"\x00LIT(\d+)\x00", lambda m: literals[int(m.group(1))], masked)
