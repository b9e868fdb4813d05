"""Mechanized ROUND(SUM) term-grid audit (r15 — VERDICT r14 #1).

The r14 q1 flip class: ``ROUND(SUM(x), d)`` where x's value grid is FINER
than 10^-d puts the TRUE sum exactly on a .5·10^-d half-boundary, where
float accumulation order picks the side (q1's sum_charge: 1e-6-grid
terms under ROUND-4, flipped at sf0.1's 1.37M-row group after 14 rounds
invisible at sf0.01). Until r15 this was a CLAUDE.md prose rule plus a
one-time manual audit — the exact state the global-window and
collect-site rules were in before they became executable gates. This
module IS that gate: it runs in the default suite, extracts every
rounded aggregate column from the registered oracle SQL, resolves each
aggregate argument's value grid, and classifies:

- **exact-accumulation** — every SUM/AVG argument is integer-valued or
  binary-exact (ranks+k/2 halves, floor-quantized integers): float
  addition of such terms is EXACT below 2^53, so the accumulation is
  order-invariant and everything outside the aggregates is a
  deterministic per-row/per-group function of identical operands.
  (Headroom note: exactness needs |Σ| < 2^53 ≈ 9e15 — rank-product sums
  Σr² ~ n³/3 stay under it through sf0.1's n≈1.5e5; oracle compares run
  at sf0.01/sf0.1 only.)
- **grid-margin** — the rounded expression is ONE bare SUM over terms on
  a decimal grid no finer than 10^-d: the true sum sits ON the round
  grid (margin .5·10^-d ≈ 50e-6 at d=4 vs ~1e-6 observed cross-engine
  jitter) — the CLAUDE.md rule, now machine-checked. The grid resolver
  is CONSERVATIVE: it treats every grid-bearing token in the argument as
  multiplied (dp's add), so it can only over-estimate fineness (flag a
  safe column), never under-estimate (pass an unsafe one). Column grids
  below were measured against the driver parquet at sf0.01 AND sf0.1
  (abs(x·100 − round(x·100)) < 1e-4 for all rows of every dec2 column).
- **pinned** — an explicit ADJUDICATED entry with a structural rationale
  the grid algebra can't express. EMPTY at r15 close (the rank-corr and
  window-mean pins were retired by converting to exact integer
  sufficient statistics / quantized window folds); the mechanism stays
  so a future structurally-safe-but-unexpressible column has a
  documented path. A new hazard column FAILS the default suite until
  quantized or adjudicated here.

Both rounding spellings are audited: ``ROUND(expr, d)`` and the repo's
floor-form ``floor(expr · 10^k + 0.5)`` (same boundary math — r15 found
text_tfidf_vectors' raw float SUM(w) hiding in floor-form clothing).

Seeded mutations below prove the gate can fail: the PRE-r14 q1
sum_charge form (6dp terms under ROUND-4) is flagged, as are
SQRT(AVG(float)) and a floor-form over a raw float sum.
"""

from __future__ import annotations

import re

import pytest

# ---------------------------------------------------------------------
# measured base-column decimal grids (driver parquet, sf0.01 + sf0.1)
# ---------------------------------------------------------------------

# "int" = integer-valued; ("dec", k) = on the 10^-k decimal grid;
# "bexact" = binary-exact non-integers (dyadic: ranks + j/2);
# "unbounded" = arbitrary doubles.
COLUMN_GRID = {
    # lineitem
    "l_quantity": "int",
    "l_extendedprice": ("dec", 2),
    "l_discount": ("dec", 2),
    "l_tax": ("dec", 2),
    # orders / customer / supplier / part
    "o_totalprice": ("dec", 2),
    "c_acctbal": ("dec", 2),
    "s_acctbal": ("dec", 2),
    "p_retailprice": ("dec", 2),
    "p_size": "int",
    # synthetic partsupp: generated as integer cents / 100 (sources/
    # synthetic.py — bit-identical replay contract)
    "ps_supplycost": ("dec", 2),
    "ps_availqty": "int",
    # events
    "value": ("dec", 2),
}

# per-entry grids for CTE/subquery aliases the global map can't know
ENTRY_GRIDS = {
    # volume = l_extendedprice * (1 - l_discount) → 2dp × 2dp
    "q7_nation_volume": {"volume": ("dec", 4)},
    # qvol = CAST(floor(volume · 1e4 + 0.5) AS BIGINT) (r15 quantized)
    "q8_market_share": {"qvol": "int"},
    # same-region nation graph: weight literal 1.0, keys integer
    "a22_laplacian_smoothness": {
        "weight": "int", "src": "int", "dst": "int",
    },
    # KS replay: cumulative / per-bucket COUNTs (integer window sums)
    "a17_ks_events_value": {
        "cp": "int", "cq": "int", "pc": "int", "qc": "int",
    },
    # y = o_totalprice (2dp); ry/rp = RANK + (cnt-1)/2 → dyadic halves
    "a14_regression_metrics": {
        "y": ("dec", 2), "ry": "bexact", "rp": "bexact",
    },
    # midrank columns feeding the exact integer-stat correlations
    "m4_uq_metrics_panel": {
        "rw": "bexact", "rr": "bexact", "rc": "bexact",
    },
    # corpus datasheet: nc = n_chars (BIGINT)
    "text_corpus_datasheet": {"nc": "int"},
    # chunk-census docs-per-chunk count
    "text_chunk_dedup_stats": {"docs": "int"},
}

# Columns that are NEITHER exact-accumulation NOR grid-margin but are
# certified safe by a structural argument + both invariance tiers
# (hostile sf0.01+sf0.1 Spark sweep, DuckDB 4-vs-32-thread tier). Keyed
# by (entry, normalized-expr prefix). Stale pins fail the audit.
#
# EMPTY since r15 round close: the last four pins were retired by
# conversion — the three rank correlations (a14 spearman, m4's two
# Spearman columns) now run on exact integer sufficient statistics
# (metrics.exact_midrank_corr: dyadic midranks ×2 → decimal(38,0)/
# HUGEINT sums, one deterministic double combination — engines' stable
# pairwise CORR merges are float even on integer inputs), and
# rolling_avg_user_events' 3-row window mean became the quantized
# window fold (integer 1e-6-unit window sums / frame count). Pin here
# ONLY with a structural rationale the audit can't express; prefer
# conversion.
ADJUDICATED: dict = {}

AGGS = r"SUM|AVG|CORR|COVAR_POP|COVAR_SAMP|COVAR|STDDEV_POP|STDDEV_SAMP|STDDEV|VAR_POP|VAR_SAMP|VARIANCE|REGR_\w+"
_AGG_RE = re.compile(r"\b(" + AGGS + r")\s*\(", re.I)
# aggregates that are pure selections (order-invariant whatever the arg)
_FREE_AGGS = {"MIN", "MAX", "COUNT"}
# aggregates whose engine implementation merges float partials even on
# exact inputs (Welford/pairwise) — pin-only unless arguments quantized
_STAT_AGGS = {"CORR", "COVAR", "COVAR_POP", "COVAR_SAMP", "STDDEV",
              "STDDEV_POP", "STDDEV_SAMP", "VAR_POP", "VAR_SAMP",
              "VARIANCE"}

# functions returning integers regardless of argument (argument text is
# removed before grid scanning)
_INT_FUNCS = r"length|len|ascii|strlen|octet_length|count|rank|dense_rank|row_number|ntile|sign|year|month|day|hour|minute|datediff|date_diff|instr|position|levenshtein"
# functions that produce arbitrary reals → unbounded
_REAL_FUNCS = r"ln|log|log2|log10|exp|sqrt|cbrt|power|pow|pi|sin|cos|tan|atan|atan2|asin|acos|random|quantile_cont|quantile_disc|percentile|median|corr|stddev\w*|var_pop|var_samp|variance|covar\w*"

_SQL_KEYWORDS = {
    "CASE", "WHEN", "THEN", "ELSE", "END", "AND", "OR", "NOT", "IS",
    "NULL", "IN", "LIKE", "BETWEEN", "AS", "DOUBLE", "BIGINT", "HUGEINT",
    "INT", "INTEGER", "SMALLINT", "TINYINT", "FLOAT", "REAL", "VARCHAR",
    "BOOLEAN", "DECIMAL", "NUMERIC", "OVER", "PARTITION", "BY", "ORDER",
    "ROWS", "RANGE", "PRECEDING", "FOLLOWING", "CURRENT", "ROW",
    "UNBOUNDED", "SELECT", "FROM", "WHERE", "GROUP", "DISTINCT",
    "FILTER", "TRUE", "FALSE",
    # grid-transparent wrappers (their argument tokens are still scanned)
    "CAST", "COALESCE", "GREATEST", "LEAST", "ABS", "NULLIF", "IFNULL",
    "IF", "TRY_CAST",
}


def _balanced(s: str, start: int) -> int:
    """Index just past the ')' matching the '(' that s[start-1] opened."""
    depth, i = 1, start
    while depth and i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    return i


def _split_top_comma(body: str):
    depth, cut = 0, None
    for j, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            cut = j
    if cut is None:
        return body, None
    return body[:cut], body[cut + 1:].strip()


# matches `<expr> * 1eK + 0.5` AND the plain-constant spelling
# `<expr> * 10...0 + 0.5` (r15 review: the scientific-only pattern let
# `floor(SUM(w) * 10000 + 0.5)` — the same hazard with a different
# literal — escape the gate)
_FLOOR_FORM = re.compile(
    r"(.*?)\*\s*(?:1e(\d+)|1(0+))\s*\+\s*0\.5\s*$", re.S
)


def extract_rounded_aggs(sql: str):
    """Yield (expr, digits, form) for every ROUND(expr, d) and
    floor(expr * 10^K + 0.5) (either literal spelling) whose expr
    contains a float aggregate. SQL line comments are stripped first
    (docs may NAME hazard shapes)."""
    sql = re.sub(r"--[^\n]*", "", sql)
    out = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        end = _balanced(sql, m.end())
        expr, d = _split_top_comma(sql[m.end():end - 1])
        if _AGG_RE.search(expr):
            out.append((" ".join(expr.split()), int(d or 0), "ROUND"))
    for m in re.finditer(r"\bfloor\s*\(", sql, re.I):
        end = _balanced(sql, m.end())
        body = sql[m.end():end - 1]
        fm = _FLOOR_FORM.match(body)
        if fm and _AGG_RE.search(fm.group(1)):
            k = int(fm.group(2)) if fm.group(2) else len(fm.group(3))
            out.append((" ".join(fm.group(1).split()), k, "floor-form"))
    return out


def _strip_case_conditions(expr: str) -> str:
    """Remove WHEN <cond> THEN segments (value grid = THEN/ELSE arms)."""
    out, i = [], 0
    while i < len(expr):
        m = re.match(r"\bWHEN\b", expr[i:], re.I)
        if m:
            depth = 0
            j = i + m.end()
            while j < len(expr):
                if expr[j] == "(":
                    depth += 1
                elif expr[j] == ")":
                    depth -= 1
                tm = re.match(r"\bTHEN\b", expr[j:], re.I)
                if tm and depth == 0:
                    j += tm.end()
                    break
                j += 1
            i = j
        else:
            out.append(expr[i])
            i += 1
    return "".join(out)


def _strip_int_funcs(expr: str) -> str:
    """Replace int-returning calls (incl. their arguments) with `1`."""
    pat = re.compile(r"\b(" + _INT_FUNCS + r")\s*\(", re.I)
    while True:
        m = pat.search(expr)
        if not m:
            return expr
        end = _balanced(expr, m.end())
        expr = expr[:m.start()] + " 1 " + expr[end:]


def _strip_floor_quantized(expr: str) -> str:
    """Replace floor(...)/ceil(...) calls (integer results) with `1`."""
    pat = re.compile(r"\b(floor|ceil|ceiling)\s*\(", re.I)
    while True:
        m = pat.search(expr)
        if not m:
            return expr
        end = _balanced(expr, m.end())
        expr = expr[:m.start()] + " 1 " + expr[end:]


def _split_top_additive(e: str):
    """Split at top-level +/- (outside parens); drop empty parts (unary
    signs). Addition/subtraction on decimal grids keeps the COARSEST-
    SUFFICIENT grid = max of part grids, so splitting here keeps the
    resolver conservative without over-summing dp across '+'. A +/-
    that is a scientific-notation exponent sign (digit, 'e', sign —
    as in ``1e-6``) is part of the literal, not an operator."""
    parts, depth, cur = [], 0, []
    for i, ch in enumerate(e):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        sci_sign = (
            ch in "+-"
            and i >= 2
            and e[i - 1] in "eE"
            and e[i - 2].isdigit()
        )
        if ch in "+-" and depth == 0 and not sci_sign:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in parts if p.strip()]


_NUM_SCI = re.compile(r"\d+(?:\.\d+)?[eE][+-]?\d+")
_TOKEN = re.compile(
    r"\d+(?:\.\d+)?[eE][+-]?\d+|[A-Za-z_][A-Za-z0-9_.]*|\d+\.\d+|\.\d+|\d+"
)


def _part_grid(e: str, entry_grids: dict):
    """Flat grid of one additive part: token dp's SUM (all-multiplied
    conservative upper bound on fineness)."""
    import decimal

    dp, saw_bexact = 0, False
    for tok in _TOKEN.finditer(e):
        t = tok.group(0)
        if _NUM_SCI.fullmatch(t):
            dp += max(0, -decimal.Decimal(t).as_tuple().exponent)
            continue
        if re.fullmatch(r"\d+", t):
            continue
        if re.fullmatch(r"(\d+)?\.\d+", t):
            dp += len(t.split(".")[1].rstrip("0"))
            continue
        name = t.split(".")[-1]  # strip table-alias prefixes
        if name.upper() in _SQL_KEYWORDS or t.upper() in _SQL_KEYWORDS:
            continue
        g = entry_grids.get(name, COLUMN_GRID.get(name))
        if g is None:
            return "unbounded"
        if g == "int":
            continue
        if g == "bexact":
            saw_bexact = True
            continue
        dp += g[1]
    if dp == 0:
        return "bexact" if saw_bexact else "int"
    if saw_bexact:
        return "unbounded"  # dyadic × decimal mixes leave both grids
    return ("dec", dp)


def resolve_grid(expr: str, entry_grids: dict):
    """Conservative value-grid of a scalar SQL expression.

    Returns "int" | "bexact" | ("dec", dp) | "unbounded". Within a
    top-level additive part every grid-bearing token is treated as
    multiplied (dp's add — over-estimates fineness, never
    under-estimates); across top-level +/- the grid is the max (finest)
    of the parts."""
    e = _strip_case_conditions(expr)
    e = _strip_floor_quantized(e)
    e = _strip_int_funcs(e)
    if re.search(r"\b(" + _REAL_FUNCS + r")\s*\(", e, re.I):
        return "unbounded"
    if "/" in e or "%" in e:
        return "unbounded"
    if "**" in e and re.search(r"\d+\.\d*[1-9]", e):
        return "unbounded"
    worst = "int"
    for part in _split_top_additive(e):
        g = _part_grid(part, entry_grids)
        if g == "unbounded":
            return "unbounded"
        if g == "bexact":
            if isinstance(worst, tuple):
                return "unbounded"
            worst = "bexact"
        elif isinstance(g, tuple):
            if worst == "bexact":
                return "unbounded"
            if worst == "int" or g[1] > worst[1]:
                worst = g
    return worst


def _agg_args(expr: str):
    """Yield (AGG_NAME, arg_text) for every aggregate call in expr."""
    for m in _AGG_RE.finditer(expr):
        end = _balanced(expr, m.end())
        yield m.group(1).upper(), expr[m.end():end - 1]


_BARE_SUM = re.compile(r"^SUM\s*\(", re.I)


def classify(entry: str, expr: str, d: int):
    """Verdict for one rounded aggregate column."""
    grids = ENTRY_GRIDS.get(entry, {})
    aggs = list(_agg_args(expr))
    assert aggs, f"{entry}: no aggregate in {expr!r}"
    arg_grids = [
        (a, resolve_grid(arg, grids)) for a, arg in aggs
        if a not in _FREE_AGGS
    ]
    if all(a not in _STAT_AGGS and g in ("int", "bexact")
           for a, g in arg_grids):
        return "exact-accumulation"
    m = _BARE_SUM.match(expr.strip())
    if m and _balanced(expr.strip(), m.end()) == len(expr.strip()):
        g = arg_grids[0][1]
        if isinstance(g, tuple) and g[1] <= d:
            return "grid-margin"
    for (pe, prefix), _why in ADJUDICATED.items():
        if pe == entry and expr.startswith(prefix):
            return "pinned"
    return "FAIL"


def audit_sql(entry: str, sql: str):
    """[(expr, d, form, verdict), ...] for one oracle's SQL."""
    return [
        (expr, d, form, classify(entry, expr, d))
        for expr, d, form in extract_rounded_aggs(sql)
    ]


def audit_all():
    from workbench_spark.queries import oracle_sql

    rows = []
    for name, sql in sorted(oracle_sql().items()):
        for expr, d, form, verdict in audit_sql(name, sql):
            rows.append((name, expr, d, form, verdict))
    return rows


# How many rounded-aggregate columns the registry is expected to carry.
# Update alongside entry changes — a silent drop in coverage (extractor
# rot) fails here just like a new unsafe column fails below. (r15 close:
# 69 = 54 exact-accumulation + 15 grid-margin + 0 pinned; the pre-
# conversion registry carried 85, 16 of which were text_tfidf_vectors'
# floor-forms that the per-term quantization removed outright.)
EXPECTED_AUDITED = 69


# Entries mid-conversion to quantized forms — each must leave this set
# (by conversion) before round close; a hazard column outside the queue
# fails immediately. EMPTY in a shipped round (r15 converted all 9
# hazard entries: q8/q14/q17/a12 in-SQL, a14/m4/embedding_centroids/
# text_lm/text_tfidf via operator exact= switches).
CONVERSION_QUEUE: set[str] = set()


def test_round_sum_audit_all_green():
    rows = audit_all()
    fails = [(n, e[:90], d, f) for n, e, d, f, v in rows
             if v == "FAIL" and n not in CONVERSION_QUEUE]
    assert not fails, (
        "unsafe rounded aggregate columns (quantize with the _Q1_SUM/"
        "_Q1_MEAN integer forms, or adjudicate with a structural "
        f"rationale in ADJUDICATED): {fails}"
    )
    assert len(rows) >= EXPECTED_AUDITED, (
        f"audit coverage shrank: {len(rows)} < {EXPECTED_AUDITED} — "
        "extractor rot or entries removed; update EXPECTED_AUDITED"
    )
    # pins must all be live (stale pins = rule rot)
    used = {
        (n, next(p for (pe, p), _ in ADJUDICATED.items()
                 if pe == n and e.startswith(p)))
        for n, e, d, f, v in rows if v == "pinned"
    }
    stale = set(ADJUDICATED) - used
    assert not stale, f"stale ADJUDICATED pins: {sorted(stale)}"


def test_entry_grids_all_live():
    """Every ENTRY_GRIDS entry must belong to a registered oracle (a
    renamed entry must not leave a stale grid declaration behind)."""
    from workbench_spark.queries import oracle_sql

    o = oracle_sql()
    dead = [n for n in ENTRY_GRIDS if n not in o]
    assert not dead, f"ENTRY_GRIDS for unregistered entries: {dead}"
    dead_pins = [k for k in ADJUDICATED if k[0] not in o]
    assert not dead_pins, f"ADJUDICATED for unregistered entries: {dead_pins}"


# ---------------------------------------------------------------------
# seeded mutations — the gate must be able to FAIL (r14 convention)
# ---------------------------------------------------------------------


def test_seeded_pre_r14_q1_form_fails():
    """The exact column the sf0.1 hostile sweep caught in r14: 1e-6-grid
    terms under ROUND-4 must be flagged."""
    sql = ("SELECT ROUND(SUM(l_extendedprice * (1 - l_discount) * "
           "(1 + l_tax)), 4) AS sum_charge FROM lineitem")
    [(expr, d, form, v)] = audit_sql("q1_pricing_summary", sql)
    assert v == "FAIL" and d == 4 and form == "ROUND"


def test_seeded_sqrt_avg_fails():
    """An aggregate nested under SQRT is still an order-dependent float
    accumulation — nesting must not hide it."""
    sql = "SELECT ROUND(SQRT(AVG(l_extendedprice)), 4) AS x FROM lineitem"
    [(_, _, _, v)] = audit_sql("seeded", sql)
    assert v == "FAIL"


def test_seeded_floor_form_raw_sum_fails():
    """floor(SUM(float)·1e6+0.5) is the same boundary math as ROUND —
    the floor-form spelling must be audited too (the r15 tfidf catch)."""
    sql = ("SELECT floor(SUM(tf * idf) * 1e6 + 0.5) / 1e6"
           " AS x FROM weighted")
    [(_, k, form, v)] = audit_sql("seeded", sql)
    assert v == "FAIL" and k == 6 and form == "floor-form"
    # plain-constant spelling of the same hazard (r15 review catch)
    sql_plain = ("SELECT floor(SUM(tf * idf) * 10000 + 0.5) / 10000"
                 " AS x FROM weighted")
    [(_, k2, form2, v2)] = audit_sql("seeded", sql_plain)
    assert v2 == "FAIL" and k2 == 4 and form2 == "floor-form"
    # same sum on a coarse decimal grid under k=6 is fine (true sum ON
    # its own 1e-4 grid — ROUND-6 is the identity there)
    sql_ok = ("SELECT floor(SUM(o_totalprice * l_discount) * 1e6 + 0.5)"
              " / 1e6 AS x FROM t")
    [(_, _, _, v_ok)] = audit_sql("seeded", sql_ok)
    assert v_ok == "grid-margin"


def test_seeded_unpinned_corr_fails():
    """CORR outside the adjudicated rank-correlation pins must fail even
    with exact-grid arguments (stable pairwise merges are float)."""
    sql = "SELECT ROUND(corr(l_quantity, p_size), 6) AS c FROM t"
    [(_, _, _, v)] = audit_sql("seeded", sql)
    assert v == "FAIL"


def test_safe_forms_pass():
    # the r14 _Q1_SUM quantized integer form → exact-accumulation
    q1sum = ("CAST((SUM(CAST(floor((l_extendedprice * (1 - l_discount) * "
             "(1 + l_tax)) * 1e6 + 0.5) AS BIGINT)) + 50) // 100 AS DOUBLE)"
             " / 1e4")
    sql = f"SELECT ROUND({q1sum}, 4) AS s FROM lineitem"
    [(_, _, _, v)] = audit_sql("safe", sql)
    assert v == "exact-accumulation"
    # bare SUM on a coarse-enough decimal grid → grid-margin
    [(_, _, _, v2)] = audit_sql(
        "safe", "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)"
                " AS s FROM lineitem")
    assert v2 == "grid-margin"
    # ...but the same SUM under ROUND-2 is finer than the grid → FAIL
    [(_, _, _, v3)] = audit_sql(
        "safe", "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)"
                " AS s FROM lineitem")
    assert v3 == "FAIL"
    # indicator AVG (integer THEN/ELSE arms) → exact
    [(_, _, _, v4)] = audit_sql(
        "safe", "SELECT ROUND(AVG(CASE WHEN value > 9.99 THEN 1.0 ELSE 0.0"
                " END), 6) AS s FROM events")
    assert v4 == "exact-accumulation"


def test_grid_resolver_units():
    assert resolve_grid("l_quantity", {}) == "int"
    assert resolve_grid("l_extendedprice * (1 - l_discount)", {}) == ("dec", 4)
    assert resolve_grid(
        "l_extendedprice * (1 - l_discount) * (1 + l_tax)", {}) == ("dec", 6)
    assert resolve_grid("unknown_col", {}) == "unbounded"
    assert resolve_grid("ln(value)", {}) == "unbounded"
    assert resolve_grid("value / 7.0", {}) == "unbounded"
    assert resolve_grid("CAST(floor(x * 1e6 + 0.5) AS BIGINT)", {}) == "int"
    assert resolve_grid("ry", {"ry": "bexact"}) == "bexact"
    assert resolve_grid("ry * value", {"ry": "bexact"}) == "unbounded"
    assert resolve_grid("length(text)", {}) == "int"
    assert resolve_grid(
        "CASE WHEN y >= pred - 1.96*std THEN 1.0 ELSE 0.0 END",
        {}) == "int"
