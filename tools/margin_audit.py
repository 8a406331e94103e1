#!/usr/bin/env python3
"""Margin audit: the round-on-big-double class as a STANDING gate.

Round 15 caught (at x64 facts) a cross-engine divergence class: a
rounded DOUBLE output column diverges between engines once the rounding
quantum stops dominating the double's ULP at the column's magnitude —
either because partial-sum ORDER noise crosses the quantum, or because
round(double, k) itself is implemented differently (DuckDB multiply-based
vs Spark BigDecimal) and the two disagree within ~ULP/2 of a half-quantum.
The round-15 audit that projected and confirmed the class (q1, rollup,
cube, smj — BASELINE.md round-15) ran ad hoc; this tool is that audit,
mechanical and wired into the final-gate checklist (r15 VERDICT task 4).

For every key in <verifyOutDir>/oracle_sql.json it:
  1. finds each top-level `round(<expr>, k) AS <alias>` in the oracle SQL
     (the columns with a rounding quantum — ExactMoney-recipe columns
     have no trailing round by construction and are exempt, which is the
     point: the recipe's output is exact, not rounded);
  2. reads max|v| of that column from the key's Spark result parquet;
  3. computes margin = quantum / ulp(max|v|) — how many ULPs of headroom
     before engine round/sum noise can flip the printed value;
  4. projects the margin to x64-facts magnitude: columns whose rounded
     expression contains a sum( grow linearly with corpus scale, so
     max|v| is multiplied by (64 / <dumpScale>); avg/quantile/ratio
     columns do not grow and keep their measured magnitude.

Exit 1 (loud) if any projected margin falls below THRESHOLD. 256 is the
documented floor: the confirmed-broken keys measured 32-128 at x64, the
clean inventory clears >= 512 (r15 audit), so 256 splits the classes with
a binary order of magnitude on each side.

Usage:
  python3 tools/margin_audit.py <verifyOutDir> [dumpScale] [threshold]
  python3 tools/margin_audit.py --selftest   # resolver agreement cases

dumpScale = the dump's corpus scale in x-facts units relative to sf0.1
(sf0.01 dump = 0.1, sf0.1 = 1, x4f = 4, x16f = 16; default 0.1 — the
driver/Verify scale). The projection multiplier is 64 / dumpScale.
Checklist wiring: run on the sf0.01 Verify dump every final gate
(`python3 tools/margin_audit.py /tmp/vout 0.1`); re-run on a x16f dump
when a money/rounded column changes (projection then needs only x4).

Grows-with-scale detection (r16 ADVICE; resolver rewritten per r17
ADVICE, then generalized to DEGREE analysis): a column's magnitude
scales like N^deg where accumulating aggregates (sum, count) contribute
degree +1, multiplication adds degrees, and division subtracts them —
so `sum(x)`, `2 * sum(x)`, `(sum(x)+sum(y))/2` all have degree 1
(grow), while avg-style ratios (`sum(x)/count(*)`, q1's
`CAST(spc AS DOUBLE)/cnt/100.0` where spc/cnt alias a sum/count) have
degree 0 (don't grow — fixing the false-FAIL the old lexical rule
accepted, which started actually firing on q1's avg_price once the r17
alias-resolution fix landed). Aliases resolve to their FULL defining
expression (`<expr> AS <alias>` anywhere in the SQL, extracted with a
balanced-paren scan, single-quoted literals masked), one level deep.
Degrees are INTERVALS (lo, hi) so uncertainty stays fail-loud:
cancellation through division needs the denominator's LO degree — an
unknown function or unresolvable construct has lo 0 and can never
cancel a growing numerator, while `grows` itself keys on HI, so
anything that might accumulate still projects. Known value-preserving
wrappers (cast/round/coalesce/nullif/greatest/least/abs/...) pass
degrees through; unknown functions pass hi through with lo 0; an
unparseable atom falls back to the old lexical sum( test. The ×64f
MEASURED audit (dumpScale 64, projection ×1 — BASELINE.md r17) is the
ground truth this analysis is checked against: every ratio column it
measured at true magnitude cleared with ≥6.5× headroom.
`--selftest` pins the shapes in both directions. Keep new oracle SQL
with sums lexically inside the round() where possible — the resolver
is a backstop, not a license.
"""
import glob
import json
import math
import os
import re
import sys

import duckdb

THRESHOLD_DEFAULT = 256.0
TARGET_SCALE = 64.0  # project to x64 facts, the measured breaking scale

# round(<balanced-parens expr>, k) [+ 0.0] AS alias  — expr may nest 3 deep
_INNER = r"(?:[^()]|\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\))*"
ROUND_AS = re.compile(
    r"round\(\s*(" + _INNER + r")\s*,\s*(\d+)\s*\)"  # expr, k
    r"(?:\s*\+\s*0\.0)?"                             # the -0.0 normalizer
    r"\s+AS\s+(\w+)",                                # alias
    re.IGNORECASE | re.DOTALL)


# SQL keywords/functions that can appear inside a rounded expression and
# must not be mistaken for resolvable column aliases.
_NOT_ALIASES = frozenset(
    "round sum avg count min max cast as and or not case when then else end "
    "null is nan isnan abs coalesce nullif greatest least if double float "
    "bigint int integer decimal numeric varchar between in like distinct "
    "filter where over partition by order asc desc".split())


def _alias_defs(sql: str) -> dict:
    """Map lowercased alias -> list of FULL defining expression texts, one
    per `<expr> AS <alias>` site anywhere in the SQL. The r16 resolver
    pattern-matched only sum-LEADING definitions and missed leading
    factors (`2 * sum(x) AS a`) and parenthesized combinations
    (`(sum(x)+sum(y))/2 AS a`) — r17 ADVICE. This scanner instead walks
    BACKWARD from each `AS <ident>` to the start of its select item:
    the nearest comma or SELECT keyword at the alias's own paren depth,
    or the opening paren of the enclosing list — so the expression is
    the maximal balanced span, whatever its leading token. String
    literals are masked first so quoted text can neither hide a
    delimiter nor contribute a fake `AS`/`sum(`. Table aliases
    (`FROM t AS x`) resolve to a bare table name, which contains no
    sum( and is therefore harmless."""
    n = len(sql)
    depth = [0] * n     # nesting level CONTAINING each char (delimiters
    instr = [False] * n  # get the outer level, see backward-stop rules)
    d = 0
    quote = None
    i = 0
    while i < n:
        ch = sql[i]
        if quote is not None:
            instr[i] = True
            if ch == quote:
                if i + 1 < n and sql[i + 1] == quote:  # doubled = escaped
                    instr[i + 1] = True
                    depth[i], depth[i + 1] = d, d
                    i += 2
                    continue
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            instr[i] = True
        elif ch == "(":
            depth[i] = d   # the paren itself sits at the OUTER level
            d += 1
            i += 1
            continue
        elif ch == ")":
            d -= 1
        depth[i] = d
        i += 1
    defs = {}
    for m in re.finditer(r"\bAS\s+([A-Za-z_]\w*)", sql, re.IGNORECASE):
        a = m.start()
        if instr[a]:
            continue
        d0 = depth[a]
        j = a - 1
        start = 0
        while j >= 0:
            if not instr[j]:
                if depth[j] < d0:          # opening paren of the list
                    start = j + 1
                    break
                if depth[j] == d0 and sql[j] == ",":
                    start = j + 1
                    break
                if (depth[j] == d0 and sql[j] in "tT"
                        and sql[max(0, j - 5):j + 1].upper() == "SELECT"
                        and (j - 5 <= 0
                             or not (sql[j - 6].isalnum() or sql[j - 6] == "_"))):
                    start = j + 1
                    break
            j -= 1
        defs.setdefault(m.group(1).lower(), []).append(sql[start:a].strip())
    return defs


# Functions whose RESULT scales like their (max-degree) argument: safe to
# pass both interval bounds through. Everything NOT here passes only the
# hi bound (lo 0) so it can never enable cancellation via division.
_PASSTHROUGH_FNS = frozenset(
    "cast try_cast round abs floor ceil ceiling trunc truncate coalesce "
    "ifnull nullif greatest least if sign".split())
# Aggregates whose result accumulates linearly with corpus scale.
_GROWING_FNS = frozenset(["sum", "count"])
# Aggregates/functions whose result magnitude is scale-invariant.
_FLAT_FNS = frozenset(
    "avg mean median min max mode stddev stddev_pop stddev_samp variance "
    "var_pop var_samp corr covar_pop covar_samp skewness kurtosis quantile "
    "quantile_cont quantile_disc percentile_cont percentile_disc "
    "any_value arbitrary first last bool_and bool_or".split())

_CAST_TAIL = re.compile(
    r"\s+AS\s+[A-Za-z_]\w*(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?\s*$",
    re.IGNORECASE)


def _mask_strings(s: str) -> str:
    """Blank out single-quoted SQL string literal CONTENTS (quotes kept)
    so literal text can't look like operators, parens, or sum(."""
    out = list(s)
    i, n, inq = 0, len(s), False
    while i < n:
        if s[i] == "'":
            if inq and i + 1 < n and s[i + 1] == "'":  # doubled = escaped
                out[i] = out[i + 1] = " "
                i += 2
                continue
            inq = not inq
        elif inq:
            out[i] = " "
        i += 1
    return "".join(out)


def _split_top(s: str, seps: str):
    """Split at paren depth 0 on any char in seps -> [(segment, sep), ...]
    where sep is the separator FOLLOWING the segment (None for the last)."""
    parts, cur, d = [], [], 0
    for ch in s:
        if ch == "(":
            d += 1
        elif ch == ")":
            d = max(0, d - 1)
        if d == 0 and ch in seps:
            parts.append(("".join(cur), ch))
            cur = []
        else:
            cur.append(ch)
    parts.append(("".join(cur), None))
    return parts


def _whole_call(s: str):
    """If s is exactly one function call `name( ... )`, return
    (name_lower, inner_text); else None."""
    m = re.match(r"^([A-Za-z_]\w*)\s*\(", s)
    if not m or not s.endswith(")"):
        return None
    d = 0
    for i in range(m.end() - 1, len(s)):
        if s[i] == "(":
            d += 1
        elif s[i] == ")":
            d -= 1
            if d == 0:
                return (m.group(1).lower(), s[m.end():i]) \
                    if i == len(s) - 1 else None
    return None


def _union(ivs):
    los, his = zip(*ivs)
    return (max(los), max(his))  # additive terms: magnitude ~ the max-deg term


def _expr_degree(s: str, defs: dict, depth: int, seen: frozenset = frozenset()):
    """Interval (lo, hi) of the scale exponent of expression s. `seen`
    carries the alias names currently being resolved: a re-entrant
    reference (`CAST(n_tokens AS INT) AS n_tokens` — the outer SELECT
    renaming a CTE column after itself) is SQL scoping pointing at the
    deeper scope, i.e. a plain column, degree (0, 0); without this the
    cycle hits the depth cap and reads (0, 1) noise. A genuine
    `sum(x) AS x` shadow still grows: the sum( is seen before the inner
    x is ever resolved."""
    if depth > 8:  # pathological nesting: assume growing
        return (0, 1)
    s = s.strip()
    if not s or s == "*":  # count(*)'s argument
        return (0, 0)
    add = _split_top(s, "+-")
    terms = [t for t, _ in add if t.strip()]
    if len(terms) > 1:
        return _union([_expr_degree(t, defs, depth + 1, seen) for t in terms])
    if len(terms) == 1 and terms[0].strip() != s:
        s = terms[0].strip()  # unary sign stripped
    mul = _split_top(s, "*/%")
    if len(mul) > 1:
        lo, hi = _expr_degree(mul[0][0], defs, depth + 1, seen)
        op = mul[0][1]
        for seg, nxt in mul[1:]:
            slo, shi = _expr_degree(seg, defs, depth + 1, seen)
            if op == "*":
                lo, hi = lo + slo, hi + shi
            elif op == "/":
                lo, hi = lo - shi, hi - slo  # cancel only by PROVEN growth
            else:  # %: result bounded by either operand — no growth claim
                lo, hi = 0, max(hi, shi)
            op = nxt
        return (lo, hi)
    atom = mul[0][0].strip()
    if atom.startswith("(") and atom.endswith(")"):
        inner = _whole_call("__p" + atom)  # reuse the matcher via a fake name
        if inner is not None:
            return _expr_degree(inner[1], defs, depth + 1, seen)
    call = _whole_call(atom)
    if call is not None:
        fn, inner = call
        if fn in _GROWING_FNS:
            # sum/count over DISTINCT saturates with a fixed value domain
            # (facts-scaling duplicates rows): may grow, can never cancel.
            if re.match(r"^\s*DISTINCT\b", inner, re.IGNORECASE):
                return (0, 1)
            return (1, 1)
        if fn in _FLAT_FNS:
            return (0, 0)
        if fn == "cast" or fn == "try_cast":
            inner = _CAST_TAIL.sub("", inner)
        args = [a for a, _ in _split_top(inner, ",")]
        ivs = [_expr_degree(a, defs, depth + 1, seen) for a in args if a.strip()]
        if not ivs:
            return (0, 0)
        lo, hi = _union(ivs)
        return (lo, hi) if fn in _PASSTHROUGH_FNS or fn in ("cast", "try_cast") \
            else (0, hi)  # unknown fn: may grow, can never cancel
    if re.fullmatch(r"[A-Za-z_]\w*", atom):
        if atom.lower() in _NOT_ALIASES:
            return (0, 0)
        if atom.lower() in seen:
            return (0, 0)  # re-entrant alias = inner-scope plain column
        ds = defs.get(atom.lower())
        if ds:
            inner_seen = seen | {atom.lower()}
            return _union([_expr_degree(_mask_strings(d), defs, depth + 1,
                                        inner_seen) for d in ds])
        return (0, 0)  # a raw column: scale-invariant magnitude
    if re.fullmatch(r"(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", atom):
        return (0, 0)
    # Unparseable atom (CASE WHEN, EXTRACT, ::casts, ...): the old
    # lexical rule, hi-only — may grow, can never cancel.
    return (0, 1) if re.search(r"\bsum\s*\(|\bcount\s*\(", atom, re.IGNORECASE) \
        else (0, 0)


def expr_grows(sql: str, expr_text: str, defs: dict = None) -> bool:
    """True iff the rounded expression's magnitude accumulates with corpus
    scale: its scale-exponent interval (see _expr_degree) has hi >= 1.
    Ratios of accumulating aggregates (sum/count and friends) cancel to
    degree 0 and correctly do NOT project; any uncertain construct keeps
    hi >= 1 and still projects (fail-loud)."""
    if defs is None:
        defs = _alias_defs(sql)
    return _expr_degree(_mask_strings(expr_text), defs, 0)[1] >= 1


def selftest():
    """Resolver agreement cases, including the two r17-ADVICE shapes the
    r16 sum-leading pattern missed. Exit 1 on any mismatch."""
    cases = [
        # (label, sql, rounded expr text, want_grows)
        ("direct sum",
         "SELECT round(sum(x), 2) AS r FROM t GROUP BY g", "sum(x)", True),
        ("leading factor alias (r17 ADVICE miss)",
         "WITH c AS (SELECT g, 2 * sum(x) AS a FROM t GROUP BY g) "
         "SELECT g, round(a, 2) AS r FROM c", "a", True),
        ("parenthesized multi-sum alias (r17 ADVICE miss)",
         "WITH c AS (SELECT g, (sum(x) + sum(y)) / 2 AS a FROM t GROUP BY g) "
         "SELECT g, round(a, 2) AS r FROM c", "a", True),
        ("sum-leading tail alias (r16 shape still resolves)",
         "WITH c AS (SELECT g, sum(x) * 0.2 AS a FROM t GROUP BY g) "
         "SELECT g, round(a, 2) AS r FROM c", "a", True),
        ("avg-of-sums alias cancels: degree 1 - 1 = 0",
         "WITH c AS (SELECT g, sum(x) / count(*) AS a FROM t GROUP BY g) "
         "SELECT g, round(a, 2) AS r FROM c", "a", False),
        ("q1 avg_price shape: CAST(sum-alias)/count-alias/literal cancels",
         "WITH t AS (SELECT g, CAST(sum(CAST(pc AS DECIMAL(38,0))) AS "
         "BIGINT) AS spc, count(*) AS cnt FROM b GROUP BY g) "
         "SELECT g, round(CAST(spc AS DOUBLE) / cnt / 100.0, 6) AS r FROM t",
         "CAST(spc AS DOUBLE) / cnt / 100.0", False),
        ("ratio of two sums cancels",
         "SELECT round(sum(x) / sum(y), 4) AS r FROM t",
         "sum(x) / sum(y)", False),
        ("product of sums over one count still grows (degree 1+1-1)",
         "SELECT round(sum(x) * sum(y) / count(*), 2) AS r FROM t",
         "sum(x) * sum(y) / count(*)", True),
        ("division by a FLAT aggregate does not cancel",
         "SELECT round(sum(x) / max(y), 2) AS r FROM t",
         "sum(x) / max(y)", True),
        ("nullif-wrapped count still cancels (pass-through lo)",
         "SELECT round(sum(x) / nullif(count(*), 0), 2) AS r FROM t",
         "sum(x) / nullif(count(*), 0)", False),
        ("unknown function can never cancel (lo 0)",
         "SELECT round(sum(x) / mystery(count(*)), 2) AS r FROM t",
         "sum(x) / mystery(count(*))", True),
        ("count(DISTINCT ...) saturates: cannot cancel, still projects alone",
         "SELECT round(sum(x) / count(DISTINCT u), 2) AS r FROM t",
         "sum(x) / count(DISTINCT u)", True),
        ("reciprocal of a sum shrinks: not growing",
         "SELECT round(100.0 / sum(x), 8) AS r FROM t",
         "100.0 / sum(x)", False),
        ("self-shadow RENAME alias is a plain column, not a cycle",
         "WITH t AS (SELECT doc_id, len(xs) AS n_tokens FROM d) "
         "SELECT CAST(n_tokens AS INT) AS n_tokens, "
         "round(least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0, 6) AS r "
         "FROM t", "least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0", False),
        ("self-shadow SUM alias still grows (sum seen before re-entry)",
         "WITH t AS (SELECT g, sum(x) AS x FROM d GROUP BY g) "
         "SELECT g, round(x, 2) AS r FROM t", "x", True),
        ("avg alias does not grow",
         "WITH c AS (SELECT g, avg(x) AS a FROM t GROUP BY g) "
         "SELECT g, round(a, 2) AS r FROM c", "a", False),
        ("plain column does not grow",
         "SELECT round(l_discount, 2) AS r FROM lineitem", "l_discount", False),
        ("sum( inside a string literal does not poison the alias",
         "SELECT round(a, 2) AS r FROM "
         "(SELECT x AS a, 'sum(q) AS a' AS note FROM t)", "a", False),
        ("case-insensitive alias resolution",
         "WITH c AS (SELECT g, 3 - SUM(x) AS BigA FROM t GROUP BY g) "
         "SELECT g, round(biga, 2) AS r FROM c", "biga", True),
        ("second select item after a comma resolves cleanly",
         "WITH c AS (SELECT g, min(x) AS lo, (sum(x)) + 1 AS a FROM t "
         "GROUP BY g) SELECT g, round(a, 2) AS r FROM c", "a", True),
    ]
    bad = 0
    for label, sql, expr, want in cases:
        got = expr_grows(sql, expr)
        ok = got == want
        bad += 0 if ok else 1
        print(f"SELFTEST {'OK ' if ok else 'MISMATCH'} grows={got} "
              f"want={want} — {label}")
    print(f"== margin_audit selftest: {len(cases) - bad}/{len(cases)} agree ==")
    sys.exit(1 if bad else 0)


def out_columns(con, result_dir):
    return {d[0] for d in con.sql(
        f"SELECT * FROM read_parquet('{result_dir}/*.parquet') LIMIT 0").description}


def audit_key(con, name, sql, result_dir, proj_mult):
    findings = []
    cols = out_columns(con, result_dir)
    defs = _alias_defs(sql)  # one balanced-paren scan per key, not per column
    for m in ROUND_AS.finditer(sql):
        expr_text, k, alias = m.group(1), int(m.group(2)), m.group(3)
        quantum = 10.0 ** (-k)
        files = glob.glob(os.path.join(result_dir, "*.parquet"))
        if not files:
            findings.append(dict(key=name, column=alias, k=k, error="no result parquet"))
            continue
        if alias not in cols:
            # A round() in a CTE/subquery whose alias never reaches the
            # output: a PER-ROW round at row magnitude, not the
            # accumulate-then-round class (any later aggregation of it is
            # audited via ITS output column). Reported, not silent — a
            # silent skip would read as "covered" when it wasn't.
            findings.append(dict(key=name, column=alias, k=k, skipped="intermediate"))
            continue
        try:
            row = con.sql(
                f"SELECT max(abs({alias})) FROM read_parquet('{result_dir}/*.parquet') "
                f"WHERE {alias} IS NOT NULL AND NOT isnan({alias}) AND isfinite({alias})"
            ).fetchone()
        except duckdb.Error as e:
            findings.append(dict(key=name, column=alias, k=k, error=str(e).splitlines()[0]))
            continue
        maxabs = row[0] if row and row[0] is not None else 0.0
        grows = expr_grows(sql, expr_text, defs)
        projected = maxabs * (proj_mult if grows else 1.0)
        margin_now = quantum / math.ulp(maxabs) if maxabs > 0 else float("inf")
        margin_x64 = quantum / math.ulp(projected) if projected > 0 else float("inf")
        findings.append(dict(key=name, column=alias, k=k, maxabs=maxabs,
                             grows_with_scale=grows, margin_now=margin_now,
                             margin_x64=margin_x64))
    return findings


def main():
    if "--selftest" in sys.argv[1:]:
        selftest()
        return
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    outdir = sys.argv[1]
    dump_scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else THRESHOLD_DEFAULT
    proj_mult = TARGET_SCALE / dump_scale
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    all_findings, errors, skipped = [], [], []
    for name in sorted(oracle):
        rd = os.path.join(outdir, name)
        if not os.path.isdir(rd):
            continue  # key not in this (possibly key-filtered) dump
        for f in audit_key(con, name, oracle[name], rd, proj_mult):
            if "error" in f:
                errors.append(f)
            elif "skipped" in f:
                skipped.append(f)
            else:
                all_findings.append(f)

    all_findings.sort(key=lambda f: f["margin_x64"])
    print(f"# margin audit: {len(all_findings)} rounded DOUBLE columns, "
          f"dumpScale={dump_scale} -> x64 projection x{proj_mult:g}, "
          f"threshold {threshold:g}")
    print(f"{'key':28s} {'column':18s} {'k':>2s} {'max|v|':>14s} "
          f"{'grows':>5s} {'margin@dump':>12s} {'margin@x64':>11s}")
    for f in all_findings:
        print(f"{f['key']:28s} {f['column']:18s} {f['k']:2d} {f['maxabs']:14.6g} "
              f"{str(f['grows_with_scale']):>5s} {f['margin_now']:12.3g} "
              f"{f['margin_x64']:11.3g}")
    for f in skipped:
        print(f"skipped (intermediate, per-row round) {f['key']}.{f['column']}")
    for f in errors:
        print(f"ERROR {f['key']}.{f['column']}: {f['error']}")

    bad = [f for f in all_findings if f["margin_x64"] < threshold]
    if errors:
        print(f"\nFAIL: {len(errors)} column(s) could not be audited (see ERROR lines)")
        sys.exit(1)
    if bad:
        print(f"\nFAIL: {len(bad)} column(s) under margin {threshold:g} at x64 — "
              "convert to the ExactMoney integer recipe or justify in BASELINE.md:")
        for f in bad:
            print(f"  {f['key']}.{f['column']}: margin@x64 {f['margin_x64']:.3g}")
        sys.exit(1)
    print(f"\nOK: every rounded DOUBLE column clears margin {threshold:g} at x64")


if __name__ == "__main__":
    main()
