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

Grows-with-scale detection (r16 ADVICE, resolver rewritten per r17
ADVICE): lexical `sum(` inside the rounded expression, PLUS alias
resolution for the false-PASS direction — a `round(<alias>, k)` where
<alias> is defined elsewhere in the SQL as `<expr> AS <alias>`
(CTE/subquery SELECT list) is treated as growing iff the FULL defining
expression contains a lexical sum(. The r16 resolver pattern-matched a
sum-LEADING shape (`sum(...) [op tail]* AS alias`) and missed
`2 * sum(x) AS a` and `(sum(x)+sum(y))/2 AS a` — a false-PASS path; the
resolver now extracts each alias's whole defining expression with a
balanced-paren scan (string literals masked) and applies the same
lexical test to it. `--selftest` pins both previously-missed shapes.
Known conservative blind spot, accepted: avg-style columns
(round(sum(x)/count(*), k), or an alias of one) ARE projected as growing
even though ratios don't grow — a false FAIL direction only; if one
trips the gate, verify the ratio semantics by hand and record the
waiver in BASELINE.md. Keep new oracle SQL with sums lexically inside
the round() where possible — the resolver is a backstop, not a license.
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


def expr_grows(sql: str, expr_text: str, defs: dict = None) -> bool:
    """True iff the rounded expression accumulates with corpus scale:
    a lexical sum( inside it, or a bare identifier inside it whose FULL
    defining expression (any `<expr> AS <ident>` in the same SQL,
    extracted by _alias_defs' balanced-paren scan) contains a lexical
    sum(. If an alias name is defined at multiple sites, ANY growing
    definition marks it growing — conservative. One resolution level —
    the inventory's oracle SQL nests aliases at most once, and a deeper
    chain still hits the lexical test at its defining site."""
    if re.search(r"\bsum\s*\(", expr_text, re.IGNORECASE):
        return True
    if defs is None:
        defs = _alias_defs(sql)
    for ident in set(re.findall(r"[A-Za-z_]\w*", expr_text)):
        if ident.lower() in _NOT_ALIASES:
            continue
        for definition in defs.get(ident.lower(), []):
            if re.search(r"\bsum\s*\(", definition, re.IGNORECASE):
                return True
    return False


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
        ("avg-of-sums alias: conservative false-FAIL direction, kept",
         "WITH c AS (SELECT g, sum(x) / count(*) AS a FROM t GROUP BY g) "
         "SELECT g, round(a, 2) AS r FROM c", "a", True),
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
