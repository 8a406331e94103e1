#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
                              [--vector-threshold N] [--selftest]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB against views over <sfDir>, and
compares values exactly: columns sorted by name, rows as a SORTED MULTISET
(the driver pandas-sorts rows before hashing, so emitted order is
irrelevant — do NOT re-add presentation orderBys to queries for parity),
with int/float/bool type classes distinguished (the driver's hash is
dtype-sensitive).

Two compare paths, same semantics (r16 VERDICT task 1):

- PYTHON path (default, driver-faithful): fetch both sides, per-value
  type tags, bit-packed float compare. Minutes per multi-million-row key
  — the checker cost that blocked the x64f gate for per-row giants.
- VECTOR path (spark-side rows >= --vector-threshold, default 2_000_000):
  the multiset compare runs INSIDE DuckDB — both sides normalized
  per column CLASS and diffed with GROUP BY ALL + EXCEPT in both
  directions. Equivalence to the Python path, class by class:
    * column names sorted and compared identically;
    * INT class (all int widths) -> CAST AS HUGEINT: the Python path
      tags every int value ("INT", v) regardless of width;
    * FLOAT class -> CAST AS DOUBLE plus a signbit() companion column:
      DuckDB's own grouping collapses -0.0/+0.0 (measured) and treats
      NaN self-equal, so value+signbit reproduces the Python path's
      float64-bit compare for every value either engine emits. (Only
      non-sign NaN payload bits are NOT distinguished — the Python path
      packs them, but neither engine emits non-default payloads.)
    * DECIMAL -> CAST AS VARCHAR: the Python path compares str(Decimal),
      which is the same scale-preserving text;
    * TIMESTAMP_S/_MS/_NS -> CAST AS TIMESTAMP: the Python path compares
      fetched datetimes at micro-second granularity;
    * BOOL and every other type: identity compare, but the two sides'
      full type strings must agree (stricter than the Python path only
      for all-NULL columns, where per-value tags see no type at all);
    * rows-as-multiset: GROUP BY ALL keeps NULL==NULL and multiplicity
      via count(*), EXCEPT both ways — exact multiset equality, no
      hashing shortcuts.
  A NESTED column (LIST/STRUCT/MAP) falls back to the Python path —
  list columns must keep producing the canonical driver-sort FAIL.
  Threshold 0 forces the vector path for every key (the cross-validation
  mode: run the full sf0.01 dump both ways and diff the verdicts).
--selftest runs both paths over adversarial micro-cases (signed zero,
NaN, int-vs-float column, decimal scale, multiplicity, row count,
quote-bearing/companion-colliding float column names, and the NESTED
fallback boundary — list equal/unequal, list-vs-scalar dtype,
empty-list multiplicity, zero-row list) and requires verdict agreement;
nested cases additionally require the vector path to REFUSE (fall back)
rather than judge.
"""
import sys, os, json, glob, tempfile
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

VECTOR_THRESHOLD_DEFAULT = 2_000_000

def rows_of(rel):
    cols = [d[0] for d in rel.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return [cols[i] for i in order], [tuple(r[i] for i in order) for r in data]

def norm(v):
    # HUGEINT arrives as int already via python API; Decimal → float-compare risk:
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("DECIMAL", str(v))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    # Type-SENSITIVE: the driver's pandas hash distinguishes int64 vs
    # float64 columns, so 123 (Spark BIGINT floor) != 123.0 (DuckDB DOUBLE
    # floor) there even though Python says they're equal — that was the r1
    # fn_math miss. bool is an int subclass; keep its own tag.
    if isinstance(v, bool):
        return ("BOOL", v)
    if isinstance(v, int):
        return ("INT", v)
    if isinstance(v, float):
        # BIT-sensitive, not ==-sensitive: the driver hashes float64 bits,
        # so -0.0 != +0.0 there (r3 agg_corr_stats miss) while Python's
        # == says they're equal. NaN also becomes self-equal this way.
        import struct
        return ("FLOAT", struct.pack("<d", v))
    return v

def compare_python(con, name, spark_glob, sql):
    """Driver-faithful fetched-row compare. -> (verdict_line, passed)."""
    scols, srows = rows_of(con.sql(f"SELECT * FROM read_parquet('{spark_glob}')"))
    try:
        ocols, orows = rows_of(con.sql(sql))
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}", False
    if scols != ocols:
        return f"FAIL {name}: column mismatch spark={scols} oracle={ocols}", False
    # The driver sorts rows with pandas before hashing; an array-valued
    # column makes that sort raise (unhashable ndarray — r1
    # udaf_vector_avg). Oracle-checked outputs must be scalar-only.
    bad = [c for c, r0 in zip(scols, zip(*srows)) if srows and any(isinstance(x, list) for x in r0)] if srows else []
    if bad:
        return (f"FAIL {name}: array-valued column(s) {bad} break the "
                "driver's pandas row sort", False)
    if len(srows) != len(orows):
        return f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}", False
    # Driver-faithful compare: the driver SORTS rows (pandas lexsort over
    # all columns) before hashing, so emitted order is irrelevant — we
    # compare the sorted multiset. (Queries whose semantics ARE ordering —
    # top-k, limit/offset — still verify content; their internal sort
    # determines WHICH rows appear.)
    srows_n = sorted((tuple(norm(v) for v in r) for r in srows), key=repr)
    orows_n = sorted((tuple(norm(v) for v in r) for r in orows), key=repr)
    if srows_n == orows_n:
        return f"PASS {name}: {len(srows)} rows", True
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows_n, orows_n)) if a != b]
    return (f"FAIL {name}: {len(diffs)} differing rows; first: idx={diffs[0][0]}"
            f"\n  spark : {diffs[0][1]}\n  oracle: {diffs[0][2]}", False)

_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}
_TS_TYPES = {"TIMESTAMP", "TIMESTAMP_S", "TIMESTAMP_MS", "TIMESTAMP_NS"}

def _type_class(tstr):
    u = str(tstr).upper()
    if u == "BOOLEAN":
        return "BOOL"
    if u in _INT_TYPES:
        return "INT"
    if u in ("FLOAT", "DOUBLE", "REAL"):
        return "FLOAT"
    if u.startswith("DECIMAL"):
        return "DECIMAL"
    if u in _TS_TYPES:
        return "TS"
    if u.endswith("[]") or any(u.startswith(p) for p in ("STRUCT", "MAP", "LIST", "UNION")):
        return "NESTED"
    return "OTHER:" + u

def _norm_exprs(cols, classes):
    """Normalized projection (list of SQL select items) for one side."""
    # Signbit companion aliases are POSITIONAL (index, not the column
    # name — a quote-bearing name must not be interpolated raw into the
    # alias, r17 ADVICE) under a prefix escalated until no real column
    # starts with it, so a genuine column named __sb_0 can never collide.
    pre = "__sb_"
    while any(c.startswith(pre) for c in cols):
        pre = "_" + pre
    items = []
    for i, (c, k) in enumerate(zip(cols, classes)):
        q = '"' + c.replace('"', '""') + '"'
        if k == "INT":
            items.append(f"CAST({q} AS HUGEINT) AS {q}")
        elif k == "FLOAT":
            items.append(f"CAST({q} AS DOUBLE) AS {q}")
            items.append(f'signbit(CAST({q} AS DOUBLE)) AS "{pre}{i}"')
        elif k == "DECIMAL":
            items.append(f"CAST({q} AS VARCHAR) AS {q}")
        elif k == "TS":
            items.append(f"CAST({q} AS TIMESTAMP) AS {q}")
        else:
            items.append(q)
    return items

def compare_vector(con, name, spark_glob, sql):
    """DuckDB-side multiset compare. -> (verdict_line, passed) or None to
    fall back to the Python path (NESTED column present)."""
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_glob}') LIMIT 0")
    try:
        con.sql(f"CREATE OR REPLACE TEMP VIEW __vec_oracle AS {sql}")
        orel = con.sql("SELECT * FROM __vec_oracle LIMIT 0")
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}", False
    scols = sorted(srel.columns)
    ocols = sorted(orel.columns)
    if scols != ocols:
        return f"FAIL {name}: column mismatch spark={scols} oracle={ocols}", False
    stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
    otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
    sclass = [_type_class(stypes[c]) for c in scols]
    oclass = [_type_class(otypes[c]) for c in ocols]
    if "NESTED" in sclass or "NESTED" in oclass:
        return None  # python path owns the list-column driver-sort FAIL
    mismatch = [(c, a, b) for c, a, b in zip(scols, sclass, oclass) if a != b]
    if mismatch:
        return (f"FAIL {name}: column dtype-class mismatch "
                + ", ".join(f"{c}: spark {a} vs oracle {b}" for c, a, b in mismatch),
                False)
    try:
        ns = con.sql(f"SELECT count(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
        no = con.sql("SELECT count(*) FROM __vec_oracle").fetchone()[0]
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}", False
    if ns != no:
        return f"FAIL {name}: row count spark={ns} oracle={no}", False
    sel = ", ".join(_norm_exprs(scols, sclass))
    body = (f"WITH __s AS (SELECT {sel} FROM read_parquet('{spark_glob}')), "
            f"__o AS (SELECT {sel} FROM __vec_oracle), "
            f"__sc AS (SELECT *, count(*) AS __mult FROM __s GROUP BY ALL), "
            f"__oc AS (SELECT *, count(*) AS __mult FROM __o GROUP BY ALL) ")
    try:
        ndiff = con.sql(
            body + "SELECT count(*) FROM ((TABLE __sc EXCEPT TABLE __oc) "
                   "UNION ALL (TABLE __oc EXCEPT TABLE __sc))").fetchone()[0]
        if ndiff == 0:
            return f"PASS {name}: {ns} rows (vector compare)", True
        ex_s = con.sql(body + "TABLE __sc EXCEPT TABLE __oc").fetchmany(2)
        ex_o = con.sql(body + "TABLE __oc EXCEPT TABLE __sc").fetchmany(2)
    except Exception as e:
        return f"FAIL {name}: vector compare error: {e}", False
    return (f"FAIL {name}: {ndiff} differing distinct (row, multiplicity) "
            f"groups (vector compare)\n  spark-only : {ex_s}\n  oracle-only: {ex_o}",
            False)

def selftest():
    """Adversarial micro-cases through BOTH paths; verdicts must agree.
    Cases with want_fallback=True pin the NESTED-column routing boundary
    (r17 verdict task 3): the vector path must REFUSE them (return None,
    deferring to Python) AND the Python verdict must be the canonical
    one — FAIL for any materialized list column (the driver's pandas row
    sort raises on ndarray), PASS only for the zero-row case where the
    driver never sees a value. A vector path that 'handled' a nested
    column itself would silently replace driver semantics."""
    con = duckdb.connect()
    cases = [
        # (name, spark-side SQL to dump as parquet, oracle SQL,
        #  want_pass, want_fallback)
        ("equal_multiset",
         "SELECT * FROM (VALUES (1::BIGINT, 'a'), (1::BIGINT, 'a'), (2::BIGINT, 'b')) t(k, s)",
         "SELECT * FROM (VALUES (2::BIGINT, 'b'), (1::BIGINT, 'a'), (1::BIGINT, 'a')) t(k, s)",
         True, False),
        ("signed_zero",
         "SELECT -0.0::DOUBLE AS x",
         "SELECT 0.0::DOUBLE AS x",
         False, False),
        ("nan_self_equal",
         "SELECT 'nan'::DOUBLE AS x UNION ALL SELECT 1.5::DOUBLE",
         "SELECT 1.5::DOUBLE AS x UNION ALL SELECT 'nan'::DOUBLE",
         True, False),
        ("int_vs_float_col",
         "SELECT 123::BIGINT AS x",
         "SELECT 123.0::DOUBLE AS x",
         False, False),
        ("int_width_ok",
         "SELECT 123::INTEGER AS x",
         "SELECT 123::HUGEINT AS x",
         True, False),
        ("decimal_scale",
         "SELECT 1.20::DECIMAL(10,2) AS x",
         "SELECT 1.200::DECIMAL(10,3) AS x",
         False, False),
        ("decimal_equal",
         "SELECT 1.20::DECIMAL(10,2) AS x",
         "SELECT 1.20::DECIMAL(12,2) AS x",
         True, False),
        ("multiplicity",
         "SELECT * FROM (VALUES (1::BIGINT), (1::BIGINT), (2::BIGINT)) t(k)",
         "SELECT * FROM (VALUES (1::BIGINT), (2::BIGINT), (2::BIGINT)) t(k)",
         False, False),
        ("row_count",
         "SELECT * FROM (VALUES (1::BIGINT), (2::BIGINT)) t(k)",
         "SELECT * FROM (VALUES (1::BIGINT)) t(k)",
         False, False),
        ("null_equal",
         "SELECT * FROM (VALUES (NULL::BIGINT, 'a'), (1::BIGINT, NULL)) t(k, s)",
         "SELECT * FROM (VALUES (1::BIGINT, NULL), (NULL::BIGINT, 'a')) t(k, s)",
         True, False),
        ("value_diff",
         "SELECT 1.5000001::DOUBLE AS x",
         "SELECT 1.5000002::DOUBLE AS x",
         False, False),
        ("bool_vs_int_col",
         "SELECT TRUE AS x",
         "SELECT 1::BIGINT AS x",
         False, False),
        # r17 ADVICE: a quote-bearing FLOAT column name must not garble
        # the generated signbit companion (want=PASS so a fails-closed
        # SQL error can't masquerade as agreement).
        ("float_quoted_colname",
         'SELECT -0.0::DOUBLE AS "x""y"',
         'SELECT -0.0::DOUBLE AS "x""y"',
         True, False),
        # ...and a genuine column named like a companion alias must not
        # collide with the generated one (prefix escalation).
        ("float_sb_alias_collision",
         "SELECT 1.5::DOUBLE AS x, 2::BIGINT AS __sb_0",
         "SELECT 1.5::DOUBLE AS x, 2::BIGINT AS __sb_0",
         True, False),
        # NESTED fallback boundary (r17 verdict task 3): routing AND the
        # Python verdict, pinned. Any materialized list column is the
        # canonical driver-sort FAIL — equal lists included.
        ("nested_list_equal",
         "SELECT [1, 2]::BIGINT[] AS x",
         "SELECT [1, 2]::BIGINT[] AS x",
         False, True),
        ("nested_list_unequal",
         "SELECT [1, 2]::BIGINT[] AS x",
         "SELECT [1, 3]::BIGINT[] AS x",
         False, True),
        # list-vs-scalar dtype: NESTED on ONE side alone must already
        # route to Python (the vector dtype-class compare never runs).
        ("nested_vs_scalar_dtype",
         "SELECT [1]::BIGINT[] AS x",
         "SELECT 1::BIGINT AS x",
         False, True),
        ("nested_empty_list_multiplicity",
         "SELECT * FROM (VALUES ([]::BIGINT[]), ([]::BIGINT[])) t(x)",
         "SELECT * FROM (VALUES ([]::BIGINT[])) t(x)",
         False, True),
        # Routing is DTYPE-driven, not value-driven: a zero-row list
        # column still falls back, and Python PASSes it (no value ever
        # reaches the driver's row sort).
        ("nested_zero_rows",
         "SELECT [1]::BIGINT[] AS x WHERE 1 = 0",
         "SELECT [1]::BIGINT[] AS x WHERE 1 = 0",
         True, True),
    ]
    n_bad = 0
    tmp = tempfile.mkdtemp(prefix="check_selftest_")
    try:
        for name, ssql, osql, want, want_fallback in cases:
            d = os.path.join(tmp, name)
            os.makedirs(d, exist_ok=True)
            con.sql(f"COPY ({ssql}) TO '{d}/part0.parquet' (FORMAT PARQUET)")
            lp, pp = compare_python(con, name, f"{d}/*.parquet", osql)
            rv = compare_vector(con, name, f"{d}/*.parquet", osql)
            if want_fallback:
                ok = rv is None and pp == want
                if not ok:
                    n_bad += 1
                print(f"SELFTEST {name}: python={'PASS' if pp else 'FAIL'} "
                      f"vector={'FALLBACK' if rv is None else 'RAN'} "
                      f"want={'PASS' if want else 'FAIL'}+FALLBACK"
                      f" {'OK' if ok else 'MISMATCH'}")
                if not ok:
                    print(f"  python: {lp}\n  vector: {rv}")
                continue
            if rv is None:
                print(f"SELFTEST {name}: vector fell back (NESTED) — unexpected")
                n_bad += 1
                continue
            lv, pv = rv
            ok = (pp == pv == want)
            if not ok:
                n_bad += 1
            print(f"SELFTEST {name}: python={'PASS' if pp else 'FAIL'} "
                  f"vector={'PASS' if pv else 'FAIL'} want={'PASS' if want else 'FAIL'}"
                  f" {'OK' if ok else 'MISMATCH'}")
            if not ok:
                print(f"  python: {lp}\n  vector: {lv}")
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)  # r17 ADVICE: no parquet litter
    print(f"== selftest: {len(cases) - n_bad}/{len(cases)} agree ==")
    sys.exit(1 if n_bad else 0)

def main():
    args = [a for a in sys.argv[1:]]
    if "--selftest" in args:
        selftest()
        return
    vec_threshold = VECTOR_THRESHOLD_DEFAULT
    if "--vector-threshold" in args:
        i = args.index("--vector-threshold")
        vec_threshold = int(args[i + 1])
        del args[i:i + 2]
    sfdir, outdir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    declared = set(oracle)
    result_dirs = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    n_pass = n_fail = 0
    for name in sorted(result_dirs):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_glob = f"{outdir}/{name}/*.parquet"
        if name not in oracle:
            nrows = con.sql(f"SELECT count(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
            status = "ROWS-ONLY" if nrows > 0 else "ROWS-ONLY-EMPTY?"
            print(f"{status} {name}: {nrows} rows (no oracle)")
            continue
        nrows = con.sql(f"SELECT count(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
        res = None
        if nrows >= vec_threshold:
            res = compare_vector(con, name, spark_glob, oracle[name])
        if res is None:
            res = compare_python(con, name, spark_glob, oracle[name])
        line, passed = res
        print(line)
        if passed:
            n_pass += 1
        else:
            n_fail += 1
    missing = declared - result_dirs
    for name in sorted(missing):
        print(f"FAIL {name}: declared oracle but no Spark output"); n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {len(result_dirs - declared)} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
