#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB against views over <sfDir>, and
compares values exactly: columns sorted by name, rows as a SORTED MULTISET
(the driver pandas-sorts rows before hashing, so emitted order is
irrelevant — do NOT re-add presentation orderBys to queries for parity),
with int/float/bool type classes distinguished (the driver's hash is
dtype-sensitive).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

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

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
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
        scols, srows = rows_of(con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"))
        if name not in oracle:
            status = "ROWS-ONLY" if len(srows) > 0 else "ROWS-ONLY-EMPTY?"
            print(f"{status} {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            ocols, orows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: column mismatch spark={scols} oracle={ocols}"); n_fail += 1; continue
        # The driver sorts rows with pandas before hashing; an array-valued
        # column makes that sort raise (unhashable ndarray — r1
        # udaf_vector_avg). Oracle-checked outputs must be scalar-only.
        bad = [c for c, r0 in zip(scols, zip(*srows)) if srows and any(isinstance(x, list) for x in r0)] if srows else []
        if bad:
            print(f"FAIL {name}: array-valued column(s) {bad} break the driver's pandas row sort"); n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}"); n_fail += 1; continue
        # Driver-faithful compare: the driver SORTS rows (pandas lexsort over
        # all columns) before hashing, so emitted order is irrelevant — we
        # compare the sorted multiset. (Queries whose semantics ARE ordering —
        # top-k, limit/offset — still verify content; their internal sort
        # determines WHICH rows appear.)
        srows_n = sorted((tuple(norm(v) for v in r) for r in srows), key=repr)
        orows_n = sorted((tuple(norm(v) for v in r) for r in orows), key=repr)
        if srows_n == orows_n:
            print(f"PASS {name}: {len(srows)} rows"); n_pass += 1; continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows_n, orows_n)) if a != b]
        print(f"FAIL {name}: {len(diffs)} differing rows; first: idx={diffs[0][0]}")
        print(f"  spark : {diffs[0][1]}")
        print(f"  oracle: {diffs[0][2]}")
        n_fail += 1
    missing = declared - result_dirs
    for name in sorted(missing):
        print(f"FAIL {name}: declared oracle but no Spark output"); n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {len(result_dirs - declared)} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
