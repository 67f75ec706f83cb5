#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's t2 gate:
run graft.Verify first (dumps <out>/<query>/ parquet + oracle_sql.json), then
this script replays each oracle SQL in DuckDB over the same testdata tables and
compares: columns sorted by name, rows sorted, exact value equality (with a
separate approx-float report so we can tell real bugs from ULP noise).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def approx(a, b):
    if isinstance(a, float) and isinstance(b, float) and a is not None and b is not None:
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return eq(a, b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, gtypes = list(got.columns), [str(t) for t in got.types]
            grows = got.fetchall()
            want = con.sql(sql)
            wcols, wtypes = list(want.columns), [str(t) for t in want.types]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} oracle={wc}")
            failures += 1
            continue
        # The driver's hash is type-sensitive to width classes beyond 64-bit
        # (r1: DuckDB SUM(int) → HUGEINT/int128 vs Spark BIGINT failed) but
        # NOT to int8/16/32/64 differences (r1: INTEGER-vs-BIGINT rank
        # columns all hash-matched). Normalize the ≤64-bit integer family,
        # flag everything else that differs.
        def tclass(t):
            return "int" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                  "UTINYINT", "USMALLINT", "UINTEGER") else t
        gt = [tclass(t) for _, t in sorted(zip(gcols, gtypes))]
        wt = [tclass(t) for _, t in sorted(zip(wcols, wtypes))]
        if gt != wt:
            print(f"FAIL {name}: column types spark={list(zip(gc, gt))} "
                  f"oracle={list(zip(wc, wt))}")
            failures += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(wr)}")
            failures += 1
            continue
        exact = all(all(eq(a, b) for a, b in zip(r1, r2)) for r1, r2 in zip(gr, wr))
        if exact:
            print(f"OK   {name}: {len(gr)} rows exact")
            continue
        near = all(all(approx(a, b) for a, b in zip(r1, r2)) for r1, r2 in zip(gr, wr))
        if near:
            print(f"WARN {name}: {len(gr)} rows approx-only (float ULP) — tighten!")
            failures += 1
        else:
            bad = next((r1, r2) for r1, r2 in zip(gr, wr)
                       if not all(approx(a, b) for a, b in zip(r1, r2)))
            print(f"FAIL {name}: value mismatch\n  spark:  {bad[0]}\n  oracle: {bad[1]}")
            failures += 1
    rows_only = [q for q in json.load(open(f"{out_dir}/oracle_sql.json"))]
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracles green")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
