#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB against the sfDir tables, sort columns by name and rows by all
columns, and compare values cell-by-cell.

Usage: check.py SFDIR OUTDIR [query ...]
"""
import json, os, sys, glob
import math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Canonical string per value — dtype-SENSITIVE like the driver's
    value hash: int 163 != float 163.0 (DuckDB HUGEINT sums come back
    float64 through pandas; the oracle must CAST ... AS BIGINT)."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    return repr(v)


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the 10x
        # scale-probe dirs); the shipped testdata tables are single
        # files — glob accordingly
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir) or (only and name not in only):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1
            continue
        bad = None
        for c in g.columns:
            a = [cell(v) for v in g[c].tolist()]
            b = [cell(v) for v in w[c].tolist()]
            neq = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
            if neq:
                i = neq[0]
                bad = (c, a[i], b[i], len(neq))
                break
        if bad:
            c, av, bv, n = bad
            print(f"FAIL {name}: col {c}: {n} diffs, first got={av!r} want={bv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
