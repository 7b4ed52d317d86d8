#!/usr/bin/env python3
"""Strict mimic of a hash-based comparator: sort columns by name, sort
rows, then compare the full repr of every cell (dtype- and
representation-sensitive, unlike pandas ==). Reports first diffs.

Usage: strictdiff.py SFDIR OUTDIR query [query ...]
"""
import json, os, sys, glob
import duckdb
import math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_repr(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return repr(v)


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(cell_repr(row[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    for name in names:
        qdir = os.path.join(outdir, name)
        gcols, got = rows_of(con.sql(f"SELECT * FROM '{qdir}/*.parquet'"))
        wcols, want = rows_of(con.sql(oracles[name]))
        print(f"== {name}: spark cols {gcols} oracle cols {wcols}")
        if gcols != wcols:
            print("   COLUMN MISMATCH")
            continue
        if len(got) != len(want):
            print(f"   ROWCOUNT {len(got)} vs {len(want)}")
        ndiff = 0
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                ndiff += 1
                if ndiff <= 5:
                    print(f"   row {i}:")
                    for c, a, b in zip(gcols, g, w):
                        marker = " <<<" if a != b else ""
                        print(f"     {c}: spark={a} oracle={b}{marker}")
        print(f"   {ndiff} differing rows of {len(got)}" if ndiff
              else "   IDENTICAL under strict repr compare")


if __name__ == "__main__":
    main()
