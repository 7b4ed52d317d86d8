#!/usr/bin/env python3
"""Drill-down companion to check.py: same tables, same canonical cell
contract (imported, so the two can't drift), but prints the first
differing rows instead of a pass/fail line.

Usage: strictdiff.py SFDIR OUTDIR query [query ...]
"""
import json, os, sys
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, cell


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(cell(row[i]) for i in order) for row in rel.fetchall()]
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
