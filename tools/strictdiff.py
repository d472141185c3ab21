#!/usr/bin/env python3
"""Strict Spark-vs-oracle differ: shows per-column physical types and the
first value-level diffs WITHOUT any normalization (no decimal trailing-zero
stripping, no type coercion). Use to explain driver hash mismatches that
tools/check.py's lenient compare hides.

Usage: python3 tools/strictdiff.py <verifyOutDir> <sfDir> [query ...]
"""
import sys, os, json, glob, decimal, datetime

import duckdb
import pyarrow.parquet as pq


def strict(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)  # keeps scale: 1.50 != 1.5
    if isinstance(v, datetime.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "D:" + v.isoformat()
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, bool):
        return "B:" + str(v)
    if isinstance(v, int):
        return "i:" + str(v)
    return "s:" + str(v)


def table_of(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [[strict(r[i]) for i in order] for r in rows]
    data.sort()
    return [cols[i] for i in order], data


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        con.execute(
            f"CREATE VIEW {os.path.basename(t)[:-8]} AS SELECT * FROM '{t}'")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result")
            n_fail += 1
            continue
        # physical schema of the spark parquet
        sp_schema = {f.name: str(f.type) for f in pq.read_schema(files[0])}
        got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        exp = con.execute(oracle[name])
        exp_cols = [d[0] for d in exp.description]
        exp_types = [d[1] for d in exp.description]
        exp_rows = exp.fetchall()
        gc, gd = table_of(got_rows, got_cols)
        ec, ed = table_of(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(gd) != len(ed):
            print(f"FAIL {name}: rows {len(gd)} != {len(ed)}")
            n_fail += 1
            continue
        if gd != ed:
            n_fail += 1
            ndiff = sum(1 for a, b in zip(gd, ed) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(gd)} rows differ")
            print(f"  spark schema: {sp_schema}")
            print(f"  duck types:   {dict(zip(exp_cols, exp_types))}")
            shown = 0
            for a, b in zip(gd, ed):
                if a != b and shown < 3:
                    cells = [(c, x, y) for c, x, y in zip(gc, a, b) if x != y]
                    print(f"  diff: {cells}")
                    shown += 1
        else:
            print(f"PASS {name} ({len(gd)} rows)")
            n_pass += 1
    print(f"\n{n_pass} strict-pass, {n_fail} strict-fail")


if __name__ == "__main__":
    main()
