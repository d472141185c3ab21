#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verifyOutDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
corresponding oracle SQL from <outDir>/oracle_sql.json in DuckDB against
the parquet tables in <sfDir>, and compares: schema (column names),
row count, and a hash over the values with columns sorted by name and
rows sorted. Strict string-rendering comparison — stricter than any
plausible driver comparator, so green here should mean green there.
"""
import sys, os, json, glob, decimal, datetime

import duckdb


def norm(v):
    # STRICT, type-tagged rendering. Round 1 lesson: normalizing decimal
    # trailing zeros here hid 13 driver hash mismatches (Spark decimal
    # "257436.00" vs the driver's float-rendered oracle "257436.0").
    # Queries must now emit the SAME physical type on both sides
    # (decimal math internally, final CAST AS DOUBLE) — so any type or
    # scale difference is a real failure.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "B:" + str(v)
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, decimal.Decimal):
        # defensive rendering only: the oracle_type_violations guard
        # rejects DECIMAL result columns before any comparison, so this
        # branch is unreachable for oracle results (policy: CAST to
        # DOUBLE/BIGINT at the oracle's edge, never compare decimals)
        return "d:" + str(v)
    if isinstance(v, datetime.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "D:" + v.isoformat()
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, int):
        return "i:" + str(v)
    return "s:" + str(v)


def oracle_type_violations(con, sql):
    """Round 13 lesson: DuckDB `sum()` over integers returns HUGEINT
    (int128). A typed comparator (the driver's Arrow/parquet layer)
    hash-differs int128 vs Spark's int64 even on identical values,
    while this script is blind to it (Python renders both as `int`).
    So: fail any oracle whose RESULT SCHEMA contains a type that can
    never round-trip to a Spark result column — HUGEINT/UHUGEINT, any
    nested type, or a DECIMAL that escaped the final CAST AS DOUBLE.
    Types come from the lazy relation — no execution cost."""
    rel = con.sql(sql)
    bad = []
    for c, t in zip(rel.columns, (str(t).upper() for t in rel.types)):
        if (t in ("HUGEINT", "UHUGEINT") or "[]" in t
                or t.startswith(("STRUCT", "MAP", "LIST", "UNION", "DECIMAL"))):
            bad.append(f"{c}:{t}")
    return bad


def guard_selftest(con):
    # the guard itself must trip on a deliberately bare integer sum()
    # (DuckDB returns HUGEINT) — if this ever passes clean, the guard
    # is broken and every oracle "pass" below is suspect.
    bad = oracle_type_violations(con, "SELECT sum(i) AS s FROM range(3) t(i)")
    if not bad:
        print("FATAL: oracle type guard self-test failed "
              "(bare sum() did not trip HUGEINT detection)")
        sys.exit(2)


def table_of(rows, cols):
    # sort columns by name, then rows lexicographically by normalized values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [[norm(r[i]) for i in order] for r in rows]
    data.sort()
    return [cols[i] for i in order], data


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    guard_selftest(con)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        try:
            bad_types = oracle_type_violations(con, oracle[name])
            if bad_types:
                print(f"FAIL {name}: oracle result-type guard: {bad_types} "
                      "(HUGEINT/nested/DECIMAL cannot round-trip a typed "
                      "comparator — CAST in the final projection)")
                n_fail += 1
                continue
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gd = table_of(got_rows, got_cols)
        ec, ed = table_of(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gd) != len(ed):
            print(f"FAIL {name}: rows {len(gd)} != {len(ed)}")
            n_fail += 1
        elif gd != ed:
            diffs = [(a, b) for a, b in zip(gd, ed) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gd)} rows)")
            n_pass += 1
    # queries without oracle: rows-only check
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d) or name in oracle:
            continue
        if only and name not in only:
            continue
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        status = "PASS" if n > 0 else "WARN(empty)"
        print(f"{status} {name} (rows-only, {n} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
