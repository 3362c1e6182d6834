#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
corresponding oracle SQL from oracle_sql.json in DuckDB (tables = parquet
files in sfDir), sort columns by name, sort rows, and compare values exactly.
Prints PASS/FAIL per query. Queries without oracle SQL get a rows-only check.
"""
import json
import os
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # fold -0.0 and represent with repr for exactness
                v = v + 0.0
            vals.append(repr(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            for name, msg in sorted(json.load(f).items()):
                print(f"FAIL(query-err)    {name}: {msg[:140]}")
                n_fail += 1
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if q not in oracles:
            status = "PASS(rows-only)" if len(got_rows) > 0 else "FAIL(empty)"
            print(f"{status:18s} {q}: {len(got_rows)} rows")
            n_pass += status.startswith("PASS")
            n_fail += status.startswith("FAIL")
            continue
        try:
            want = con.execute(oracles[q])
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL(oracle-err)   {q}: {str(e)[:120]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL(schema)       {q}: spark={sorted(got_cols)} duckdb={sorted(want_cols)}")
            n_fail += 1
            continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if g == w:
            print(f"PASS               {q}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL(values)       {q}: {len(g)} vs {len(w)} rows; first diffs:")
            for a, b in diff:
                print(f"    spark : {a[:160]}")
                print(f"    duckdb: {b[:160]}")
            if len(g) != len(w):
                only_g = set(g) - set(w)
                only_w = set(w) - set(g)
                for x in list(only_g)[:2]:
                    print(f"    only-spark : {x[:160]}")
                for x in list(only_w)[:2]:
                    print(f"    only-duckdb: {x[:160]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
