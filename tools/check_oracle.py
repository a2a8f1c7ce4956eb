#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
and compares as an order-insensitive multiset of rows (columns sorted by
name, values normalized).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_cols, got_rows)
        wc, wr = canon(want_cols, want_rows)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif gr != wr:
            diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            extra_g = [r for r in gr if r not in set(wr)][:2]
            extra_w = [r for r in wr if r not in set(gr)][:2]
            print(f"FAIL {name}: rows spark={len(gr)} duck={len(wr)}; "
                  f"first diffs {diff} spark-only {extra_g} duck-only {extra_w}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(gr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
