#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 correctness check.

NOT part of the shipped library (the Scala/Spark code never calls this).
Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

For each query dumped by graft.Verify it runs the corresponding oracle
SQL from oracle_sql.json in DuckDB over views of the same parquet tables,
sorts columns by name (like the driver), and compares row counts, dtypes,
and values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        bad = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                af = isinstance(a, float) and isinstance(b, float)
                if af and math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={a!r} oracle={b!r}")
        else:
            print(f"OK   {name}: {len(g)} rows")
            n_ok += 1
    print(f"== {n_ok}/{len(oracles)} queries match ==")
    return 0 if n_ok == len(oracles) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
