#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB over views named after the testdata parquet
  - sort columns by name, compare row counts, schemas (loosely), and a
    hash of all values.
"""
import sys, json, glob, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(round(v, 9)))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}"); fails += 1; continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORA-ERR  {name}: {e}"); fails += 1; continue
    sh, sn = canon(spark_df)
    dh, dn = canon(duck_df)
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"COLS     {name}: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        fails += 1
    elif sn != dn:
        print(f"ROWS     {name}: spark={sn} duck={dn}"); fails += 1
    elif sh != dh:
        print(f"HASH     {name} ({sn} rows)"); fails += 1
        # show first differing row
        a = spark_df[sorted(spark_df.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
        b = duck_df[sorted(duck_df.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
        for x, y in zip(a, b):
            if x != y:
                print(f"  spark: {x}\n  duck : {y}")
                break
    else:
        print(f"OK       {name} ({sn} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
