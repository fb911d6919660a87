#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching oracle SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet. Compares schemas (column names sorted) and values
(rows sorted) and prints a per-query verdict.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
for name, sql in sorted(oracles.items()):
    res_dir = os.path.join(out_dir, name)
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name}: no spark result dir")
        fail += 1
        continue
    spark_df = pq.read_table(res_dir).to_pandas()
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fail += 1
        continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        print(f"SCHEMA   {name}: spark={s_cols} duck={d_cols}")
        fail += 1
        continue
    s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
    d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
    if len(s) != len(d):
        print(f"ROWS     {name}: spark={len(s)} duck={len(d)}")
        fail += 1
        continue
    # Primary check is STRING-exact: the driver hashes stringified values,
    # so an int64 Spark column vs a float64 DuckDB column (HUGEINT sums
    # come back as float64 via pandas) hash-mismatches on the driver even
    # though a dtype-insensitive numeric compare passes ("6" vs "6.0").
    if s.astype(str).equals(d.astype(str)):
        print(f"OK       {name} ({len(s)} rows)")
    else:
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            # values equal but reprs differ -> dtype mismatch the driver
            # would flag (usually a missing CAST(... AS BIGINT) in the SQL)
            kinds = [(c, s[c].dtype, d[c].dtype) for c in s_cols
                     if s[c].dtype.kind != d[c].dtype.kind]
            print(f"DTYPE    {name}: values equal but reprs differ {kinds}")
        except AssertionError as e:
            print(f"VALUES   {name}: {str(e).splitlines()[-1] if str(e) else e}")
        fail += 1
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
