#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs each oracle in DuckDB over the
same testdata, sorts columns by name + rows by value, and compares exactly.

Usage: tools/check.py [sfDir] [verifyOutDir] [queryFilter...]
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import datetime

def canon(v):
    # pyarrow reads spark DATE as datetime.date; duckdb .df() yields
    # midnight Timestamps — the driver treats those as equal, so do we.
    # Same for NULL date/timestamp: None (pyarrow object col) vs NaT
    # (duckdb datetime64 col). Decimals stay distinct from floats
    # (driver-faithful: q133 r02).
    if v is None or v is pd.NaT:
        return None
    if type(v) is datetime.date:
        return pd.Timestamp(v)
    return v

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # stringify to mirror a hash-of-values compare (dtype-insensitive)
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(canon(v)))
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # read spark output with pyarrow/pandas (like the driver), NOT
            # through DuckDB — decimal columns must surface as the driver
            # sees them (Decimal objects) or type skew hides real mismatches
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(files)],
                ignore_index=True)
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(ora_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
        elif len(a) == 0:
            # both empty with matching columns: equal (pandas .equals
            # would compare residual dtypes, which stringification left
            # as object-vs-original ghosts on empty frames)
            print(f"PASS {name} (0 rows)")
            n_pass += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            idx = neq.idxmax()
            print("  spark:", a.loc[idx].to_dict())
            print("  duck :", b.loc[idx].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle) - n_pass - n_fail} skipped ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
