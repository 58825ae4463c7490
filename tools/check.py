#!/usr/bin/env python3
"""Local dev-loop mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify-out-dir> <sf-dir> [query ...]

Replicates the driver's hash comparison (validated against CORRECTNESS_r01:
the convention below reproduces the driver's pass/fail verdict on all 70
round-1 queries):
  - Spark side: parquet read via pyarrow -> to_pandas(date_as_object=False)
    (so DECIMAL stays decimal.Decimal, int64 stays int, date32 becomes
    datetime64 — exactly what the driver hashes).
  - Oracle side: DuckDB .df() (DECIMAL/HUGEINT become float64).
  - Sort columns by name, sort rows by all columns, compare str(value)
    exactly — so Decimal('1.500000') != 1.5 and 990 != 990.0, like the
    driver's hash. NaN == NaN.
"""
import json, sys
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def read_spark(path):
    return pq.read_table(path).to_pandas(date_as_object=False)


def cmp_vals(a, b):
    sa, sb = str(a), str(b)
    if sa == sb:
        return True
    return sa == "nan" and sb == "nan"


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            got = canon(read_spark(f"{out_dir}/{name}"))
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (g, w) in enumerate(zip(gv, wv)):
                if not cmp_vals(g, w):
                    bad = (c, i, g, w)
                    break
            if bad:
                break
        if bad:
            c, i, g, w = bad
            print(f"FAIL {name}: col {c} row {i}: spark={g!r} oracle={w!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
