#!/usr/bin/env python3
"""Diagnose which comparator convention reproduces the driver's hash gate.

For each query: load spark result two ways (pyarrow->pandas, duckdb->pandas)
and oracle via duckdb->pandas; print dtype differences and whether str-level
comparison passes.
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

DRIVER_FAIL = {"q01_pricing_summary","q03_join_agg","q05_having","q06_group_expr",
  "q10_star_join","q11_in_subquery","q18_case","q19_math_funcs",
  "q24_count_distinct","q25_stats_agg","q30_window_funcs","q35_seq_match",
  "q44_json_extract","q45_stream_window","q46_sliding_window","q47_sessionize",
  "q61_sql_interface","q65_text_source","q69_range_frame","q70_pipeline_e2e"}


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    mism = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_pa = canon(pd.read_parquet(f"{out_dir}/{name}"))
        spark_dd = canon(con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        want = canon(con.sql(oracle[name]).df())
        # report dtype diffs
        notes = []
        for c in want.columns:
            d_pa, d_dd, d_or = str(spark_pa[c].dtype), str(spark_dd[c].dtype), str(want[c].dtype)
            if len({d_pa, d_dd, d_or}) > 1:
                notes.append(f"{c}: pa={d_pa} dd={d_dd} or={d_or}")
        # str-level compare: pyarrow-read spark vs oracle
        def strfail(g, w):
            if len(g) != len(w):
                return "rowcount"
            for c in w.columns:
                gv, wv = g[c].tolist(), w[c].tolist()
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if str(a) != str(b):
                        return f"{c}[{i}]: {a!r} vs {b!r}"
            return None
        f_pa = strfail(spark_pa, want)
        f_dd = strfail(spark_dd, want)
        pred_fail = f_pa is not None
        ok = (name in DRIVER_FAIL) == pred_fail
        mism.append((name, ok))
        tag = "MATCHES-DRIVER" if ok else "** DISAGREES **"
        print(f"{name}: driver={'FAIL' if name in DRIVER_FAIL else 'pass'} "
              f"strpa={'FAIL' if f_pa else 'pass'} strdd={'FAIL' if f_dd else 'pass'} {tag}")
        if notes:
            print(f"    dtypes: {'; '.join(notes[:4])}")
        if f_pa:
            print(f"    pa-diff: {f_pa}")
        if f_dd and f_dd != f_pa:
            print(f"    dd-diff: {f_dd}")
    bad = [n for n, ok in mism if not ok]
    print(f"== convention(pyarrow-str) disagrees with driver on {len(bad)}: {bad}")


if __name__ == "__main__":
    main()
