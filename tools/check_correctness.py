#!/usr/bin/env python3
"""Local replay of the driver's correctness gate (dev tool only, not part
of the library): compare Verify output parquet vs DuckDB oracle results.

Usage: python3 tools/check_correctness.py <verify_out_dir> [sf_dir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_fail += 1; continue
        # dtype KIND parity approximates the driver's schema compare:
        # int-width differences (int32 vs int64) pass there (r08 evidence),
        # but int-vs-float / numeric-vs-object drifts do not
        def kind(s):
            k = s.dtype.kind
            return "i" if k in "iu" else k
        bad_types = [(c, str(got[c].dtype), str(want[c].dtype))
                     for c in got.columns if kind(got[c]) != kind(want[c])]
        if bad_types:
            print(f"FAIL {name}: dtype kinds differ {bad_types}")
            n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                av = a.astype(float).to_numpy(); bv = b.astype(float).to_numpy()
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    d = np.nanmax(np.abs(av - bv))
                    mismatch = f"col {c}: {np.sum(~eq)} diffs, maxabs {d:.3e}"
                    break
            else:
                if not a.astype(str).equals(b.astype(str)):
                    i = (a.astype(str) != b.astype(str)).idxmax()
                    mismatch = f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
                    break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            print(f"PASS {name} ({got.shape[0]} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
