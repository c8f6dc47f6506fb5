#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sf_dir> <verify_out_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in DuckDB
with each parquet table registered as a view, load the Spark parquet dump,
sort columns by name (as the driver does), and compare row count, schema,
and exact cell values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        # duckdb may give float32 where spark gives float64 or vice versa
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = normalize(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns differ spark={list(got.columns)} "
                  f"duck={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            # int-vs-float across engines is a REAL failure: the driver
            # hashes raw values, and 4.0 != 4 (caught live by r04's
            # q_pack_contexts, where a DuckDB HUGEINT window sum came back
            # float64). Only float-width and int-width diffs are benign.
            if g.dtype != w.dtype and not (
                    (g.dtype.kind == "f" and w.dtype.kind == "f")
                    or (g.dtype.kind in "iu" and w.dtype.kind in "iu")):
                bad = f"dtype[{c}] spark={g.dtype} duck={w.dtype}"
                break
            if g.dtype.kind == "O" and len(g) and isinstance(
                    g.iloc[0], (list, tuple)) or (
                    len(w) and isinstance(w.iloc[0], (list, tuple))):
                eq = all(
                    list(a) == list(b) if a is not None and b is not None
                    else (a is None) == (b is None)
                    for a, b in zip(g.tolist(), w.tolist()))
            else:
                eq = g.equals(w) or (
                    g.dtype.kind in "if" and w.dtype.kind in "if"
                    and ((g.isna() == w.isna()).all()
                         and (g.fillna(0) == w.fillna(0)).all()))
            if not eq:
                mism = None
                for i, (a, b) in enumerate(zip(g.tolist(), w.tolist())):
                    la = list(a) if isinstance(a, (list, tuple)) else a
                    lb = list(b) if isinstance(b, (list, tuple)) else b
                    if la != lb and not (pd.isna(a) is True and pd.isna(b) is True):
                        mism = (i, a, b)
                        break
                bad = f"col[{c}] first mismatch {mism}"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} oracle queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
