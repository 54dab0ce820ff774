#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first,
then this script compares each query's parquet result against the oracle SQL
executed by DuckDB over the same testdata parquet tables.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    """Sort columns by name, then rows by all columns, stringify values."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no result parquet")
            fail += 1
            continue
        got = pq.read_table(files).to_pandas()
        want = con.sql(sql).df()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(w.columns)}")
            fail += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}")
            fail += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=0, equal_nan=True):
                    d = (a.astype(float) - b.astype(float)).abs().max()
                    mismatch = f"col {c} float max|diff|={d}"
                    break
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    i = (a.astype(str).values != b.astype(str).values).argmax()
                    mismatch = f"col {c} row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}"
                    break
        if mismatch:
            print(f"[FAIL] {name}: {mismatch}")
            fail += 1
        else:
            print(f"[OK]   {name}: {len(g)} rows, {len(g.columns)} cols exact")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
