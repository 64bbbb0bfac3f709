#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
first (writes <out>/<query>/ parquet + <out>/oracle_sql.json), then this
script compares each result against DuckDB on the same tables.

Usage: check_correctness.py <sfdir> <outdir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make lists/arrays hashable+comparable and timestamps uniform
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, list) else v))
        if "datetime64" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(str))
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                failures += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                failures += 1
                continue
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
                print(f"OK   {name}  ({len(g)} rows)")
            except AssertionError as e:
                print(f"FAIL {name}: values differ\n  {str(e).splitlines()[-1]}")
                # show first differing cells
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=1)
                print(g[bad].head(3))
                print(w[bad].head(3))
                failures += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            failures += 1
    # queries with no oracle: rows-only
    import os
    for d in sorted(os.listdir(outdir)):
        if d in oracle or d == "oracle_sql.json":
            continue
        if os.path.isdir(f"{outdir}/{d}"):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{outdir}/{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {d}  ({n} rows, no oracle)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
