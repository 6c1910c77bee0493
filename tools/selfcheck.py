#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: load the Spark-written parquet,
run the matching oracle SQL (from oracle_sql.json) in DuckDB over the
sfDir tables, sort columns by name + rows by value, and compare.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize to strings for a stable sort across dtypes
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got_c, want_c = canon(got), canon(want)
        if list(got_c.columns) != list(want_c.columns):
            print(f"FAIL {name}: columns {list(got_c.columns)} vs {list(want_c.columns)}")
            n_fail += 1; continue
        if len(got_c) != len(want_c):
            print(f"FAIL {name}: rows {len(got_c)} vs {len(want_c)}")
            n_fail += 1; continue
        # vectorized compare: exact equality OR both-NaN/None, per column;
        # fall back to stringified equality for dtype-mismatched columns.
        bad = None
        for c in got_c.columns:
            a, b = got_c[c], want_c[c]
            eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            if not eq.all():
                sa, sb = a.astype(str).values, b.astype(str).values
                eq = eq | (sa == sb)
                if not eq.all():
                    i = int((~eq).argmax())
                    bad = (i, c, a.iloc[i], b.iloc[i])
                    break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_c)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
