#!/usr/bin/env python3
"""Local differential checker mirroring the driver's t2 gate:
run each oracle SQL in DuckDB against the sf parquet tables, load the
Spark result parquet, sort columns by name, and compare cell-by-cell.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df


def main(out_dir: str, sf_dir: str) -> int:
    db = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            db.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = norm(pd.read_parquet(qdir))
        if name not in oracles:
            print(f"  -- {name}: no oracle, rows={len(got)}")
            continue
        try:
            want = norm(db.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if str(a.dtype) != str(b.dtype):
                    print(f"FAIL {name}.{c}: dtype {a.dtype} != {b.dtype}")
                    ok = False
                    continue
                if a.dtype == object:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"FAIL {name}.{c}: {int(neq.sum())} diffs, first at row {i}: "
                          f"spark={a[i]!r} duckdb={b[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
