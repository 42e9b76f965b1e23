#!/usr/bin/env python3
"""Local differential checker mirroring the driver's t2 gate:
run each oracle SQL in DuckDB against the sf parquet tables, load the
Spark result parquet, sort columns by name, and compare cell-by-cell.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

CHECK_ORACLE_TIMEOUT_SEC (env, optional): per-oracle wall cap. Several
oracle SQLs are the intentionally-NAIVE quadratic spec (all-pairs
levenshtein / jaccard / cosine) — exactly right at the sf0.01 gate, but
~1e10 ops at sf1, where the engine's own sub-quadratic tiers produced the
answer being checked. A capped oracle interrupts and reports TIMEOUT
(counted separately, not as pass or fail).

CHECK_FLOAT_RTOL (env, optional): relative tolerance for float64 columns.
Unset (the sf0.01 gate) compares exactly; at large sf double aggregates
legitimately drift in the last ulp from summation order.
"""
import json, os, sys, threading
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
        if os.path.isdir(p):  # Spark-written table: a dir of part files
            db.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            db.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    timeout = float(os.environ.get("CHECK_ORACLE_TIMEOUT_SEC", "0")) or None
    rtol = float(os.environ.get("CHECK_FLOAT_RTOL", "0")) or None
    n_pass = n_fail = n_timeout = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = norm(pd.read_parquet(qdir))
        if name not in oracles:
            print(f"  -- {name}: no oracle, rows={len(got)}")
            continue
        # Each oracle runs on its own cursor: a Timer that fires in the
        # window between query completion and cancel() then interrupts a
        # cursor nobody will use again, instead of leaking a stray
        # interrupt into the NEXT oracle on a shared connection.
        cur = db.cursor() if timeout else db
        timer = None
        if timeout:
            def _interrupt(c=cur):
                try:
                    c.interrupt()
                except Exception:
                    pass  # cursor already closed: the query beat the timer
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            want = norm(cur.sql(oracles[name]).df())
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {timeout}s (naive-spec SQL)")
            n_timeout += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
            if cur is not db:
                cur.close()
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
                neq = ~((a == b) | (a.isna() & b.isna()))
                if rtol and str(a.dtype) == "float64" and neq.any():
                    # order-of-summation ulp drift: legitimate at large sf
                    # where millions of doubles fold in different orders;
                    # the sf0.01 gate runs exact (rtol unset). isclose runs
                    # on the raw values (NaN propagates to "not close") and
                    # is masked to rows where BOTH sides are non-null, so a
                    # genuine NULL-vs-value mismatch — including NULL vs
                    # 0.0, which fillna used to alias — stays a failure.
                    import numpy as np
                    close = pd.Series(
                        np.isclose(a.to_numpy(dtype=float),
                                   b.to_numpy(dtype=float), rtol=rtol),
                        index=a.index) & ~a.isna() & ~b.isna()
                    neq = neq & ~close
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
    suffix = f", {n_timeout} oracle-timeout" if n_timeout else ""
    print(f"\n{n_pass} pass, {n_fail} fail{suffix}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
