#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB-oracle gate (NOT part of the
Scala library). Mimics the driver: run Verify output vs oracle_sql.json in
DuckDB over the same parquet tables, sort columns by name, compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize dtypes a bit: dates -> str, floats stay
    import datetime
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray))
                                else str(v) if isinstance(v, (datetime.date, datetime.datetime))
                                else v)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
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
                g, w = got[c].values, want[c].values
                # The driver's hash is TYPED: int64 vs float64/object fails it
                # even when every value is equal (q_sample_pack, round 2 —
                # DuckDB HUGEINT sums arrive as float64). Flag kind mismatches
                # here instead of silently floating both sides.
                gk = "i" if g.dtype.kind in "iu" else g.dtype.kind
                wk = "i" if w.dtype.kind in "iu" else w.dtype.kind
                if gk != wk:
                    print(f"FAIL {name}: col {c} dtype mismatch "
                          f"spark={g.dtype} oracle={w.dtype} "
                          f"(driver hash is typed; CAST the oracle SQL)")
                    ok = False
                    break
                if g.dtype.kind == "f" or w.dtype.kind == "f":
                    same = np.array_equal(g.astype(float), w.astype(float), equal_nan=True)
                else:
                    same = (pd.Series(g).fillna("\0") == pd.Series(w).fillna("\0")).all()
                if not same:
                    bad = None
                    for i in range(len(g)):
                        gv, wv = g[i], w[i]
                        eq = (gv == wv) or (pd.isna(gv) and pd.isna(wv))
                        if not eq:
                            bad = (i, gv, wv)
                            break
                    print(f"FAIL {name}: col {c} differs, first diff {bad}")
                    ok = False
                    break
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
