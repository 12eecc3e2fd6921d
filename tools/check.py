#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Runs each oracle SQL from <outDir>/oracle_sql.json against DuckDB views
over the sf parquet tables, loads the engine's parquet dump for the same
key, sorts columns by name and rows by all columns, and diffs values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def has_arrays(df: pd.DataFrame) -> list:
    """Array-typed cells — the DRIVER's compare cannot sort these
    (pandas sort_values raises on ndarray cells), so an oracle-declared
    query emitting them is a guaranteed red row. Mirror that here
    instead of silently tuple-converting (which made local PASS
    meaningless for q_vec_assemble in round 1)."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object and len(df) and any(
                isinstance(v, (list, np.ndarray)) for v in df[c].head(5)):
            bad.append(c)
    return bad

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{key}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {key}: no engine output at {res_dir}")
            n_fail += 1
            continue
        try:
            mine_raw = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            arr_cols = has_arrays(mine_raw)
            if arr_cols:
                print(f"FAIL {key}: array-typed columns {arr_cols} — the driver "
                      "compare cannot sort arrays; emit scalars or a string form")
                n_fail += 1
                continue
            mine = norm(mine_raw)
            oracle = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {key}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {key}: columns {list(mine.columns)} vs {list(oracle.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {key}: rows {len(mine)} vs {len(oracle)}")
            n_fail += 1
            continue
        diffs = []
        for c in mine.columns:
            a, b = mine[c], oracle[c]
            try:
                if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                    # tolerance contract: rtol=1e-12 absorbs accumulated
                    # float noise (a few thousand ulps — shuffle-order sums
                    # differ by ~sqrt(n)*eps relative) while still failing a
                    # genuine half-rounding disagreement of 1e-4 for any
                    # magnitude below ~1e8; atol covers values near 0 where
                    # rtol vanishes. Above ~1e8 (large SUM columns) this
                    # check is weaker than the driver's EXACT hash compare —
                    # that compare is the authority, this is pre-flight.
                    av, bv = a.astype(float), b.astype(float)
                    eq = pd.Series(np.isclose(av, bv, rtol=1e-12, atol=1e-6),
                                   index=a.index) | (a.isna() & b.isna())
                else:
                    eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"{c}[row {bad}]: {a[bad]!r} vs {b[bad]!r} ({(~eq).sum()} diffs)")
        # dtype drift report (schema-match risk even when values agree)
        dt = [f"{c}: {mine[c].dtype} vs {oracle[c].dtype}"
              for c in mine.columns if str(mine[c].dtype) != str(oracle[c].dtype)]
        if diffs:
            print(f"FAIL {key}: " + "; ".join(diffs[:3]))
            n_fail += 1
        else:
            note = f"  [dtype drift: {'; '.join(dt)}]" if dt else ""
            print(f"PASS {key} ({len(mine)} rows){note}")
            n_pass += 1
    # rows-only keys
    declared = set(oracles)
    for res_dir in sorted(glob.glob(f"{out_dir}/q_*")):
        key = os.path.basename(res_dir)
        if key in declared or not os.path.isdir(res_dir):
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWS' if n > 0 else 'EMPTY'} {key}: {n} rows (no oracle)")
        if n == 0:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
