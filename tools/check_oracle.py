#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver: for each query result parquet written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB (tables = the
sfDir parquet files), sorts columns by name and rows by all columns, and
compares values exactly (floats: bit-exact, with a reported max-abs-diff
fallback so mismatches are diagnosable).
"""
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if len(df) and df[c].map(lambda v: isinstance(v, (list, tuple))
                                 or hasattr(v, "tolist")).any():
            df[c] = df[c].map(lambda v: str(list(v)) if v is not None else None)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first",
                            ignore_index=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional per-oracle wall-clock budget (seconds) for large scale
    # factors: the driver's gate runs at sf0.01 where every oracle is
    # fast, but the sf1.0 sweep can hit DuckDB legs (recursive-CTE
    # closures, all-pairs joins) whose cost is the ORACLE's, not the
    # engine's — report those as ORACLE-TIMEOUT, distinct from FAIL
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    timeouts = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = canon(pd.read_parquet(path))
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)} "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        if timeout:
            import threading
            t0 = time.time()
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
            try:
                want = canon(con.execute(oracles[name]).fetchdf())
            except Exception as e:
                timer.cancel()
                if time.time() - t0 >= timeout - 1:
                    timeouts += 1
                    print(f"  {name}: ORACLE-TIMEOUT after {timeout:.0f}s "
                          f"(engine rows={len(got)})")
                    continue
                raise e
            finally:
                timer.cancel()
        else:
            want = canon(con.execute(oracles[name]).fetchdf())
        ok = True
        msgs = []
        if list(got.columns) != list(want.columns):
            ok = False
            msgs.append(f"cols got={list(got.columns)} want={list(want.columns)}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rows got={len(got)} want={len(want)}")
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                # the driver hashes rendered values, so int64 5 vs float 5.0
                # is a hard mismatch even when numerically equal (DuckDB
                # HUGEINT sums surface as float64 in pandas) — mirror that
                # discipline instead of coercing both sides to float
                num_kinds = "iuf"
                if (g.dtype.kind in num_kinds and w.dtype.kind in num_kinds
                        and (g.dtype.kind == "f") != (w.dtype.kind == "f")):
                    ok = False
                    msgs.append(
                        f"col {c}: dtype-kind mismatch got={g.dtype} "
                        f"want={w.dtype} (driver hash would differ; "
                        f"CAST the oracle, e.g. AS BIGINT)")
                    continue
                if g.dtype.kind == "f" or w.dtype.kind == "f":
                    ga = g.astype(float).to_numpy()
                    wa = w.astype(float).to_numpy()
                    both_nan = pd.isna(ga) & pd.isna(wa)
                    neq = ~(both_nan | (ga == wa))
                    if neq.any():
                        diffs = [abs(a - b) for a, b, n in zip(ga, wa, neq)
                                 if n and not (math.isnan(a) or math.isnan(b))]
                        ok = False
                        msgs.append(
                            f"col {c}: {neq.sum()} diffs, "
                            f"maxabs={max(diffs) if diffs else 'nan-pattern'}")
                else:
                    gs = g.astype(str).to_numpy()
                    ws = w.astype(str).to_numpy()
                    neq = gs != ws
                    if neq.any():
                        i = int(neq.argmax())
                        ok = False
                        msgs.append(
                            f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                            f"got={gs[i]!r} want={ws[i]!r}")
        status = "OK" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"  {name}: {status} rows={len(got)}" +
              ("" if ok else " | " + "; ".join(msgs[:4])))
    if timeouts:
        print(f"  ({timeouts} oracle legs exceeded the {timeout:.0f}s budget)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
