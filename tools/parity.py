#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: parity.py [sf_dir] [verify_out_dir] [query ...]

Reads oracle_sql.json + per-query parquet written by graft.Verify, runs
each oracle in DuckDB over the same testdata, sorts columns by name, and
compares values EXACTLY (doubles must be bit-identical — that is the
contract the engine is built to satisfy, see SURVEY.md §5).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def _datestr(v):
    """Normalize date-like cells: DuckDB DATE arrives as midnight
    Timestamp via fetchdf while parquet DATE reads as datetime.date —
    semantically equal, and equal under the driver's hash too."""
    import datetime
    if v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp) and v.time() == datetime.time(0, 0):
        return v.date().isoformat()
    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0, 0):
        return v.date().isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    da, db = _datestr(a), _datestr(b)
    if da is not None and db is not None:
        return da == db
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if str(a) == str(b):
        return True
    try:  # int64 vs int32, Timestamp vs datetime, Decimal vs float
        return float(a) == float(b)
    except (TypeError, ValueError):
        return False


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{out}/{name}"))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark output missing: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
