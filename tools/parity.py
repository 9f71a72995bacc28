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


def _col_fast_eq(ea, ga) -> bool:
    """True only when two columns are STRICTLY equal under vectorized
    comparison — a conservative subset of cell_eq (never a false PASS;
    a False just routes to the exact per-cell loop)."""
    import numpy as np
    try:
        if ea.dtype == ga.dtype:
            k = ea.dtype.kind
            a, b = ea.values, ga.values
            if k in "iub":
                return bool((a == b).all())
            if k == "f":
                return bool(((a == b) | (np.isnan(a) & np.isnan(b))).all())
            if k == "M":
                return bool(((a == b) | (np.isnat(a) & np.isnat(b))).all())
            if k == "O":
                # C-level list compare; exact for str/int/Decimal cells
                return ea.tolist() == ga.tolist()
    except Exception:  # noqa: BLE001
        pass
    return False


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # GenScale --files N writes <table>.parquet as a DIRECTORY of
        # part files; DuckDB needs the glob form for those
        import os
        src = (f"{sf}/{t}.parquet/*.parquet"
               if os.path.isdir(f"{sf}/{t}.parquet")
               else f"{sf}/{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
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
            # vectorized fast path: STRICT equality only (strictly
            # stronger than cell_eq, so a True here is always safe);
            # any doubt — dtype mismatch, False, exception — falls back
            # to the exact per-cell coercion loop below. Without this,
            # sf1.0 outputs (10^6-row asof/fact frames) take minutes
            # per query in the pure-Python loop.
            if _col_fast_eq(exp[c], got[c]):
                continue
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
