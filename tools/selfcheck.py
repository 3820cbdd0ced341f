#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfdir> <outdir> [query ...]

Loads each `<outdir>/<name>` parquet (written by graft.Verify), runs the
matching oracle SQL from `<outdir>/oracle_sql.json` in DuckDB against the
sfdir tables, and compares: columns sorted by name, rows sorted by all
columns, values compared exactly (floats via repr after float64 cast).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd
import numpy as np


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, got, exp):
    got, exp = normalize(got), normalize(exp)
    if list(got.columns) != list(exp.columns):
        return f"schema mismatch: got {list(got.columns)} vs oracle {list(exp.columns)}"
    # Dtype-strict, like the driver's value-hash: int64 8570 and float64
    # 8570.0 render differently even though == says equal (the exact failure
    # class of clean_corpus_stats in round 1 — DuckDB sum(BIGINT)→HUGEINT→
    # float64 vs Spark int64).
    for c in got.columns:
        if str(got[c].dtype) != str(exp[c].dtype):
            return (f"col {c}: dtype mismatch: got {got[c].dtype} vs "
                    f"oracle {exp[c].dtype} (driver hash would differ)")
    if len(got) != len(exp):
        return f"row count mismatch: got {len(got)} vs oracle {len(exp)}"
    for c in got.columns:
        g, e = got[c].values, exp[c].values
        if pd.api.types.is_float_dtype(got[c]):
            both_nan = pd.isna(g) & pd.isna(e)
            neq = ~(both_nan | (g == e))
            if neq.any():
                i = int(np.argmax(neq))
                return (f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"got {g[i]!r} vs oracle {e[i]!r}")
        else:
            neq = ~((pd.isna(g) & pd.isna(e)) | (g == e))
            if neq.any():
                i = int(np.argmax(neq))
                return (f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"got {g[i]!r} vs oracle {e[i]!r}")
    return None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        t = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        path = f"{outdir}/{name}"
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output at {path}")
            n_fail += 1
            continue
        got = pd.read_parquet(path)
        err = compare(name, got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
