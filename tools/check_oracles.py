"""Local stand-in for the driver's correctness harness: run every
``queries()[name](sf_dir)`` and compare to ``oracle_sql()[name]`` via
DuckDB — row count, column names, and an order-insensitive value
comparison (sorted rows, approx-equal floats). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype(np.uint64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


STRICT = False  # --strict: driver fidelity — exact values AND exact dtypes


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if STRICT:
        for c in sorted(a.columns):
            if str(a[c].dtype) != str(b[c].dtype):
                return f"dtype {c}: engine {a[c].dtype} vs oracle {b[c].dtype}"
    a, b = canon(a), canon(b)
    atol = 0.0 if STRICT else 1e-9
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(av, bv, rtol=0, atol=atol, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            bad = np.nonzero(~(av == bv) if not pd.api.types.is_float_dtype(a[c]) else ~np.isclose(av, bv, rtol=0, atol=atol))[0][:5]
            return f"column {c} mismatch at rows {bad.tolist()}: {av[bad][:3]} vs {bv[bad][:3]}"
    return None


def main():
    global STRICT
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        wall = time.time() - t0
        if name in oracles:
            try:
                exp = con.execute(oracles[name]).df()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: oracle raised {e}")
                n_fail += 1
                continue
            err = compare(res, exp)
            if err:
                print(f"FAIL {name}: {err}  ({wall:.1f}s, {len(res)} rows)")
                n_fail += 1
            else:
                print(f"PASS {name}  ({wall:.1f}s, {len(res)} rows)")
                n_pass += 1
        else:
            print(f"ROWS {name}: {len(res)} rows ({wall:.1f}s)")
            n_rowsonly += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
