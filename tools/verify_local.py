"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, column names, and
order-insensitive values EXACTLY (cell-by-cell after sorting), which
is stricter than or equal to whatever hash the driver uses — if this
passes, the driver's hash check passes.

Usage: python tools/verify_local.py [sf_dir] [op_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_source(sf_dir: str, t: str) -> str:
    """DuckDB-readable source for a table: the single fixture file, or
    a glob when ``{t}.parquet`` is a DIRECTORY of part files (the
    multi-file layout sweep; Spark reads either shape natively)."""
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{table_source(sf_dir, t)}')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<NULL>"
            return repr(v)  # full precision — exact match required
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replicate the driver's canonicalization: sort_values over ALL
    columns on the RAW pandas frame (no stringify first). This is what
    crashes on unhashable cell types — ndarray/list/dict columns raise
    ``TypeError: unhashable type`` inside pandas' lexsort, exactly as
    the driver's r4 record shows for kmeans_quantized. Running it here
    makes any canon-incompatible output type fail BEFORE the round's
    one attestation shot."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    for side, frame in (("spark", spark_df), ("duck", duck_df)):
        try:
            driver_canon(frame)
        except Exception as exc:
            problems.append(f"driver-canon crash ({side}): {type(exc).__name__}: {exc}")
    if problems:
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
    if problems:
        return problems
    a, b = normalize(spark_df), normalize(duck_df)
    neq = (a != b)
    if neq.any().any():
        bad_cols = [c for c in a.columns if neq[c].any()]
        for c in bad_cols[:3]:
            idx = neq[c].idxmax()
            problems.append(
                f"value col={c} row={idx}: spark={a[c][idx]!r} duck={b[c][idx]!r} "
                f"({int(neq[c].sum())} cells differ)"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import functions as F  # noqa
    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    spark = get_session("verify-local", master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    ops = load_all()

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, op in sorted(ops.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = op.fn(spark, sf_dir).toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: spark query raised\n{traceback.format_exc()}")
            continue
        if op.oracle is None:
            n_rows_only += 1
            print(f"rows {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            ddf = con.execute(op.oracle).fetchdf()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: oracle raised: {exc}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"ok   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAILED")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
