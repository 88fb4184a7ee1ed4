"""Fixture table loaders (TESTDATA.md / FIXTURES.md).

The reference enumerates its input with ``listObjects({Bucket, Prefix})``
(``/root/reference/src/services/repair-avro.ts:37-40``) and then
downloads each object to a local staging dir. Spark replaces both with
a direct scan: the file listing is the scan driver, executors stream
bytes, and Hive-style ``key=value`` prefixes become partition columns
for free (partition discovery).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor —
# TPC-H dims grow sublinearly; region/nation are constant-size.
BROADCAST_DIMS = {"region", "nation", "supplier"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has been generated two ways across driver rounds:
    parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects,
    so the session sets ``nanosAsLong`` and it arrives as a raw-nanos
    BIGINT) and plain TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ).
    Normalize both to a session-zone TIMESTAMP at microsecond
    resolution — exact, JVM-side, and identical to DuckDB's view of the
    same file under the UTC session zone ``tune_for_oracle`` pins.
    The ns->us integer division is lossless for the fixtures
    (TESTDATA.md seeds are ms-resolution).
    """
    if name == "events":
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":  # raw nanos via nanosAsLong
            return df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fixture_token(sf_dir: str, name: str) -> tuple[str, int]:
    """(path, mtime_ns) identity of one fixture table — the cache key
    for anything memoized per fixture (panel/bench strides). A stride
    keyed on the PATH alone goes stale if a fixture at the same path is
    regenerated with a different id span mid-process: Spark would keep
    the old stride while the DuckDB oracle recomputes from data
    (ADVICE r7). ``{name}.parquet`` may be a file or a directory of
    parts; for a directory the newest mtime across the WHOLE tree is
    the token (os.walk, not a top-level scandir: a partitioned layout
    rewritten in place only touches files inside existing part_col=X/
    subdirectories, which does not move top-level entry mtimes —
    ADVICE r8), so any rewrite rotates the key. Missing path ->
    token 0 (the consumer will fail on read anyway)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(p):
            mt = os.stat(p).st_mtime_ns
            for root, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        mt = max(mt, os.stat(os.path.join(root, f)).st_mtime_ns)
                    except OSError:
                        continue
        else:
            mt = os.stat(p).st_mtime_ns
    except OSError:
        mt = 0
    return (p, mt)
