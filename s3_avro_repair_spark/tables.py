"""Fixture table loaders (TESTDATA.md / FIXTURES.md).

The reference enumerates its input with ``listObjects({Bucket, Prefix})``
(``/root/reference/src/services/repair-avro.ts:37-40``) and then
downloads each object to a local staging dir. Spark replaces both with
a direct scan: the file listing is the scan driver, executors stream
bytes, and Hive-style ``key=value`` prefixes become partition columns
for free (partition discovery).
"""

from __future__ import annotations

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

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; we read it as raw nanos
    (``nanosAsLong``, set in the session factory and re-asserted by the
    registry's ``tune_for_oracle`` wrapper — not mutated here) and
    integer-divide down to microseconds — exact, JVM-side, and identical
    to DuckDB's ns->us truncation. Fixture event timestamps carry no
    sub-microsecond component (TESTDATA.md seeds are ms-resolution), so
    the truncation is lossless.
    """
    if name == "events":
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
