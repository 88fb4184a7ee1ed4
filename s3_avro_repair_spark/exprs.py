"""Shared expression helpers for oracle-exact numerics.

Fixture money/rate columns are doubles that carry exactly 2 decimal
places (FIXTURES.md). Summing doubles directly is order-dependent
(Spark's partial/final agg order differs from DuckDB's sequential
scan), so value hashes would be flaky. Casting to DECIMAL(18,2) first
makes every sum EXACT integer arithmetic — bit-identical in both
engines — and a final cast back to DOUBLE keeps the output schema
simple. The same trick in SQL:

    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)

At 100 TB this is also the *right* thing: decimal sums don't lose
precision across billions of rows the way double sums do, and the cast
is JVM-side whole-stage-codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DEC = DecimalType(18, 2)


def dec2(c: Column | str) -> Column:
    """Lossless decimal view of a 2-dp money/rate double column."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact sum of a 2-dp double column, returned as DOUBLE."""
    return F.sum(dec2(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-numerator average: decimal sum / count, double division.

    Both engines perform the same double division of identical
    operands, so the result is bit-identical (unlike AVG(double),
    whose accumulation order differs).
    """
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec2(c)).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS {alias}"
