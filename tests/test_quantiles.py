"""The spill-safe exact-quantile kernel (operators/quantiles.py) must be
value-identical to Spark's buffering ``percentile`` aggregate — the
kernel replaced it after the 10x scaling census OOM'd the JVM on tall
groups, and the swap is only sound if the answers never move."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from s3_avro_repair_spark.operators.quantiles import exact_quantiles

SCHEMA = StructType(
    [
        StructField("g", StringType(), True),
        StructField("v", DoubleType(), True),
    ]
)

QS = [(0.0, "q0"), (0.25, "q25"), (0.5, "q50"), (0.9, "q90"), (1.0, "q100")]


def builtin(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["g"]: [r[name] for _, name in QS]
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {q})").alias(name)
                for q, name in QS
            ]
        )
        .collect()
    }


def kernel(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["g"]: [r[name] for _, name in QS]
        for r in exact_quantiles(df, ["g"], "v", QS).collect()
    }


def assert_same(spark, rows):
    expect, got = builtin(spark, rows), kernel(spark, rows)
    assert set(expect) == set(got)
    for g in expect:
        for e, a in zip(expect[g], got[g]):
            if e is None:
                assert a is None, (g, expect[g], got[g])
            else:
                assert a == pytest.approx(e, abs=1e-9), (g, expect[g], got[g])


def test_matches_builtin_random(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice("abc"), round(rng.uniform(-100, 100), 2))
        for _ in range(500)
    ]
    assert_same(spark, rows)


def test_heavy_duplicates(spark):
    # Distinct-value compression path: 3 distinct values, many copies.
    rows = [("a", float(v)) for v in [1, 1, 1, 2, 2, 3] * 40]
    assert_same(spark, rows)


def test_single_row_group(spark):
    assert_same(spark, [("a", 42.0), ("b", 1.0), ("b", 2.0)])


def test_null_values_ignored(spark):
    rows = [("a", None), ("a", 10.0), ("a", None), ("a", 20.0)]
    assert_same(spark, rows)


def test_all_null_group_survives(spark):
    # percentile of an all-NULL group is NULL but the group row stays.
    rows = [("a", None), ("a", None), ("b", 5.0)]
    assert_same(spark, rows)


def test_null_group_key(spark):
    rows = [(None, 1.0), (None, 3.0), ("a", 2.0)]
    assert_same(spark, rows)


def test_even_count_interpolation(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)]
    got = kernel(spark, rows)
    # q50 of [1,2,3,4]: pos=1.5 -> 2 + 0.5*(3-2) = 2.5 exactly.
    assert got["a"][2] == 2.5


def test_extreme_values(spark):
    rows = [
        ("a", -math.inf),
        ("a", math.inf),
        ("a", 0.0),
        ("a", 1e300),
        ("a", -1e300),
    ]
    assert_same(spark, rows)
