"""P group — projections, computed expressions, predicate filters.

All Catalyst-native. Every filter here is written so the predicate
pushes down into the parquet scan (``.explain`` shows PushedFilters),
and every projection prunes the read schema — the two free wins that
matter most at 100 TB (the reference, by contrast, always downloads
whole objects regardless of need, ``repair-avro.ts:107-113``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import dec2
from ..plans.registry import register
from ..tables import table


@register(
    "project_select",
    group="P",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename. Column pruning reaches the scan."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "project_expr",
    group="P",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS revenue_taxed
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns — exact decimal arithmetic, see exprs.py."""
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (dec2("l_extendedprice") * (one - dec2("l_discount")))
        .cast("double")
        .alias("revenue"),
        (dec2("l_extendedprice") * (one - dec2("l_discount")) * (one + dec2("l_tax")))
        .cast("double")
        .alias("revenue_taxed"),
    )


@register(
    "filter_predicate",
    group="P",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_quantity > 30 AND (l_returnflag = 'R' OR l_linestatus = 'F')
      AND NOT (l_discount < 0.02)
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND/OR/NOT; whole predicate pushes to the scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "F"))
        & ~(F.col("l_discount") < 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


@register(
    "filter_in",
    group="P",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership — pushed down as an In filter."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@register(
    "filter_like",
    group="P",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_name LIKE '%bolt%' OR p_brand LIKE 'Brand#1%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern matching (StringContains / StartsWith pushdown)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "filter_between",
    group="P",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on a timestamp — min/max pushdown prunes row groups.

    At 100 TB with date-partitioned layout this same predicate becomes
    partition pruning (the reference's analog is a human typing a
    ``data=2022-10-11`` prefix, ``repair-avro.ts:92``).
    """
    li = table(spark, sf_dir, "lineitem")
    lo = F.to_timestamp(F.lit("1996-01-01 00:00:00"))
    hi = F.to_timestamp(F.lit("1997-12-31 00:00:00"))
    return li.filter(F.col("l_shipdate").between(lo, hi)).select(
        "l_orderkey",
        "l_linenumber",
        # dates surfaced as strings: Spark/DuckDB pandas dtypes for DATE
        # differ (object vs datetime64), strings hash identically.
        F.col("l_shipdate").cast("date").cast("string").alias("shipdate"),
    )


@register(
    "filter_null",
    group="P",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem
    WHERE NULLIF(l_discount, 0.0) IS NULL AND l_returnflag IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics filter (fixtures have no natural nulls, so we
    manufacture them with NULLIF and test IS NULL / IS NOT NULL)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.nullif(F.col("l_discount"), F.lit(0.0)).isNull()
        & F.col("l_returnflag").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_discount")
