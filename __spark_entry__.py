"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All operators live in the ``s3_avro_repair_spark`` package and
register themselves in ``plans/registry.py``; this module is a thin
adapter over that registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3_avro_repair_spark.plans.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    ops = load_all()
    return ops["agg_groupby"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return {name: op.fn for name, op in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every hash-checkable operator.

    Ops without an oracle (approximate / non-SQL-expressible, marked
    "rows" in SURVEY.md §2B) are omitted -> driver does the weaker
    rows-only check.
    """
    return {
        name: op.oracle for name, op in load_all().items() if op.oracle is not None
    }
