"""Spill-safe exact quantiles — sort-based, no per-group memory buffer.

Why this exists: Spark's exact ``percentile`` / ``median`` aggregates
run on ObjectHashAggregate and buffer EVERY value of a group inside the
aggregation buffer. The sort-based fallback triggers on the number of
*keys*, not buffer size — so the classic OLAP shape "3 tall groups ×
millions of rows" never falls back and the buffer grows until the heap
dies. The 10x scaling census (tools/scaling_census.py) caught exactly
that: ``agg_percentiles`` took the executor down with
``java.lang.OutOfMemoryError: Java heap space`` inside
``ObjectAggregationIterator`` at the synthesized sf1.0, which is the
one failure mode a 100 TB engine can never have.

This helper computes the same interpolated quantiles from primitives
that all spill:

1. ``groupBy(keys, value).count()`` — distinct-value compression.
   Map-side partial aggregation dedups before the shuffle, so the
   shuffle carries (group, distinct value, count), not raw rows —
   for low-cardinality measures (l_quantity: 50 distinct) this is a
   ~1e5x reduction; hash aggregation spills via its sort fallback.
2. A running ``sum(count)`` window ordered by value — WindowExec
   buffers rows in a spillable ``ExternalAppendOnlyUnsafeRowArray``;
   the running frame itself is streaming.
3. Rank arithmetic: the value at 1-based rank r is the row where
   ``cum - c < r <= cum``; Spark's Percentile formula
   ``lower + (pos - floor(pos)) * (higher - lower)`` with 0-based
   ``pos = q * (n - 1)`` is reproduced literally so results stay
   bit-identical with the previous ``F.percentile`` plans (and with
   DuckDB's ``quantile_cont`` / ``median`` interpolation).

Two shuffles instead of one, but both spill-safe, and the second
(window hash on keys) is reused by the final groupBy — Catalyst sees
the child partitioning already satisfies the aggregation clustering,
so no third exchange appears.

NULL semantics match the built-in aggregates: NULL values contribute
nothing (they get count 0, so no rank interval ever lands on them),
and an all-NULL group still yields its row with NULL quantiles
because the NULL-value row keeps the group alive through the pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    keys: Sequence[str | Column],
    value_col: str | Column,
    quantiles: Sequence[tuple[float, str]],
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` per ``keys`` group.

    ``quantiles`` is a sequence of ``(q, output_name)`` with q in
    [0, 1]. Returns one row per group: ``keys + [name, ...]``, each
    quantile a DOUBLE (NULL when the group has no non-NULL values).
    """
    keys = list(keys)
    key_names = [k if isinstance(k, str) else df.select(k).columns[0] for k in keys]
    v = (value_col if isinstance(value_col, Column) else F.col(value_col)).cast(
        "double"
    )
    # NULL values form their own (group, NULL) row with weight 0: they
    # never satisfy a rank interval but keep all-NULL groups alive.
    compressed = (
        df.select(*keys, v.alias("__v"))
        .groupBy(*key_names, "__v")
        .agg(
            F.sum(F.when(F.col("__v").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("__c")
        )
    )
    w_run = Window.partitionBy(*key_names).orderBy("__v")
    w_all = Window.partitionBy(*key_names)
    cum = compressed.select(
        *key_names,
        "__v",
        "__c",
        F.sum("__c").over(w_run).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )

    flag_cols: list[Column] = []
    aggs: list[Column] = []
    outs: list[Column] = []
    in_rank = lambda r: (F.col("__cum") - F.col("__c") < r) & (r <= F.col("__cum"))
    for i, (q, _name) in enumerate(quantiles):
        # Spark Percentile: pos = q * (n - 1), 0-based; bracket ranks
        # are 1-based pos+1 (floor) and pos+2 (ceil when frac > 0).
        pos = F.lit(float(q)) * (F.col("__n") - F.lit(1)).cast("double")
        lo_rank = F.floor(pos) + F.lit(1)
        flag_cols.append(
            F.when(in_rank(lo_rank), F.col("__v")).alias(f"__lo{i}")
        )
        flag_cols.append(
            F.when(in_rank(lo_rank + 1), F.col("__v")).alias(f"__hi{i}")
        )
        flag_cols.append((pos - F.floor(pos)).alias(f"__f{i}"))
        aggs.extend(
            [
                F.max(f"__lo{i}").alias(f"__lo{i}"),
                F.max(f"__hi{i}").alias(f"__hi{i}"),
                F.max(f"__f{i}").alias(f"__f{i}"),
            ]
        )
    for i, (_q, name) in enumerate(quantiles):
        lo, hi, frac = F.col(f"__lo{i}"), F.col(f"__hi{i}"), F.col(f"__f{i}")
        # frac == 0 (or rank past the end) must return the exact lower
        # value WITHOUT touching the arithmetic: -inf + 0 * inf is NaN,
        # and the built-in percentile returns lower directly there.
        outs.append(
            F.when(frac == 0, lo)
            .otherwise(lo + frac * (F.coalesce(hi, lo) - lo))
            .alias(name)
        )
    return (
        cum.select(*key_names, *flag_cols)
        .groupBy(*key_names)
        .agg(*aggs)
        .select(*key_names, *outs)
    )
