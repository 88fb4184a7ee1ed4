"""P group — subquery surface (IN / EXISTS / scalar, correlated and not).

The one part of the relational surface the DataFrame API doesn't spell
natively: predicates and expressions that nest a query. Expressed with
``spark.sql`` + DataFrame template args (``{df}`` placeholders, PySpark
3.4+) — no temp views, nothing registered on the caller's session — so
Catalyst's SUBQUERY DECORRELATION does the physical planning:

- ``IN (SELECT …)``        → left semi join (plan-asserted in tests)
- ``NOT EXISTS (corr …)``  → left anti join
- ungrouped scalar         → one-row broadcast into the filter
- correlated scalar SELECT → decorrelated aggregate + outer join,
                             COUNT's empty-group-is-zero handled by the
                             rewrite's coalesce

A subquery is never executed per row — that's the whole point of the
decorrelation rules, and why these plans survive 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling modules)

from ..plans.registry import register
from ..tables import table


@register(
    "filter_in_subquery",
    group="P",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery. Catalyst rewrites to a LEFT SEMI join
    on the subquery output — the dim-sized semi side broadcasts, so the
    fact scan is never shuffled. Semantically identical to join_semi;
    this op proves the SQL nesting reaches the same physical plan."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM {o}
        WHERE o_custkey IN
          (SELECT c_custkey FROM {c} WHERE c_mktsegment = 'BUILDING')
        """,
        o=o,
        c=c,
    )


@register(
    "filter_not_exists",
    group="P",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def filter_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS — customers whose orders all stay under 400k.
    Decorrelates to a LEFT ANTI join on the correlation key with the
    inner predicate pushed below the join; the correlated form never
    loops, and NULL keys behave sanely (unlike NOT IN, whose
    three-valued NULL semantics silently empty the result — the reason
    this op is EXISTS-shaped)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM {c} c
        WHERE NOT EXISTS (
          SELECT 1 FROM {o} o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """,
        o=o,
        c=c,
    )


@register(
    "scalar_subquery_filter",
    group="P",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped scalar subquery in a predicate — parts priced over
    the global average. The subquery runs ONCE (a one-row
    aggregate), its result broadcasts into the scan's filter; the table
    is read twice but never joined row-to-row. The runtime-computed
    threshold is the same dynamic-value pattern join_dpp exercises for
    partition pruning."""
    p = table(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice FROM {p}
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM {p})
        """,
        p=p,
    )


@register(
    "scalar_subquery_select",
    group="P",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT MAX(o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_price
    FROM customer c
    """,
)
def scalar_subquery_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — per-customer
    order count and max price, written as nested per-row lookups.
    Catalyst decorrelates each into one aggregate over orders grouped
    by the correlation key plus a LEFT OUTER join — including COUNT's
    empty-group rule (customers with no orders read 0, not NULL, via
    the rewrite's coalesce; MAX stays NULL). Linear dataflow, one
    shuffle per distinct subquery — nothing executes per row."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM {o} o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT MAX(o_totalprice) FROM {o} o
                WHERE o.o_custkey = c.c_custkey) AS max_price
        FROM {c} c
        """,
        o=o,
        c=c,
    )


@register(
    "subquery_correlated_agg",
    group="P",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_nationkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ct
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey, c_nationkey
    )
    SELECT c_custkey, c_nationkey, CAST(ct AS DOUBLE) AS spend
    FROM spend s
    WHERE ct * (SELECT COUNT(*) FROM spend x
                WHERE x.c_nationkey = s.c_nationkey)
          > 2 * (SELECT SUM(ct) FROM spend x
                 WHERE x.c_nationkey = s.c_nationkey)
    """,
)
def subquery_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated AGGREGATE subqueries in a predicate — customers who
    spent more than twice their nation's average customer spend,
    written the way an analyst writes it (two per-row nested
    aggregates over the spend CTE). Catalyst decorrelates both into
    ONE aggregate grouped by the correlation key joined back — the
    per-row lookups never execute per row, and since both subqueries
    share the correlation key they share the exchange.

    The threshold uses the scale-invariant exact form
    ``ct * COUNT > 2 * SUM`` (decimal x integer on both engines) —
    never ``ct > 2 * SUM/COUNT``, whose division result differs
    between engines' decimal/double rules. Identical correlated SQL
    runs on both engines; the test is that two DIFFERENT
    decorrelation implementations produce the same rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH spend AS (
          SELECT c_custkey, c_nationkey,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ct
          FROM {c} JOIN {o} ON o_custkey = c_custkey
          GROUP BY c_custkey, c_nationkey
        )
        SELECT c_custkey, c_nationkey, CAST(ct AS DOUBLE) AS spend
        FROM spend s
        WHERE ct * (SELECT COUNT(*) FROM spend x
                    WHERE x.c_nationkey = s.c_nationkey)
              > 2 * (SELECT SUM(ct) FROM spend x
                     WHERE x.c_nationkey = s.c_nationkey)
        """,
        c=c,
        o=o,
    )
