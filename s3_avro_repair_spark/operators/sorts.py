"""O group — sorts, limits, set operations.

Scale notes: global ORDER BY is a range-partitioned sort (sampling +
range exchange) — fine; ORDER BY + LIMIT k collapses to
TakeOrderedAndProject (each task keeps a k-heap, driver merges k·p
rows) — the only safe global sort at 100 TB. LIMIT/OFFSET pagination
is only deterministic after a total order, so every query here orders
by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import table


@register(
    "sort_multi",
    group="O",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column mixed-direction sort with explicit null placement."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_nationkey", "c_acctbal").orderBy(
        F.col("c_nationkey").asc_nulls_first(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    )


@register(
    "topk",
    group="O",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (no full sort ever runs)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "limit_offset",
    group="O",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination — deterministic because o_orderkey is a total order."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey").orderBy("o_orderkey").offset(40).limit(20)


_SLICE_A = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'"
_SLICE_B = (
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000"
)


@register(
    "set_union_all",
    group="O",
    oracle=f"{_SLICE_A} UNION ALL {_SLICE_B}",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two overlapping order slices (duplicates kept)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b)


@register(
    "set_union_distinct",
    group="O",
    oracle=f"{_SLICE_A} UNION {_SLICE_B}",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — duplicates collapse."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    group="O",
    oracle=f"{_SLICE_A} INTERSECT {_SLICE_B}",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics in both engines)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_orderstatus")
    return a.intersect(b)


@register(
    "set_except",
    group="O",
    oracle=f"{_SLICE_A} EXCEPT {_SLICE_B}",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_orderstatus")
    return a.subtract(b)


@register(
    "sort_within_partitions",
    group="O",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS inversions, COUNT(*) AS n FROM lineitem
    """,
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (``sortWithinPartitions``) — the
    write-optimization primitive: NO global shuffle or range exchange,
    yet every output partition is internally ordered, which is what
    parquet writers need for run-length/delta encoding and min-max
    row-group pruning on the sort key. The proof is in-plan: a
    mapInPandas pass walks each partition (carrying the last key across
    Arrow batches) and counts order inversions — the hashed output pins
    inversions = 0 over the full row count."""
    import pandas as pd

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    ).sortWithinPartitions("l_orderkey", "l_linenumber")

    def count_inversions(batches):
        inv = 0
        n = 0
        prev = None
        for pdf in batches:
            keys = list(zip(pdf["l_orderkey"], pdf["l_linenumber"]))
            n += len(keys)
            for k in keys:
                if prev is not None and k < prev:
                    inv += 1
                prev = k
        yield pd.DataFrame({"inversions": [inv], "n": [n]})

    per_part = li.mapInPandas(count_inversions, schema="inversions long, n long")
    return per_part.agg(
        F.sum("inversions").alias("inversions"), F.sum("n").alias("n")
    )


def _z_interleave(div_op: str) -> str:
    """16-bit Morton (Z-order) interleave of (l_partkey, l_suppkey) in
    portable integer arithmetic — bit i of partkey lands at position
    2i, bit i of suppkey at 2i+1. ``div_op`` is '//' for DuckDB and
    'DIV' for Spark SQL; everything else is engine-identical."""
    terms = [
        f"{4 ** i} * (((l_partkey {div_op} {2 ** i}) % 2)"
        f" + 2 * ((l_suppkey {div_op} {2 ** i}) % 2))"
        for i in range(16)
    ]
    return " + ".join(terms)


@register(
    "sort_zorder",
    group="O",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_z_interleave('//')} AS BIGINT) AS zval,
           CAST(({_z_interleave('//')}) // 67108864 AS BIGINT) AS zbucket
    FROM lineitem
    """,
)
def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout key: Morton-interleave the bits of two filter
    columns (partkey, suppkey) so that sorting by the single zval
    clusters rows that are close in EITHER dimension — the multi-column
    data-skipping layout Delta/Iceberg expose as OPTIMIZE ZORDER. A
    range-partitioned write on zval (sink side) then gives every file a
    tight min/max envelope on BOTH columns, so predicates on either one
    prune files; a plain sort on (partkey, suppkey) only prunes the
    leading column.

    The key computation is a pure narrow projection (integer shifts
    expressed as DIV/MOD — whole-stage codegen, no shuffle); zbucket
    (top 6 bits, 64 ranges) is the file-assignment a
    ``repartitionByRange(zval)`` writer would produce. At 100 TB the
    only heavy step is the range write itself — same cost class as any
    global sort, paid once at layout time, repaid on every scan."""
    li = table(spark, sf_dir, "lineitem")
    z = F.expr(f"CAST({_z_interleave('DIV')} AS BIGINT)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        z.alias("zval"),
        F.expr(f"CAST(({_z_interleave('DIV')}) DIV 67108864 AS BIGINT)").alias(
            "zbucket"
        ),
    )


_BAG_A = "SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'"
_BAG_B = ("SELECT l_suppkey FROM lineitem "
           "WHERE l_linestatus = 'F' AND l_partkey % 2 = 0")


@register(
    "set_except_all",
    group="O",
    oracle=f"{_BAG_A} EXCEPT ALL {_BAG_B}",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): occurrences subtract, they
    don't collapse — a supplier appearing 5 times in A and 2 in B
    survives 3 times. The slices are deliberately high-duplication
    (suppkey projected from lineitem, B halved by part parity) so bag
    semantics actually differ from set_except's distinct semantics
    and both directions keep rows. Spark plans this as
    a count-per-row aggregate + generate, one shuffle on the full
    row — same scale class as a groupBy on the value."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(
        (F.col("l_linestatus") == "F") & (F.col("l_partkey") % 2 == 0)
    ).select("l_suppkey")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    group="O",
    oracle=f"{_BAG_A} INTERSECT ALL {_BAG_B}",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each value survives
    min(count_a, count_b) times — the bag complement of
    set_except_all, same plan shape."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(
        (F.col("l_linestatus") == "F") & (F.col("l_partkey") % 2 == 0)
    ).select("l_suppkey")
    return a.intersectAll(b)


@register(
    "set_union_schema_evolved",
    group="O",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           COALESCE(o_orderpriority, 'UNKNOWN') AS o_orderpriority
    FROM (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      UNION ALL BY NAME
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    )
    """,
)
def set_union_schema_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — combining an OLD extract (no priority
    column yet) with a NEW one by COLUMN NAME, null-filling the
    missing column (``unionByName(allowMissingColumns=True)`` /
    DuckDB's ``UNION ALL BY NAME``). This is the union you actually
    need across dataset generations: positional UNION would silently
    misalign or refuse. Same union-two-generations semantics the
    avro_scan_mixed reader implements at the FILE level, expressed at
    the relational level; the trailing COALESCE gives the legacy rows
    an explicit marker, the standard backfill idiom. Pure narrow op —
    no shuffle, both branches keep their scan pushdowns."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select("o_orderkey", "o_totalprice")
    new = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")
    return old.unionByName(new, allowMissingColumns=True).select(
        "o_orderkey",
        "o_totalprice",
        F.coalesce("o_orderpriority", F.lit("UNKNOWN")).alias("o_orderpriority"),
    )
