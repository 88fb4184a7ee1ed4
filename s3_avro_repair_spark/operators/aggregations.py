"""G group — aggregations.

Spark's hash aggregate is already partial+final (map-side combine
before the shuffle), so a groupBy on low-cardinality keys moves only
one row per key per task across the network — the design survives
100× data growth untouched. All money sums use the exact-decimal
pattern from exprs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import davg, dec2, dsum, sql_davg, sql_dsum
from ..plans.registry import register
from ..tables import table
from .quantiles import exact_quantiles


@register(
    "agg_global",
    group="G",
    oracle=f"""
    SELECT
      {sql_dsum('l_extendedprice', 'sum_price')},
      {sql_davg('l_quantity', 'avg_qty')},
      MIN(l_quantity) AS min_qty,
      MAX(l_extendedprice) AS max_price,
      COUNT(*) AS n
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped sum/avg/min/max/count over the fact table."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        dsum("l_extendedprice", "sum_price"),
        davg("l_quantity", "avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
    )


_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_groupby", group="G", oracle=_Q1_ORACLE)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query.

    groupBy on (returnflag, linestatus): 6 groups total, so the
    shuffle after partial aggregation carries ~6 rows per task no
    matter how many billions of input rows — the canonical
    scale-invariant aggregation plan.
    """
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = dec2("l_extendedprice") * (one - dec2("l_discount"))
    charge = disc_price * (one + dec2("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    group="G",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi COUNT(DISTINCT) — Spark expands to partial aggregates,
    still one shuffle per distinct column set."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


@register("agg_approx_distinct", group="G", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct — the 100 TB substitute for
    exact distinct (constant memory per group, one pass, no distinct
    shuffle). rows-only check: HLL sketches aren't cross-engine
    reproducible."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts")
    )


@register(
    "agg_having",
    group="G",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


_GID = "GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS gid"


@register(
    "agg_rollup",
    group="G",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {_GID},
           {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag,status) -> (flag) -> ()."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")


@register(
    "agg_cube",
    group="G",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {_GID},
           {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping combinations."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")


@register(
    "agg_grouping_sets",
    group="G",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {_GID},
           {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the DataFrame API (Spark 4.0+
    ``DataFrame.groupingSets``) — no session-global temp view needed."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.grouping_id().alias("gid"),
            dsum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@register(
    "agg_collect",
    group="G",
    oracle="""
    SELECT o_orderstatus,
           COALESCE(
             array_to_string(list_sort(list(DISTINCT o_orderpriority)), ','),
             '') AS priorities,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collected set, sorted for determinism and joined to a
    string so the value hash is list-representation-agnostic."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_argmax",
    group="G",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     * 10000000 + o_orderkey) AS top_orderkey,
           MAX(o_totalprice) AS top_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG MAX (``max_by``): each customer's highest-value order in ONE
    aggregation pass — no self-join back to the table, no window sort.
    This is the single-pass replacement for the classic "join the max
    back" anti-pattern, and it partial-aggregates map-side like any
    hash agg, so shuffled bytes scale with group count, not rows.
    Ordering ties are broken deterministically by folding the row key
    into an exact integer sort key (decimal cents * 1e7 + orderkey) —
    double comparison semantics never enter the hash."""
    o = table(spark, sf_dir, "orders")
    sort_key = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("long") * 10000000 + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", sort_key).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


@register("agg_approx_percentile", group="G", oracle=None)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the mergeable quantile sketch
    (``percentile_approx``, Greenwald-Khanna with accuracy=10000) —
    the one-pass, partial-aggregatable alternative to agg_percentiles'
    exact sort: sketches merge associatively across partitions, so
    shuffled bytes are O(sketch), not O(rows). rows-only: the sketch's
    answer is deterministic within Spark but not an SQL-expressible
    value; tests/test_quality.py bounds its error against DuckDB's
    exact quantiles (rank error <= 1/accuracy of the distribution)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(
                F.expr(f"percentile_approx(l_extendedprice, {q}, 10000)"), 4
            ).alias(f"ap{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )


@register(
    "agg_stats",
    group="G",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — sample stddev, Pearson correlation,
    sample covariance — the feature-engineering primitives (z-score
    normalization, feature/label leakage checks). All three are
    single-pass mergeable moment sketches in Spark (partial sums of
    x, x^2, xy per partition), so they partial-aggregate map-side like
    any hash agg. Rounded (6/6/4 dp) so partial-vs-sequential double
    summation order cannot flip the hash — the moments differ from
    DuckDB's sequential pass only at ~1e-10 relative."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
    )


@register(
    "agg_histogram",
    group="G",
    oracle="""
    SELECT bucket, COUNT(*) AS n FROM (
      SELECT CASE WHEN l_quantity < 0 THEN 0
                  WHEN l_quantity >= 50 THEN 11
                  ELSE CAST(FLOOR(l_quantity / 5.0) AS BIGINT) + 1 END AS bucket
      FROM lineitem
    ) GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` — the one-pass
    distribution profile (data-skew reports, partition-size planning).
    Bucketing is a narrow map + a hash agg on 12 groups, so shuffled
    bytes are O(buckets) at any scale. DuckDB has no width_bucket; the
    oracle is the arithmetic definition — exact here because
    l_quantity is integer-valued, so the division hits no float
    boundary ambiguity (document that caveat before histogramming
    arbitrary doubles this way)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.expr("width_bucket(l_quantity, 0, 50, 10)").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_incremental_merge",
    group="G",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR)
             AS month,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, date_trunc('month', l_shipdate)
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-state RE-aggregation — the materialized-view maintenance
    pattern. The fact is first aggregated to day grain as mergeable
    state (sum, count — never avg, which doesn't merge), then the day
    partials are merged up to month and avg is derived at the end from
    the merged state. The oracle aggregates the raw fact directly to
    month: both answers must agree exactly, proving the decomposition.

    This is how a 100 TB pipeline avoids re-reading the fact table for
    every rollup: yesterday's day-grain partials are immutable; a new
    day appends one partial; month/quarter/year views re-merge
    partials, touching per-day rows instead of per-event rows. Spark
    runs it as two hash aggregations — the second one's input is
    day-count-sized, so the merge stage costs ~nothing at any SF."""
    li = table(spark, sf_dir, "lineitem")
    day_partials = (
        li.groupBy(
            "l_returnflag", F.date_trunc("day", "l_shipdate").alias("day")
        ).agg(
            F.sum(dec2("l_quantity")).alias("psum"),
            F.count(F.lit(1)).alias("pcnt"),
        )
    )
    return (
        day_partials.groupBy(
            "l_returnflag", F.date_trunc("month", "day").alias("m")
        )
        .agg(F.sum("psum").alias("msum"), F.sum("pcnt").alias("n"))
        .select(
            "l_returnflag",
            F.col("m").cast("date").cast("string").alias("month"),
            F.col("msum").cast("double").alias("sum_qty"),
            "n",
            F.round(F.col("msum").cast("double") / F.col("n"), 4).alias(
                "avg_qty"
            ),
        )
    )


@register(
    "agg_mode",
    group="G",
    oracle="""
    SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent event_type per user) with a
    DETERMINISTIC tie-break — built-in mode()/max_by() pick an
    arbitrary winner on count ties, which an oracle-hashed engine can
    never tolerate, so the op is count → row_number(count DESC, value
    ASC) → keep first. Two-phase: the groupBy collapses events to
    (user × type) rows map-side, then the window ranks ≤5 candidate
    rows per user — the window input is aggregate-sized, not
    event-sized, at any scale."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@register(
    "agg_bitmap_distinct",
    group="G",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT via bitmap aggregation — the same answer
    as agg_distinct by a fundamentally different algorithm: keys map
    to (bucket, bit-position), each (group, bucket) task ORs its local
    4096-bit bitmap, and the distinct count is the sum of per-bucket
    popcounts. Spark 3.5+ ships this as
    bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg.

    Why it matters at 100 TB: a shuffle of fixed-size bitmaps (512 B
    per group×bucket, regardless of how many rows fed it) replaces the
    expand+reshuffle of raw distinct keys — the map-side combine is
    total. The DuckDB oracle computes the same count the classical
    way, so the cross-algorithm agreement is itself the test."""
    o = table(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("bk"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm")
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_customers")
    )


@register("agg_hll_merge", group="G", oracle=None)
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct sketches — the pre-aggregation pattern that
    makes COUNT DISTINCT incremental at 100 TB: each nation builds an
    HLL sketch of its customer keys (hll_sketch_agg), and the regional
    rollup MERGES the sketches (hll_union_agg) instead of re-scanning
    raw keys. This is how a daily-partitioned fleet serves ad-hoc
    distinct counts over arbitrary partition unions: sketches are
    bytes, unions are cheap, raw keys are never re-shuffled.

    Estimates, so rows-only for the driver;
    tests/test_quality.py::test_hll_merge_close_to_exact bounds the
    per-region error against the exact distinct count and pins the
    two-level (sketch → union) plan shape."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    return (
        per_nation.join(F.broadcast(n), per_nation.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("approx_customers")
        )
    )


@register(
    "agg_regression",
    group="G",
    oracle="""
    WITH x AS (
      SELECT user_id, value,
             (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
               / 3600000000.0 AS hrs
      FROM events
    )
    SELECT user_id,
           ROUND(regr_slope(value, hrs), 4) + 0 AS slope,
           ROUND(regr_intercept(value, hrs), 4) + 0 AS intercept,
           regr_count(value, hrs) AS n
    FROM x
    GROUP BY user_id
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity linear trend: ordinary-least-squares slope/intercept
    of a metric against time, as a plain distributed aggregate
    (regr_slope / regr_intercept are one-pass Welford-style moments —
    partial-final like any sum). The regressor is HOURS SINCE THE
    ENTITY'S FIRST EVENT, not raw epoch micros: centering kills the
    catastrophic cancellation that raw 1e15-scale x values feed into
    the covariance terms, which is what makes a 4dp cross-engine
    round stable (summation-order drift stays ~1e-12 relative).

    One shuffle for the min-ts window, reused by the aggregate (same
    user_id partitioning). The trend behind per-tenant usage-growth
    dashboards, at any entity cardinality. `+ 0` after the round on
    both engines normalizes IEEE signed zero (ts_zscore's rule): a
    flat-trend entity rounds to slope +/-0.0 depending on summation
    order, and the calendar-edge sweep's midnight tie-storms produce
    exactly such entities."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    us = F.unix_micros(F.col("ts"))
    x = e.select(
        "user_id",
        "value",
        ((us - F.min(us).over(w)) / F.lit(3600000000.0)).alias("hrs"),
    )
    return x.groupBy("user_id").agg(
        (F.round(F.regr_slope("value", "hrs"), 4) + F.lit(0)).alias("slope"),
        (F.round(F.regr_intercept("value", "hrs"), 4) + F.lit(0)).alias(
            "intercept"
        ),
        F.regr_count("value", "hrs").alias("n"),
    )


@register(
    "agg_grouping_id",
    group="G",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with ``grouping_id()`` — the bitmask that tells subtotal
    rows apart from data rows whose grouping column is genuinely NULL.
    Without it, a rollup over nullable keys is ambiguous; with it,
    downstream consumers filter exactly the aggregation level they
    want (gid=0 detail, 1 per-flag subtotal, 3 grand total). Same
    partial-aggregation shape as agg_rollup: the expand node emits one
    row per grouping set per input row, all map-side combined before
    the single shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            F.col("gid").cast("bigint"),
            "n",
        )
    )


@register(
    "agg_median",
    group="G",
    oracle="""
    SELECT l_returnflag, median(l_quantity) AS med_qty,
           median(l_extendedprice) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median — the EXACT counterpart of
    agg_approx_percentile's sketch, reproducible where the sketch's
    error bound moves with compression. NOT Spark's ``median``
    aggregate: that buffers every group value in a non-spilling
    ObjectHashAggregate buffer, which the 10x scaling census proved
    heap-fatal on tall groups (see operators/quantiles.py). Instead
    both measures are unpivoted into one (group, measure, value)
    stream and fed through the sort-based ``exact_quantiles`` kernel —
    a single scan, distinct-value-compressed shuffle, spillable
    windows, and interpolation bit-identical to ``median`` /
    DuckDB's even-count mean-of-middles."""
    li = table(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
    ).unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice"],
        "__m",
        "__val",
    )
    med = exact_quantiles(
        long, ["l_returnflag", "__m"], "__val", [(0.5, "med")]
    )
    return (
        med.groupBy("l_returnflag")
        .pivot("__m", ["l_quantity", "l_extendedprice"])
        .agg(F.first("med"))
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("med_qty"),
            F.col("l_extendedprice").alias("med_price"),
        )
    )


@register("agg_distinct_kmv", group="G", oracle=None)
def agg_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch, hand-rolled from DataFrame
    primitives — the "novel sketch as a composition" pattern: where
    agg_hll_merge uses Spark's built-in HLL, this builds a MERGEABLE
    sketch with nothing but xxhash64 + collect_set + array functions,
    the recipe for any sketch Spark lacks.

    KMV: hash every key to u ~ Uniform(0,1); keep the k smallest
    distinct u's per group; if the sketch holds fewer than k values
    the count is EXACT (= sketch size), else estimate (k-1)/u_(k).
    Merging groups = union the value lists, re-sort, cut to k — shown
    here by merging the per-flag sketches into a global estimate, the
    same partial/merge algebra a datacenter rollup needs (per-day
    sketches -> monthly distinct without re-scanning). Expected
    relative error ~ 1/sqrt(k-1) ~ 13% at k=64.

    Scale shape: the k-smallest selection is SORT-BASED, not buffered —
    ``collect_set`` per tall group would accumulate every distinct hash
    in a non-spilling ObjectHashAggregate buffer before the slice trims
    the output (the same heap-fatal shape the 10x census caught in
    agg_percentiles; see operators/quantiles.py). Instead: distinct
    compression (map-side dedup), a row_number window ordered by u
    (spillable), filter to rank <= k, THEN collect — the only
    collect_list runs over at most k rows per group. rows-only vs the
    oracle (DuckDB cannot reproduce xxhash64); the estimate-vs-exact
    bound is pinned by test_kmv_accuracy."""
    k = 64
    li = table(spark, sf_dir, "lineitem")
    u = (F.xxhash64("l_orderkey").cast("double") / F.lit(float(2**64))) + 0.5
    distinct_u = li.select("l_returnflag", u.alias("u")).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("u")
    per_flag = (
        distinct_u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("l_returnflag")
        .agg(F.array_sort(F.collect_list("u")).alias("sk"))
    )
    est = F.when(
        F.size("sk") < k, F.size("sk").cast("double")
    ).otherwise(F.lit(k - 1) / F.element_at("sk", k))
    flags = per_flag.select(
        F.lit("flag").alias("scope"),
        F.col("l_returnflag").alias("key"),
        est.cast("bigint").alias("est_distinct"),
    )
    merged = per_flag.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sk")))), 1, k
        ).alias("sk")
    )
    total = merged.select(
        F.lit("all").alias("scope"),
        F.lit("*").alias("key"),
        est.cast("bigint").alias("est_distinct"),
    )
    return flags.unionByName(total)


@register(
    "agg_bool",
    group="G",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1) AS all_low_discount,
           bool_or(l_quantity > 49) AS any_max_qty,
           CAST(COUNT(*) FILTER (WHERE l_tax > 0.05) AS BIGINT)
             AS n_high_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (``every`` / ``some``) plus a FILTERed
    count — the invariants-per-group surface ("did every row satisfy
    X, did any row hit Y") that data-quality monitors are built on.
    All three fold into one partial aggregate: booleans are and/or
    monoids, so the map-side combine is as cheap as a sum's."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_discount") <= 0.1).alias("all_low_discount"),
        F.some(F.col("l_quantity") > 49).alias("any_max_qty"),
        F.count_if(F.col("l_tax") > 0.05).cast("bigint").alias("n_high_tax"),
    )


@register(
    "agg_mad",
    group="G",
    oracle="""
    SELECT l_returnflag,
           median(l_extendedprice) AS med_price,
           mad(l_extendedprice) AS mad_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    metric behind outlier fences (|x - median| > k*MAD survives the
    heavy tails that wreck stddev-based z-scores; ts_zscore's robust
    cousin). Spark has no MAD aggregate, so it is composed from two
    exact median passes: per-group median, broadcast back (group
    cardinality is tiny), then the median of absolute deviations.
    DuckDB's built-in mad() is the oracle — a composition checked
    against a native implementation. Both engines interpolate
    even-count medians identically, and |x - m| subtracts the same
    doubles, so the result is bit-exact.

    Scale shape: two grouped aggregations over the fact + one
    broadcast join — both aggregations partial-aggregate map-side
    (medians via per-group sort, parallel across groups). The
    broadcast-back join is NULL-SAFE (<=>): groupBy keeps NULL as its
    own group on both engines, so an equi-join here would silently
    drop that group between the two passes. Both median passes use the
    sort-based spill-safe ``exact_quantiles`` kernel rather than
    Spark's buffering ``median`` aggregate (heap-fatal on tall groups
    — see operators/quantiles.py)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = exact_quantiles(
        li, ["l_returnflag"], "l_extendedprice", [(0.5, "med_price")]
    ).withColumnRenamed("l_returnflag", "m_returnflag")
    dev = li.join(
        F.broadcast(med),
        F.col("l_returnflag").eqNullSafe(F.col("m_returnflag")),
    ).select(
        "l_returnflag",
        "med_price",
        F.abs(F.col("l_extendedprice") - F.col("med_price")).alias("adev"),
    )
    return exact_quantiles(
        dev, ["l_returnflag", "med_price"], "adev", [(0.5, "mad_price")]
    ).select("l_returnflag", "med_price", "mad_price")
