"""W group — window functions.

Every window ORDER BY here ends in a TOTAL order of the projected row:
a unique key (orderkey / event_id) followed, for the events sequence
ops, by the sequence value itself — under at-least-once ingest even
(ts, event_id) can collide, and an offset/frame function whose order
stops at the collision emits an arbitrary engine-dependent
interleaving (found by the key-collision sweep; the oracle side pins
NULLS FIRST to match Spark's ascending default). This is the
discipline SURVEY.md §5.2.4 mandates, upgraded from "unique key" to
"total order". Window execution shuffles once on partitionBy keys;
with billions of rows per key you'd salt or pre-bucket, but these
partitions (custkey, user_id, returnflag) are naturally
well-distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import dec2, dsum
from ..plans.registry import register
from ..tables import table


def _range_parts(spark: SparkSession) -> int:
    """Partition count for the two-phase (range-exchange + local
    window + broadcast prefix offsets) plans below. The range exchange
    is load-bearing — only the WIDTH is environment-derived: one range
    per executor core (defaultParallelism), never a literal, so the
    per-chunk side tables stay <= cores rows and a 1000-executor
    cluster gets 1000-way parallel heavy stages instead of a
    hard-coded 8/16."""
    return spark.sparkContext.defaultParallelism


@register(
    "window_rank",
    group="W",
    oracle="""
    SELECT o_orderkey, o_custkey,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number of orders per customer by price."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "window_analytic",
    group="W",
    oracle="""
    SELECT event_id, user_id,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value,
           LAST_VALUE(value)  OVER w AS last_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user ordered by time (explicit frame so
    LAST_VALUE means 'so far', identically in both engines). The order
    ends in `value` so it totally orders the PROJECTED row: under
    at-least-once ingest two rows can collide on (ts, event_id), and a
    sequence op whose order stops at the collision emits an arbitrary
    engine-dependent interleaving (found by the key-collision sweep)."""
    e = table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id", "value")
    w_frame = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w_order).alias("prev_value"),
        F.lead("value").over(w_order).alias("next_value"),
        F.first("value").over(w_frame).alias("first_value"),
        F.last("value").over(w_frame).alias("last_value"),
    )


@register(
    "window_running",
    group="W",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_returnflag
             ORDER BY l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum via DISTRIBUTED two-phase prefix sums.

    ``l_returnflag`` has 3 values, so the naive one-window plan pushes
    a third of the table through each task — fine at fixture scale, a
    wall at 100x. Scale-safe plan (same result, exact decimal):
    range-partition on the full sort key, local running sums per
    (partition, flag), then add per-(partition, flag) prefix offsets
    computed over a tiny side table and broadcast back. Decimal
    addition is associative, so chunked prefix sums are bit-identical
    to the single-window oracle. (l_orderkey, l_linenumber) is NOT
    unique in the fixtures — the quantity tiebreak makes tied rows'
    prefix sums a stable multiset even when a range boundary splits a
    tie."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    ranged = li.repartitionByRange(
        _range_parts(spark), "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    ).withColumn("pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("pid", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("local_sum", F.sum(dec2("l_quantity")).over(w_local))
    # <= cores x 3 rows: the prefix-offset side table is always tiny.
    # Derived from `ranged`, NOT `local`: the chunk totals don't need
    # the window, and the shared range-exchange is reused (AQE stage
    # reuse), so this branch costs one cheap hash agg instead of a
    # second window sort.
    totals = ranged.groupBy("pid", "l_returnflag").agg(
        F.sum(dec2("l_quantity")).alias("chunk_total")
    )
    w_prefix = (
        Window.partitionBy("l_returnflag")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "pid",
        "l_returnflag",
        F.coalesce(
            F.sum("chunk_total").over(w_prefix), F.lit(0).cast("decimal(28,2)")
        ).alias("off"),
    )
    # NULL-SAFE offset join: a list-of-names join drops NULL-key rows
    # (null != null) that the single-window oracle keeps as their own
    # peer group — silent data loss in the distributed rewrite (found
    # by the null-row parity probe). pid is never null; the partition
    # column needs <=>.
    off = offsets.withColumnsRenamed({"pid": "o_pid", "l_returnflag": "o_flag"})
    return (
        local.join(
            F.broadcast(off),
            (F.col("pid") == F.col("o_pid"))
            & F.col("l_returnflag").eqNullSafe(F.col("o_flag")),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("local_sum") + F.col("off")).cast("double").alias("running_qty"),
        )
    )


@register(
    "window_range_frame",
    group="W",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           COUNT(*) OVER (
             PARTITION BY l_returnflag ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
           ) AS n_in_range
    FROM lineitem
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame via DISTRIBUTED value buckets + halo copies.

    Count of rows whose quantity lies within 5 units below the current
    row's quantity. The naive plan windows over 3-value
    ``l_returnflag``, so one task owns a third of the table at any
    scale. Unlike ROWS frames (window_running's chunked prefix sums), a
    RANGE frame straddles chunk boundaries by VALUE — so chunk by value:
    bucket rows on ``floor(l_quantity / 5)``. Because the bucket width
    equals the frame width, every frame ``[q-5, q]`` is contained in
    the row's own bucket plus the one below. Explode each row into its
    bucket (real) and the bucket above (halo copy), run the identical
    RANGE window partitioned by (flag, bucket) — every frame is now
    complete inside one partition — and keep only the real rows. One
    generate + one window over 2x rows, no 1/3-of-table straggler; the
    partition count scales with the value domain instead of the flag
    cardinality (skewed value ranges can further split on a hashed
    sub-bucket with wider halos)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    bkt = F.floor(F.col("l_quantity") / F.lit(5)).cast("long")
    contrib = li.select(
        "*",
        F.explode(
            F.array(
                F.struct(bkt.alias("bkt"), F.lit(True).alias("is_real")),
                F.struct((bkt + 1).alias("bkt"), F.lit(False).alias("is_real")),
            )
        ).alias("c"),
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "c.bkt", "c.is_real",
    ).filter(
        # NULL-quantity rows form their own peer group (SQL RANGE frame
        # semantics) wholly inside the NULL bucket — a halo copy would
        # land in the SAME null bucket and double-count the group
        # (found by the null-row parity probe).
        F.col("is_real") | F.col("bkt").isNotNull()
    )
    w = (
        Window.partitionBy("l_returnflag", "bkt")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    return (
        contrib.withColumn("n_in_range", F.count(F.lit(1)).over(w))
        .filter("is_real")
        .select("l_orderkey", "l_linenumber", "l_quantity", "n_in_range")
    )


@register(
    "window_topk_per_group",
    group="W",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Spark pushes a per-partition limit
    into the sort (WindowGroupLimit) so this never materializes full
    per-group sorts at scale."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "window_ntile",
    group="W",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey)
             AS quartile
    FROM customer
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles of account balances via DISTRIBUTED global ranking.

    ``NTILE(4) OVER (ORDER BY ...)`` with no PARTITION BY forces every
    row through one task. Instead: range-repartition on the sort key
    (Spark's distributed sort machinery — each partition holds a
    contiguous key range), row_number WITHIN each partition, then add
    per-partition prefix-count offsets (a <=shuffle-partitions-row
    side table, broadcast back) to get the exact global rank, and apply
    the SQL NTILE formula (first ``total % n`` buckets get the extra
    row). Identical output to the single-task plan, but every heavy
    stage is parallel — this survives 100x.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranged = c.repartitionByRange(
        _range_parts(spark), "c_acctbal", "c_custkey"
    ).withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    ranked = ranged.withColumn("lrn", F.row_number().over(w_local))
    # Per-partition counts: tiny (<= #partitions rows), so the
    # unpartitioned prefix-sum window below is a trivially small task.
    counts = ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_prefix = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_prefix), F.lit(0)).alias("off"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    g = ranked.join(F.broadcast(offsets), "pid").withColumn(
        "rn", F.col("off") + F.col("lrn")
    )
    # NTILE(n): q = total/n rows per bucket, first r = total%n buckets
    # take one extra. CASE short-circuits, so q=0 never divides.
    n = F.lit(4)
    q, r = F.col("total") / n, F.col("total") % n
    q_floor = F.floor(q)
    cut = r * (q_floor + 1)
    tile = F.when(
        F.col("rn") <= cut, F.floor((F.col("rn") - 1) / (q_floor + 1)) + 1
    ).otherwise(r + F.floor((F.col("rn") - 1 - cut) / q_floor) + 1)
    return g.select(
        "c_custkey", "c_acctbal", tile.cast("int").alias("quartile")
    )


@register(
    "window_distribution",
    group="W",
    oracle="""
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (``percent_rank`` / ``cume_dist``):
    every row's position within its partition's value distribution —
    the primitive behind percentile-based quality cutoffs ("drop the
    bottom 5% of documents per language").

    ``PARTITION BY o_orderstatus`` is 2-3 values, so the naive window
    puts half the table in one task at any scale — the same
    low-cardinality straggler window_ntile had. Same cure, generalized
    to a partitioned rank: range-repartition on (status, price, key)
    so one status SPANS many tasks, row_number locally within
    (task, status), then add per-(task, status) prefix counts — a
    <= tasks x statuses row side table, broadcast back — to recover
    the exact global row_number and per-status total. Both
    distribution functions are TIE-AWARE closed forms over the peer
    group (rows equal on the whole sort key, which duplicate ingest
    makes non-singleton): pct_rank = (min_rn-1)/(n-1), cume =
    max_rn/n — the identical integer-operand double divisions
    DuckDB's PERCENT_RANK/CUME_DIST perform, so the hashes match
    bit-exactly. The peer window rides the range partitioning (equal
    keys share a task), so it costs no exchange. Every heavy stage is
    parallel; this survives 100x."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ranged = o.repartitionByRange(
        _range_parts(spark), "o_orderstatus", "o_totalprice", "o_orderkey"
    ).withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = ranged.withColumn("lrn", F.row_number().over(w_local))
    counts = ranked.groupBy("pid", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # Tiny side table: prefix/total per status over <= cores x 3 rows.
    w_prefix = (
        Window.partitionBy("o_orderstatus")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("o_orderstatus").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "pid",
        "o_orderstatus",
        F.coalesce(F.sum("cnt").over(w_prefix), F.lit(0)).alias("off"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    # NULL-SAFE on the status key: see window_running — a plain join
    # would drop NULL-status rows the oracle's window keeps.
    off_t = offsets.withColumnsRenamed(
        {"pid": "o_pid", "o_orderstatus": "o_status"}
    )
    g = ranked.join(
        F.broadcast(off_t),
        (F.col("pid") == F.col("o_pid"))
        & F.col("o_orderstatus").eqNullSafe(F.col("o_status")),
    ).withColumn("rn", F.col("off") + F.col("lrn"))
    # TIE-AWARE closed forms (production-shard find): duplicate-ingest
    # rows make (price, key) non-unique, and PERCENT_RANK gives every
    # peer the MIN row_number of its group while CUME_DIST counts
    # rows <= peer group (the MAX). Peers share their full sort key,
    # so the range partitioner co-locates them in one pid and this
    # peer window rides the existing sort — no new exchange.
    w_peer = Window.partitionBy(
        "pid", "o_orderstatus", "o_totalprice", "o_orderkey"
    )
    g = g.withColumn("rank", F.min("rn").over(w_peer)).withColumn(
        "peer_hi", F.max("rn").over(w_peer)
    )
    n = F.col("total")
    pct = F.when(
        n > 1, (F.col("rank") - 1).cast("double") / (n - 1)
    ).otherwise(F.lit(0.0))
    return g.select(
        "o_orderkey",
        F.round(pct, 6).alias("pct_rank"),
        F.round(F.col("peer_hi").cast("double") / n, 6).alias("cume"),
    )


@register(
    "window_sessionize",
    group="W",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq
    FROM flagged
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a session break is a >30min gap
    since the user's previous event; the running sum of break flags
    numbers each user's sessions 1..n. The pure-window formulation of
    what session_window (stream_session) does as an aggregate — this
    one keeps EVERY event row with its session id, which is what
    downstream per-event feature joins need. One shuffle on user_id
    shared by both window functions (same partitioning, Catalyst plans
    a single exchange)."""
    e = table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = (
        gap.isNull() | (gap > 1800 * 1000 * 1000)
    ).cast("bigint").alias("is_new")
    flagged = e.select("user_id", "event_id", ts_us.alias("ts_us"), is_new)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flagged.select(
        "user_id", "event_id", F.sum("is_new").over(w2).alias("session_seq")
    )


@register(
    "ts_fill_forward",
    group="W",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(gapped IGNORE NULLS) OVER (
             PARTITION BY user_id
             ORDER BY ts, event_id, gapped NULLS FIRST
             ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS gapped
      FROM events
    )
    """,
)
def ts_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward) — the standard
    repair for missing sensor/metric readings before any time-series
    aggregation. Gaps are injected deterministically (every 7th event
    id) so both engines fill the same holes; the fill itself is
    ``last(..., ignorenulls)`` over a running row frame — exactly the
    single-shuffle pattern join_asof uses, here per user stream.

    No arithmetic touches the carried value, so doubles pass through
    bit-identical — no rounding needed for the cross-engine hash.
    Leading NULLs (a user whose first readings are gaps) stay NULL on
    both engines by definition of the frame."""
    e = table(spark, sf_dir, "events")
    gapped = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        F.col("value")
    )
    # Trailing `gapped` key: a (ts, event_id) collision of two non-null
    # readings must hand a deterministic last-value to the NEXT row's
    # carry-forward on both engines (see window_pct_change).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", gapped)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last(gapped, ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "ts_downsample",
    group="W",
    oracle="""
    SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup (the hypertable-downsample shape): raw
    events aggregated to hourly (bucket, type) summary rows — the
    continuous-aggregate a metrics store serves dashboards from.

    date_trunc runs inside whole-stage codegen, the aggregate is
    partial-final (map-side combine shrinks each task to its distinct
    hour×type count BEFORE the shuffle), and the output cardinality is
    bounded by time-range × types, not event count — at 100 TB the
    shuffle moves summary rows only. Decimal-exact sums; min/max pass
    through bit-identical."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bucket_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "ts_interpolate",
    group="W",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS gapped
      FROM events
    ),
    n AS (
      SELECT event_id, user_id, us, gapped,
             LAST_VALUE(gapped IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id, gapped NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_val,
             LAST_VALUE(CASE WHEN gapped IS NOT NULL THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id
               ORDER BY ts, event_id, gapped NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
             FIRST_VALUE(gapped IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id, gapped NULLS FIRST
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_val,
             FIRST_VALUE(CASE WHEN gapped IS NOT NULL THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id
               ORDER BY ts, event_id, gapped NULLS FIRST
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
      FROM g
    )
    SELECT event_id, user_id,
           CASE WHEN gapped IS NOT NULL THEN gapped
                WHEN prev_val IS NULL THEN next_val
                WHEN next_val IS NULL THEN prev_val
                WHEN next_us = prev_us
                  THEN ROUND((prev_val + next_val) / 2.0, 4)
                ELSE ROUND(prev_val + (next_val - prev_val)
                           * (us - prev_us) / (next_us - prev_us), 4)
           END AS filled_value
    FROM n
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gapped readings — ts_fill_forward's
    smarter sibling: a missing point takes the time-weighted blend of
    its nearest non-null neighbors instead of a stale carry-forward
    (edges fall back to the single available side). Same deterministic
    gap injection (every 7th event id) so both engines repair the same
    holes.

    All four neighbor lookups share ONE (user_id, ts) partition+order,
    so Spark plans a single exchange+sort with four frames over it —
    per-user streams, the window_sessionize scale class. Only the
    interpolated branch does float division, rounded on both engines;
    real readings pass through untouched."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    gapped = F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    g = e.select("event_id", "user_id", "ts", us.alias("us"), gapped.alias("gapped"))
    # Trailing `gapped` key: neighbor choice at a (ts, event_id)
    # collision must be deterministic on both engines (ts_fill_forward).
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "gapped")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "gapped")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    us_if = F.when(F.col("gapped").isNotNull(), F.col("us"))
    n = g.select(
        "event_id",
        "user_id",
        "us",
        "gapped",
        F.last("gapped", ignorenulls=True).over(wprev).alias("prev_val"),
        F.last(us_if, ignorenulls=True).over(wprev).alias("prev_us"),
        F.first("gapped", ignorenulls=True).over(wnext).alias("next_val"),
        F.first(us_if, ignorenulls=True).over(wnext).alias("next_us"),
    )
    interp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        F.col("us") - F.col("prev_us")
    ) / (F.col("next_us") - F.col("prev_us"))
    # Zero-span bracket (both neighbors at the SAME microsecond — the
    # clock-collision / midnight-tie shape): the interpolation weight
    # is 0/0, which ANSI Spark raises on and DuckDB NaNs. Define the
    # fill as the neighbors' average on BOTH engines — symmetric, and
    # the only choice independent of tie interleaving.
    return n.select(
        "event_id",
        "user_id",
        F.when(F.col("gapped").isNotNull(), F.col("gapped"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .when(
            F.col("next_us") == F.col("prev_us"),
            F.round((F.col("prev_val") + F.col("next_val")) / 2.0, 4),
        )
        .otherwise(F.round(interp, 4))
        .alias("filled_value"),
    )


@register(
    "window_pct_change",
    group="W",
    oracle="""
    SELECT event_id, user_id,
           FLOOR((value - LAG(value) OVER w)
                 / NULLIF(LAG(value) OVER w, 0) * 10000 + 0.5) / 10000
             AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts, event_id, value NULLS FIRST)
    """,
)
def window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity percent change between consecutive readings — the
    metric behind rate-of-change alerting and return series. A plain
    LAG over the per-user stream: one shuffle on user_id, first reading
    per user NULL by definition. A zero previous reading yields NULL
    (try_divide here, NULLIF in the oracle): percent-of-zero is
    undefined, and the engines would otherwise DIVERGE on it — Spark's
    ANSI division throws where DuckDB's IEEE double returns inf. The
    sf0.1 fixture contains zero readings; sf0.01 does not, which is
    exactly why this branch is semantics, not fixture-fitting. Rounding
    is the shared floor(x*1e4 + 0.5)/1e4 double tree, not ROUND —
    engine ROUNDs disagree by one ULP on boundary doubles (one cell in
    600k at sf0.1)."""
    e = table(spark, sf_dir, "events")
    # Trailing `value` key: totally orders the projected row so
    # (ts, event_id) key collisions (at-least-once ingest) can't make
    # the lag interleaving engine-dependent. NULLS FIRST in the oracle
    # matches Spark's ascending default.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "value")
    prev = F.lag("value").over(w)
    pct = F.try_divide(F.col("value") - prev, prev)
    return e.select(
        "event_id",
        "user_id",
        (F.floor(pct * 10000 + 0.5) / 10000).alias("pct_change"),
    )


@register(
    "ts_ewma",
    group="W",
    oracle="""
    SELECT event_id, user_id,
           ROUND(
             list_sum(list_transform(l, (x, j) -> x * pow(0.7, len(l) - j)))
             / ((1 - pow(0.7, len(l))) / 0.3), 4) AS ewma
    FROM (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id, value NULLS FIRST
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
      FROM events
      WHERE value IS NOT NULL
    )
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window EWMA (span-bounded exponential smoothing,
    alpha=0.3) per entity — the smoothed series a metrics pipeline
    alerts on. Deliberately TRAILING-K (last 20 readings), not
    since-the-beginning: the classic recursive EWMA needs either
    unbounded weights pow(1-a, -i) (overflows past ~1000 rows) or
    sequential state; the trailing form is a fixed-size frame whose
    weight mass is >99.9% of the infinite tail at K=20, and it maps to
    a bounded ROWS frame that scales to arbitrarily long histories.

    One shuffle on user_id; collect_list over the frame keeps at most
    20 doubles per row, and the weighted sum runs in a JVM-side HOF
    (transform + aggregate). The denominator is the closed-form
    geometric sum (1-0.7^n)/0.3, not a second list pass. Both engines
    round the one float division to 4dp."""
    # NULL readings are dropped on BOTH engines before the window: a
    # null contributes no weight, Spark's collect_list would silently
    # skip it (shifting weights vs DuckDB's list()), and an all-null
    # frame makes the closed-form denominator 0 (ANSI divide error,
    # found by the null-row parity probe). No reading, no smoothed row.
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # `value` tiebreak: see window_pct_change — EWMA weights depend on
    # sequence position, so collision order must be total.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "value")
        .rowsBetween(-19, Window.currentRow)
    )
    lst = F.collect_list("value").over(w)
    num = F.expr(
        "aggregate(transform(l, (x, i) -> x * pow(0.7, size(l) - 1 - i)),"
        " 0D, (a, x) -> a + x)"
    )
    den = (1 - F.pow(F.lit(0.7), F.size("l"))) / 0.3
    return (
        e.select("event_id", "user_id", lst.alias("l"))
        .select("event_id", "user_id", F.round(num / den, 4).alias("ewma"))
    )


@register(
    "ts_zscore",
    group="W",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, value,
             AVG(value)         OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sd
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, event_id, value NULLS FIRST
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           ROUND((value - mu) / sd, 4) + 0 AS z,
           CASE WHEN sd > 0 AND ABS((value - mu) / sd) > 2
                THEN TRUE ELSE FALSE END AS is_outlier
    FROM s
    WHERE sd IS NOT NULL AND sd > 0
    """,
)
def ts_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag: each reading scored against the
    mean/stddev of its own entity's PRECEDING 20 readings (the frame
    excludes the current row, so an outlier can't dilute the baseline
    it's judged against). Readings whose baseline has <2 points carry
    no score and are dropped — matching both engines exactly.

    AVG and STDDEV_SAMP share one (user_id, ts) partition+order, so
    Spark plans a single exchange+sort with two frames over it — the
    bounded-frame streaming class that survives any history length.
    The z division is rounded to 4dp on both engines; the flag is a
    threshold on the same rounded-free expression (|z| > 2 lands far
    from fp noise at fixture scale). `+ 0` after the round on both
    sides normalizes IEEE signed zero: a reading equal to its window
    mean can land at -0.0 on one engine and 0.0 on the other (one
    cell in 600k at sf0.1), and -0.0 + 0.0 is +0.0 by the standard."""
    e = table(spark, sf_dir, "events")
    # `value` tiebreak: the exclusive trailing frame shifts by one row
    # at a collision, so the order must be total (window_pct_change).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "value")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        e.select("event_id", "user_id", "value", mu.alias("mu"), sd.alias("sd"))
        .filter(F.col("sd").isNotNull() & (F.col("sd") > 0))
        .select(
            "event_id",
            "user_id",
            (F.round(z, 4) + F.lit(0.0)).alias("z"),
            ((F.col("sd") > 0) & (F.abs(z) > 2)).alias("is_outlier"),
        )
    )


@register(
    "window_funnel",
    group="W",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 'view>click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 'view>click>purchase', (SELECT COUNT(*) FROM p)
    """,
)
def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: how many users progressed
    view → click → purchase IN THAT ORDER (a later stage only counts
    if it happens strictly after the user's first qualifying earlier
    stage) — the conversion query behind every product dashboard.

    Each stage is a per-user MIN aggregate joined forward into the
    next stage's filter: three aggregate+join rounds, all keyed on
    user_id, so AQE co-partitions the whole cascade on one key and
    each stage's input shrinks to the users still in the funnel.
    Counts only; the per-user timestamps never leave the plan."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("stage"), "n_users"
        )
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view>click").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view>click>purchase").alias("stage"), "n_users"
            )
        )
    )


@register(
    "ts_rolling_median",
    group="W",
    oracle="""
    SELECT user_id, event_id,
           median(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id, value NULLS FIRST
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS med7
    FROM events
    """,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-event EXACT median per user — the robust-smoothing
    primitive (medians shrug off the spikes that wreck rolling means;
    this is the denoiser behind metric dashboards and sensor QC).

    Spark has no median window function, so the frame's values are
    collected into a bounded array (ROWS frame of 7 — constant memory
    per row, unlike a RANGE frame) and the median is computed with
    array functions: sort, then pick the middle element (odd n) or
    average the two middles (even n, during warm-up). Both engines
    average the same two doubles, so results are bit-identical.
    Partitioned by user_id (high cardinality), ordered with the
    event_id tiebreak; one shuffle, no Python, constant per-row
    state — the plan scales with users, not with history length."""
    e = table(spark, sf_dir, "events")
    # `value` tiebreak: frame membership at a (ts, event_id) collision
    # must not be engine-dependent (see window_pct_change).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "value")
        .rowsBetween(-6, 0)
    )
    a = F.array_sort(F.collect_list("value").over(w))
    n = F.size(a)
    odd = F.element_at(a, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(a, (n / 2).cast("int"))
        + F.element_at(a, (n / 2 + 1).cast("int"))
    ) / 2
    return e.select(
        "user_id",
        "event_id",
        # n == 0 (an all-NULL-reading frame) must yield NULL, matching
        # DuckDB's null-ignoring median — and must be guarded FIRST, or
        # the even branch's element_at(a, 0) is an ANSI error (found by
        # the null-row parity probe).
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, odd)
        .otherwise(even)
        .alias("med7"),
    )


@register(
    "window_cumulative_distinct",
    group="W",
    oracle="""
    WITH flagged AS (
      SELECT event_type, event_id, ts, user_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_type, event_id,
           -- first_seen is the FINAL tiebreak: true duplicate rows
           -- (same ts AND event_id) are identical except for the
           -- derived flag, and without ordering on it the running sum
           -- at the tied pair is {c-1,c} or {c,c} by interleaving —
           -- on BOTH engines (production-shard flake)
           CAST(SUM(first_seen) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id, first_seen
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS distinct_users_so_far
    FROM flagged
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative COUNT(DISTINCT) — "unique users seen so far" per
    event type at every event — the growth-curve query behind every
    adoption dashboard. SQL window functions cannot express
    COUNT(DISTINCT) over a running frame; the standard decomposition
    is (1) flag each (type, user)'s FIRST event via a row_number
    window on the high-cardinality (type, user) key, then (2) a
    running SUM of the flags per type.

    Step (2) partitions on 4-ish event types — the low-cardinality
    straggler again — so it runs as window_running's distributed
    two-phase prefix sum: range-repartition on (type, ts, event_id),
    local integer prefix sums per (task, type), per-(task, type)
    chunk totals broadcast back as offsets. Integer addition is
    associative, so the chunked sums are exactly the oracle's
    single-window result at any parallelism."""
    e = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "event_type",
        "event_id",
        "ts",
        "user_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    ranged = flagged.repartitionByRange(
        _range_parts(spark), "event_type", "ts", "event_id"
    ).withColumn("pid", F.spark_partition_id())
    # first_seen as the FINAL tiebreak: true duplicate rows share
    # (ts, event_id) and differ ONLY in the derived flag — without it
    # the tied pair's running sums depend on interleaving (both
    # engines; caught as a production-shard flake). The range keys
    # stay (type, ts, event_id): duplicates co-locate regardless.
    w_local = (
        Window.partitionBy("pid", "event_type")
        .orderBy("ts", "event_id", "first_seen")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("local_sum", F.sum("first_seen").over(w_local))
    totals = ranged.groupBy("pid", "event_type").agg(
        F.sum("first_seen").alias("chunk_total")
    )
    w_prefix = (
        Window.partitionBy("event_type")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "pid",
        "event_type",
        F.coalesce(F.sum("chunk_total").over(w_prefix), F.lit(0)).alias("off"),
    )
    # NULL-SAFE on the type key: see window_running — a plain join
    # would drop NULL-type rows the oracle's window keeps.
    off_t = offsets.withColumnsRenamed({"pid": "o_pid", "event_type": "o_type"})
    return local.join(
        F.broadcast(off_t),
        (F.col("pid") == F.col("o_pid"))
        & F.col("event_type").eqNullSafe(F.col("o_type")),
    ).select(
        "event_type",
        "event_id",
        (F.col("off") + F.col("local_sum")).cast("bigint").alias(
            "distinct_users_so_far"
        ),
    )


@register(
    "window_streaks",
    group="W",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    isl AS (
      SELECT user_id, d,
             date_diff('day', DATE '1970-01-01', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             CAST(MIN(d) AS VARCHAR) AS streak_start
      FROM isl GROUP BY user_id, grp
    )
    SELECT user_id, len, streak_start FROM (
      SELECT user_id, len, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rn
      FROM streaks
    ) WHERE rn = 1
    """,
)
def window_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the OTHER
    gaps-and-islands formulation (window_sessionize flags gaps with a
    running sum; this one uses the date-minus-row_number constant:
    consecutive days share ``epoch_day(d) - rn``, so the island key
    needs NO lag/lead at all). Engagement analytics' favorite query.

    All three windows partition on high-cardinality user_id and every
    aggregate is keyed on (user_id, grp) — one shuffle chain on one
    key, AQE co-partitions it. Dates compare as integer epoch days;
    the streak tie-break (earliest start) makes the per-user winner
    deterministic on both engines."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.unix_date("d") - F.row_number().over(w)
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("d").cast("string").alias("streak_start"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.desc("len"), "streak_start"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("user_id", "len", "streak_start")
    )
