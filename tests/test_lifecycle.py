"""Semantic invariants of the C-group (CDC / data-lifecycle) operators —
beyond the oracle hash parity that test_oracle_parity already enforces
for every registered op."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_avro_repair_spark.plans.registry import load_all
from s3_avro_repair_spark.tables import table

_OPS = load_all()


def test_merge_upsert_invariants(spark, sf_dir):
    base_n = table(spark, sf_dir, "orders").count()
    inserts_n = (
        table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 1000 == 0).count()
    )
    merged = _OPS["merge_upsert"].fn(spark, sf_dir)
    # upserts never drop base rows; inserts add exactly their count
    assert merged.count() == base_n + inserts_n
    # every updated key carries the change value, not the base value
    upd = merged.filter(
        (F.col("o_orderkey") % 100 == 0) & (F.col("o_orderkey") < 30000000)
    )
    assert upd.filter(F.col("status") != "U").count() == 0


def test_scd2_intervals_are_gapless(spark, sf_dir):
    iv = _OPS["scd2_intervals"].fn(spark, sf_dir)
    # exactly one open interval (valid_to NULL) per user
    open_per_user = (
        iv.groupBy("user_id")
        .agg(F.sum(F.col("valid_to_us").isNull().cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
    )
    assert open_per_user.count() == 0
    # intervals never overlap or gap: valid_to of row k == valid_from of k+1
    assert iv.filter(F.col("valid_to_us") < F.col("valid_from_us")).count() == 0


def test_sample_hash_det_is_stable(spark, sf_dir):
    s1 = _OPS["sample_hash_det"].fn(spark, sf_dir).toPandas()
    s2 = _OPS["sample_hash_det"].fn(spark, sf_dir).toPandas()
    key = lambda df: sorted(map(tuple, df[["l_orderkey", "l_linenumber"]].values))
    assert key(s1) == key(s2)  # bit-stable across runs
    total = table(spark, sf_dir, "lineitem").count()
    # ~1/16 rate with generous slack
    assert 0.02 < len(s1) / total < 0.11


def test_dedup_clusters_labels_are_canonical(spark, sf_dir):
    cl = _OPS["dedup_clusters"].fn(spark, sf_dir).toPandas()
    if len(cl) == 0:  # sf0.001 may produce no qualifying pairs
        return
    by_cluster = cl.groupby("cluster_id")["vec_id"].min()
    # the cluster label IS the minimum member id (canonical representative)
    assert (by_cluster.index == by_cluster.values).all()
    # labels are idempotent: every member's label is a member of the cluster
    members = set(cl.vec_id)
    assert set(cl.cluster_id) <= members


def test_join_range_bucketed_matches_unbucketed(spark, sf_dir):
    """The bucketed rewrite must be a pure physical optimization —
    row-identical to the naive equi+residual formulation."""
    bucketed = _OPS["join_range_bucketed"].fn(spark, sf_dir).toPandas()
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("attributed_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    naive = (
        p.join(
            c,
            (p.pu == c.cu)
            & (c.cts >= p.pts)
            & (c.cts < p.pts + F.expr("INTERVAL 1 HOUR")),
        )
        .select("purchase_id", "attributed_id")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.values))
    assert key(bucketed) == key(naive)


def test_cc_strategies_agree(spark, sf_dir):
    """Min-label propagation (O(diameter) rounds) and large-star/
    small-star (O(log n) rounds) must produce identical cluster labels
    — they are two physical strategies for one logical operator."""
    prop = _OPS["dedup_clusters"].fn(spark, sf_dir).toPandas()
    star = _OPS["dedup_clusters_bigstar"].fn(spark, sf_dir).toPandas()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cluster_id"]].values))
    assert key(prop) == key(star)
