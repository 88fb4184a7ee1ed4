"""Round-10 optimization pins: each test locks the INTERNAL property
an optimization introduced, so a refactor can't silently undo it while
the oracle (which only sees results) stays green.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_avro_repair_spark.plans.registry import load_all

_OPS = load_all()


def test_udtf_apply_in_pandas_groups_by_bucket_not_customer(spark, sf_dir):
    """The applyInPandas boundary must be keyed on the derived hash
    bucket (invocations bounded by cluster parallelism), never the raw
    customer key (invocations = key cardinality — the 26s/sf0.1 shape
    this round removed). The physical plan's FlatMapGroupsInPandas
    node shows the grouping attributes."""
    df = _OPS["udtf_apply_in_pandas"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    head = plan.split("FlatMapGroupsInPandas", 1)[1].splitlines()[0]
    grouping = head.split("]", 1)[0]  # first [...] list = grouping attrs
    assert "bkt" in grouping, head
    assert "o_custkey" not in grouping, head


def test_udtf_apply_in_pandas_matches_jvm_window(spark, sf_dir):
    """Bucketed pandas ranking == JVM window ROW_NUMBER, row-exact."""
    from pyspark.sql import Window

    got = (
        _OPS["udtf_apply_in_pandas"].fn(spark, sf_dir)
        .orderBy("o_custkey", "o_orderkey")
        .collect()
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .collect()
    )
    assert got == want


@pytest.mark.parametrize(
    "name", ["q_corpus_pipeline", "dedup_ahash", "dedup_ngram_jaccard"]
)
def test_branching_pipelines_scan_their_corpus_once(name, spark, sf_dir):
    """These ops feed one expensive relation into multiple plan
    branches; the r10 materialization barriers make the corpus scan +
    tokenize/signature work execute ONCE (before: 2-4 parquet scans of
    documents per plan). A refactor that drops the localCheckpoint
    reintroduces the duplicate scans and fails here."""
    df = _OPS[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("documents.parquet") <= 1, name
