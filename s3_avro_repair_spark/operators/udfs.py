"""U group — the UDF / UDAF / UDTF surface.

The reference's only "user function" is a subprocess boundary: Node
shells out to a JVM per file (``/root/reference/src/services/repair-avro.ts:130-131``).
Spark's equivalents are graded by cost:

- built-in expressions (JVM, whole-stage codegen)   — always first choice
- ``pandas_udf`` / ``applyInPandas`` / ``mapInPandas`` (Arrow batches) — the
  acceptable Python path, ~10-100x faster than row UDFs
- ``F.udf`` row-at-a-time (pickled per row)          — registered here only
  to prove the surface; never in a hot path

``udtf_map_in_pandas`` is the mechanism the whole E group (Avro
validate/repair) runs on — see sources/avro_pipeline.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..plans.registry import register
from ..tables import table


@register(
    "udf_python",
    group="U",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS bucket
    FROM orders
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — deliberately the SLOW PATH.

    Every row is pickled JVM->Python->JVM; the oracle shows the
    equivalent built-in CASE, which stays inside whole-stage codegen and
    is the form every other op in this repo uses. At 100 TB the CASE
    wins by orders of magnitude; this op exists to cover the API
    surface, not as a pattern to copy.
    """
    # A row UDF sees raw None (no SQL three-valued logic): the null
    # branch must be explicit or a NULL price is a TypeError.
    bucket = F.udf(
        lambda p: None
        if p is None
        else ("low" if p < 50000 else ("mid" if p < 200000 else "high")),
        "string",
    )
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", bucket("o_totalprice").alias("bucket"))


@register(
    "udf_pandas_scalar",
    group="U",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow UDF (Series -> Series): whole columns cross the
    boundary as Arrow batches and the arithmetic runs in numpy.
    Per-row IEEE double ops are order-independent, so this hash-matches
    the SQL oracle exactly."""

    @pandas_udf("double")
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@register(
    "udf_pandas_grouped_agg",
    group="U",
    oracle="""
    SELECT l_returnflag,
           MAX(l_quantity) - MIN(l_quantity) AS qty_range,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: one scalar per group, computed over the
    group's column as a pandas Series. max-min is order-independent so
    the float result is exact cross-engine. NB unlike built-in
    aggregates this has no partial/map-side combine — at scale every
    group's full column ships to one executor, so built-ins still win
    where they exist."""

    @pandas_udf("double")
    def qty_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    # Spark forbids mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg, so the row count is a pandas UDF too.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qty_range("l_quantity").alias("qty_range"),
        n_rows("l_quantity").alias("n"),
    )


@register(
    "udtf_apply_in_pandas",
    group="U",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group DataFrame->DataFrame transform (``applyInPandas``):
    customers' orders arrive as pandas frames; we rank them in pandas.
    Same semantics as window_rank's ROW_NUMBER — registered to
    contrast the two paths: the window stays JVM-side; this ships every
    group through Arrow, which only pays off when the per-group logic
    genuinely needs pandas/numpy.

    The applyInPandas group key is a HASH BUCKET of the customer, not
    the customer itself: one Arrow batch + one pandas frame is built
    PER GROUP, so grouping by the natural key pays that fixed cost per
    customer (~1.8 ms x 15k customers = 26 s at sf0.1; unbounded
    invocation count at 100 TB). Bucketing amortizes the boundary over
    ~thousands of rows per call while the per-customer ranking runs
    vectorized inside pandas (groupby.cumcount) — identical output,
    invocation count fixed by the cluster, not the key cardinality.
    Bucket count derives from defaultParallelism (scale-adaptive, no
    local constant); xxhash64 keeps co-grouping deterministic."""

    def rank_orders(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        # dropna=False: a NULL custkey is one group in both Spark's
        # groupBy and the oracle's PARTITION BY; pandas drops it by
        # default.
        pdf["rn"] = pdf.groupby("o_custkey", dropna=False).cumcount() + 1
        return pdf[["o_custkey", "o_orderkey", "rn"]]

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    nbkt = 4 * spark.sparkContext.defaultParallelism
    o = o.withColumn("bkt", F.pmod(F.xxhash64("o_custkey"), F.lit(nbkt)))
    return (
        o.groupBy("bkt")
        .applyInPandas(
            rank_orders, schema="o_custkey long, o_orderkey long, rn int"
        )
    )


@register(
    "udtf_map_in_pandas",
    group="U",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
             AS item_key,
           l_quantity
    FROM lineitem WHERE l_quantity > 40
    """,
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition iterator transform (``mapInPandas``) — the engine
    of the E-group Avro ops (sources/avro_pipeline.py): each task
    streams its partition as an iterator of Arrow batches, yields any
    number of output frames, and never materializes the partition.
    Registered here with a deterministic filter+project so the SQL
    oracle hash-checks the mechanism."""

    def keep_heavy(batches):
        for pdf in batches:
            out = pdf[pdf["l_quantity"] > 40]
            # Int64 (nullable) before str: ANY null in the incoming
            # batch's int column makes pandas store it as float64, and
            # astype(str) then prints every row as '1.0' — even rows
            # the filter kept (null-row parity probe find).
            yield pd.DataFrame(
                {
                    "item_key": out["l_orderkey"].astype("Int64").astype(str)
                    + "-"
                    + out["l_linenumber"].astype("Int64").astype(str),
                    "l_quantity": out["l_quantity"],
                }
            )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.mapInPandas(keep_heavy, schema="item_key string, l_quantity double")


@register(
    "udtf_python",
    group="U",
    oracle="""
    SELECT doc_id, token, LENGTH(token) AS token_len
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    WHERE LENGTH(token) >= 8
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``@udtf``) applied
    via a correlated ``lateralJoin`` — one input row fans out to N
    output rows, with arbitrary Python logic per row. This is the
    row-explosion analog of udf_python: the same caveat applies (the
    loop runs in the Python worker, ~100x slower than the built-in
    ``explode(split(...))`` that expresses this exact query — see
    fn_explode), but a UDTF can emit rows no SQL expression can
    (recursive parses, API call results, generative augmentation),
    which is why the surface matters for LLM data pipelines."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, token_len long")
    class LongTokens:
        def eval(self, text: str):
            if text is None:  # NULL text fans out to zero rows, like
                return        # the explode(split(...)) it parallels
            for tok in text.split(" "):
                if len(tok) >= 8:
                    yield tok, len(tok)

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.lateralJoin(LongTokens(F.col("text").outer())).select(
        "doc_id", "token", "token_len"
    )


@register(
    "udf_python_arrow",
    group="U",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> len(w) > 5)) AS BIGINT) AS long_words
    FROM documents
    """,
)
def udf_python_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``udf(useArrow=True)``) —
    the third point on the Python-boundary spectrum: same per-ROW
    programming model as udf_python (each call still sees one value),
    but the transport is Arrow record batches instead of pickled rows,
    which removes most of the serialization tax while keeping the
    simple scalar signature (pandas_udf's per-BATCH model is the
    faster-still fourth point). Worth having as a distinct surface
    because it is the drop-in upgrade path for existing row UDFs.

    Same caveat as udf_python, same discipline: the equivalent
    JVM-side HOF (size(filter(split(...)))) is what you'd write in a
    hot path; the oracle computes exactly that, so the UDF's result is
    checked against the built-in's."""
    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def count_long_words(text: str) -> int:
        # None propagates (the oracle's string_split(NULL) chain is
        # NULL); a row UDF must branch on it explicitly.
        if text is None:
            return None
        return sum(1 for w in text.split(" ") if len(w) > 5)

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", count_long_words("text").alias("long_words"))
