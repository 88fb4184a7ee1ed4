"""L group — corpus-management operators of a training-data pipeline.

The dedup/similarity ops (llm.py) find redundancy; these four run the
rest of the curation workflow a 100 TB pretraining corpus needs:
reproducible train/val/test splits, benchmark decontamination,
stratified subsampling, and fixed-budget sequence packing. All four
are pure relational plans (no UDFs) and hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import fixture_token, table

# 16-bit key-hash bucket, identical on both engines: the first 4 hex
# chars of md5 parsed as an integer. Spark's conv() and DuckDB's
# CAST('0x…') agree exactly on this range.
_SPARK_BUCKET = "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"
_DUCK_BUCKET = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)"


@register(
    "split_train_test",
    group="L",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_DUCK_BUCKET} % 100 < 80 THEN 'train'
                WHEN {_DUCK_BUCKET} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-key
    hash — the split every training run must reproduce bit-for-bit.
    Seeded RNG splits (randomSplit) shift whenever partitioning or
    parallelism changes; hashing the key makes the assignment a pure
    function of the row, stable across engines, cluster sizes, and
    reruns (same property as sample_hash_det, extended to multi-way).

    Narrow projection — no shuffle at any scale; md5+conv run inside
    whole-stage codegen."""
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET) % 100
    return d.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


_NGRAMS_DUCK = """
      SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
                     i -> array_to_string(l[i:i+2], ' '))) AS ng
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
"""


# The eval-set stand-in is a BOUNDED corpus slice: stride
# 97 * max(1, (max_doc_id + 1) // 5000) — the historical flat % 97 on
# the dense fixture id space below 5001 docs (outputs bit-identical),
# capped at ~51-103 docs as the corpus grows. Derived from the ID SPAN
# (r7, was count-derived, same fix as llm.query_panel): the span bound
# holds for sparse/aligned id spaces where a count-derived stride
# reverts to corpus-proportional. A real decontamination run's
# benchmark side is a FIXED external table (the eval suites), not 1%
# of the corpus; a proportional stand-in made the broadcast bench set
# unbounded (100 TB corpus -> ~1 TB "benchmark" broadcast) and the r6
# 100x census measured the semi-join's matched rows growing 1112x from
# exactly that. Same contract as llm.query_panel.
_BENCH_STRIDE_DUCK = (
    "(97 * (SELECT GREATEST(1, (COALESCE(MAX(doc_id), 0) + 1) // 5000)"
    " FROM documents))"
)

# Keyed on the fixture's (path, mtime) token — not the bare sf_dir —
# so a fixture regenerated in-place with a different id span rotates
# the cache instead of serving a stale stride (ADVICE r7).
_BENCH_STRIDE: dict[tuple[str, int], int] = {}


def _bench_stride(d, sf_dir: str) -> int:
    token = fixture_token(sf_dir, "documents")
    stride = _BENCH_STRIDE.get(token)
    if stride is None:
        max_id = d.agg(F.max("doc_id").alias("m")).first()["m"]
        stride = 97 * max(1, ((max_id or 0) + 1) // 5000)
        _BENCH_STRIDE[token] = stride
    return stride


@register(
    "decontaminate",
    group="L",
    oracle=f"""
    WITH g AS ({_NGRAMS_DUCK}),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % {_BENCH_STRIDE_DUCK} = 0),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (ng)
      WHERE g.doc_id % {_BENCH_STRIDE_DUCK} <> 0
    )
    SELECT d.doc_id, d.lang FROM documents d
    ANTI JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id % {_BENCH_STRIDE_DUCK} <> 0
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop every training document that
    shares an n-gram (trigram here; n is a dial) with the held-out
    eval set (a BOUNDED doc_id-stride slice stands in for it — see
    _BENCH_STRIDE_DUCK; real benchmarks are fixed-size, so the
    stand-in must be too or the broadcast below is unbounded). This is the
    standard guard against test-set leakage into a pretraining corpus.

    Plan shape at 100 TB: the eval side's distinct n-gram FINGERPRINTS
    (md5, not the text) are dim-sized and broadcast; corpus n-grams —
    built index-free (zip_with over shifted slices; an indexed lambda
    dereferencing the token array re-runs the substituted split per
    element, O(tokens^2)), exploded, hashed — semi-join against them
    with zero shuffle of corpus text. Only the matched doc_ids (a tiny
    set) reach the final broadcast anti join, so corpus rows are never
    shuffled at all."""
    d = table(spark, sf_dir, "documents")
    # Eager literal stride, the query_panel move: one tiny max() job
    # (parquet column stats), memoized per sf_dir, and the plan stays
    # byte-identical to the flat % 97.
    stride = _bench_stride(d, sf_dir)
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    grams = F.expr(
        "zip_with(zip_with(slice(tk, 1, greatest(size(tk)-2, 0)),"
        " slice(tk, 2, greatest(size(tk)-2, 0)), (x, y) -> concat_ws(' ', x, y)),"
        " slice(tk, 3, greatest(size(tk)-2, 0)), (x, y) -> concat_ws(' ', x, y))"
    )
    g = toks.select("doc_id", F.explode(grams).alias("ng")).select(
        "doc_id", F.md5("ng").alias("h")
    )
    bench = g.filter(F.col("doc_id") % stride == 0).select("h").distinct()
    contaminated = (
        g.filter(F.col("doc_id") % stride != 0)
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # contaminated is usually tiny but has NO size bound — under
    # boilerplate overlap every doc can match a bench n-gram, making
    # it corpus-proportional — so the anti join is unhinted (r7): the
    # estimator broadcasts it at fixture scale and shuffle-joins the
    # adversarial case. Only `bench` (panel-bounded) keeps its hint.
    return (
        d.filter(F.col("doc_id") % stride != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )


@register(
    "sample_stratified",
    group="L",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang, bkt
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang, bkt) AS n
      FROM (SELECT doc_id, lang, {_DUCK_BUCKET} % 16 AS bkt FROM documents)
    ) WHERE rn <= CAST(ceil(0.2 * n) AS BIGINT)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample with EXACT per-sub-stratum counts, over
    SUB-STRATA (lang, key-hash bucket): within each of a language's 16
    hash buckets, rank rows by key hash (a deterministic shuffle of the
    bucket) and keep the top ceil(0.2·n_bucket). Bernoulli sampling
    only hits the fraction in expectation — small strata (rare
    languages!) can come back empty, which is precisely what
    stratification must prevent in a multilingual corpus; the exact
    per-bucket quota keeps every language represented at 20% ± bucket
    rounding.

    Scale shape: the window partitions on (lang, bucket), so a
    90%-English corpus spreads its dominant stratum over 16 bounded
    partitions instead of one 90%-of-rows straggler — widen the bucket
    count with the cluster, the guarantee is per-bucket regardless. One
    shuffle serves both window functions (rank + bucket size share the
    partitioning)."""
    d = table(spark, sf_dir, "documents")
    bkt = (F.expr(_SPARK_BUCKET) % 16).alias("bkt")
    w = Window.partitionBy("lang", "bkt").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang", "bkt")
    return (
        d.select("doc_id", "lang", bkt)
        .select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(0.2 * F.col("n")).cast("bigint"))
        .select("doc_id", "lang")
    )


@register(
    "pack_sequences",
    group="L",
    oracle=f"""
    SELECT doc_id, lang, shard, n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id
    FROM (
      SELECT doc_id, lang, shard,
             len(string_split(text, ' ')) AS n_tokens,
             SUM(len(string_split(text, ' '))) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM (SELECT doc_id, lang, text, {_DUCK_BUCKET} % 16 AS shard
            FROM documents)
    )
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (per (language, shard)
    stream, in doc_id order) and cut each stream into 512-token
    training packs — each doc labeled with the pack its FIRST token
    lands in, packs addressed by (lang, shard, pack_id). Packing is how
    pretraining batches reach full context-length utilization instead
    of padding; start-offset assignment keeps it a pure window
    expression (running sum → integer-divide by the budget), no
    stateful loop, no UDF.

    Scale shape: the stream is sharded by key hash into 16
    sub-streams per language, so the running-sum window partitions on
    (lang, shard) — a 90%-English corpus fills 16 bounded partitions,
    not one straggler. Packs never cross shards in a real loader
    anyway (each worker consumes its own shard), so the sharded
    definition is the production semantics, not an approximation. One
    shuffle on (lang, shard); the running sum is Spark's standard
    partial-aggregated window."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    shard = (F.expr(_SPARK_BUCKET) % 16).alias("shard")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select("doc_id", "lang", shard, n_tokens.alias("n_tokens")).select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum"),
    ).select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.expr("CAST((cum - n_tokens) DIV 512 AS BIGINT)").alias("pack_id"),
    )


@register(
    "corpus_mixture",
    group="L",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(substr(source, 4) AS INT) % 4 AS cls,
             substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) AS h
      FROM documents
    )
    SELECT doc_id, lang, source
    FROM t
    WHERE CASE cls WHEN 0 THEN h < '40'
                   WHEN 1 THEN h < '80'
                   WHEN 2 THEN h < 'c0'
                   ELSE TRUE END
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling: each source family keeps a
    different target fraction (25/50/75/100% by source class) — the op
    that turns a raw crawl into a weighted pretraining mix. Membership
    is a content-hash threshold, not RNG: md5 hex strings compare
    lexicographically as numbers (hex digits are ASCII-ordered), so
    `h < '40'` IS "hash < 1/4 of the space" on both engines, and the
    same doc survives every run at every cluster size.

    Pure narrow filter — no shuffle, no state; the hash predicate
    rides the scan and scales linearly forever."""
    d = table(spark, sf_dir, "documents")
    cls = (F.expr("substring(source, 4)").cast("int") % 4).alias("cls")
    h = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("source"))),
        1,
        2,
    ).alias("h")
    t = d.select("doc_id", "lang", "source", cls, h)
    keep = (
        F.when(F.col("cls") == 0, F.col("h") < "40")
        .when(F.col("cls") == 1, F.col("h") < "80")
        .when(F.col("cls") == 2, F.col("h") < "c0")
        .otherwise(F.lit(True))
    )
    return t.filter(keep).select("doc_id", "lang", "source")


@register(
    "corpus_token_buckets",
    group="L",
    oracle="""
    SELECT lang,
           CASE WHEN n_chars < 64   THEN '0-63'
                WHEN n_chars < 256  THEN '64-255'
                WHEN n_chars < 1024 THEN '256-1023'
                WHEN n_chars < 4096 THEN '1024-4095'
                ELSE '4096+' END AS bucket,
           COUNT(*) AS docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def corpus_token_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution audit: docs and total volume per (lang,
    size bucket) — the histogram a curation run reads before choosing
    truncation / packing budgets. Buckets are an explicit CASE ladder
    (not floor(log2): fp-boundary-free and readable), the aggregate is
    partial-final with output cardinality langs × 5 regardless of
    corpus size. Counts and integer sums only."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 64, "0-63")
        .when(F.col("n_chars") < 256, "64-255")
        .when(F.col("n_chars") < 1024, "256-1023")
        .when(F.col("n_chars") < 4096, "1024-4095")
        .otherwise("4096+")
    ).alias("bucket")
    return d.groupBy("lang", bucket).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "corpus_dedup_report",
    group="L",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 4)
             AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate accounting per source — the report that decides
    which crawl snapshots are worth keeping BEFORE paying for a full
    dedup pass. Exact distinct over content digests: the shuffle moves
    16-byte hashes, never documents (the dedup_exact discipline), and
    Spark plans COUNT + COUNT DISTINCT in one aggregate via expand.
    The only float is the final ratio, rounded identically on both
    engines."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.round(
            1.0 - F.countDistinct(F.md5("text")) * 1.0 / F.count(F.lit(1)), 4
        ).alias("dup_rate"),
    )
