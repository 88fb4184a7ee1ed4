"""C group — iterative graph analytics over the similarity graph.

Connected components (lifecycle.py) answers "which docs are the same";
PageRank answers "which docs are CENTRAL" — the canonical importance
score over the near-duplicate/citation graph, used to pick which
cluster member to keep or which page to prioritize in a crawl corpus.

The oracle is exact: the power iteration is UNROLLED into ten chained
(non-recursive) CTEs, one per round, so DuckDB computes the identical
fixed-iteration PageRank with aggregates allowed in every step —
sidestepping SQL's no-aggregates-in-recursion rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import table

_ITERS = 10
_DAMP = 0.85

# Same blocked candidate generation as dedup_clusters (lifecycle.py) —
# bounded pairs, never all-pairs.
_PAIRS_CTE = """
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND b.vec_id > a.vec_id
       AND b.vec_id - a.vec_id <= 50
      , LATERAL (
          SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                 SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                 SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
          FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y)
        ) d
      WHERE d.dot / (SQRT(d.na) * SQRT(d.nb)) >= 0.35
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(DISTINCT src) AS n FROM edges)
"""


def _pagerank_oracle() -> str:
    sql = _PAIRS_CTE
    sql += """,
    it0 AS (
      SELECT src AS vec_id, 1.0 / (SELECT n FROM nn) AS score
      FROM (SELECT DISTINCT src FROM edges)
    )"""
    for k in range(1, _ITERS + 1):
        sql += f""",
    it{k} AS (
      SELECT dst AS vec_id,
             (1 - {_DAMP}) / (SELECT n FROM nn) + {_DAMP} * s AS score
      FROM (
        SELECT e.dst, SUM(p.score / d.deg) AS s
        FROM it{k - 1} p
        JOIN edges e ON p.vec_id = e.src
        JOIN deg   d ON d.src = p.vec_id
        GROUP BY e.dst
      )
    )"""
    sql += f"""
    SELECT vec_id, ROUND(score, 6) AS score FROM it{_ITERS}
    """
    return sql


@register("graph_pagerank", group="C", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (10 rounds, damping 0.85) over the
    symmetric cosine-similarity graph. Every node in the edge set has
    degree >= 1, so there is no dangling mass; nodes outside the graph
    are unranked by definition.

    Spark plan: each round is contribute (join scores to edges on src,
    divide by degree) -> combine (groupBy dst, sum) -> damp — one
    shuffle per round on node id, ``localCheckpoint`` to truncate
    lineage exactly like dedup_clusters. Scores round to 6 dp on both
    engines so double summation order (Spark partial aggregation vs
    DuckDB streaming agg) cannot flip the hash. At 100 TB the
    per-round join keys both sides on src, so a pre-partitioned edge
    table amortizes its shuffle across all rounds — the classic Pregel
    layout."""
    from .llm import _norm

    _DOT = (
        "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    en = table(spark, sf_dir, "embeddings").withColumn("nrm", _norm("embedding"))
    a = en.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    ).repartition(32)  # spread pair gen; fixture reads as 1 partition
    b = en.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.expr(_DOT) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("id_b") > F.col("id_a"))
            & (F.col("id_b") - F.col("id_a") <= 50),
        )
        .filter(cos >= 0.35)
        .select("id_a", "id_b")
    )
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select("src").distinct()
    n = nodes.count()
    scores = nodes.select(
        F.col("src").alias("vec_id"), F.lit(1.0 / n).alias("score")
    ).localCheckpoint(eager=True)
    for _ in range(_ITERS):
        contrib = (
            edges.join(
                scores.withColumnRenamed("vec_id", "src"), "src"
            )
            .join(deg, "src")
            .select("dst", (F.col("score") / F.col("deg")).alias("c"))
        )
        scores = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("vec_id"),
                (F.lit((1 - _DAMP) / n) + F.lit(_DAMP) * F.col("s")).alias(
                    "score"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return scores.select("vec_id", F.round("score", 6).alias("score"))
