"""L group — LLM-training-data pipeline operators over the
``documents`` / ``embeddings`` fixtures: deduplication, text analysis,
similarity search. (Multimodal plumbing lives in multimodal.py.)

100 TB posture, applied uniformly here:
- NO unbounded all-pairs joins. Every pairwise op is blocked (label,
  lang/source) and banded (id-distance) or LSH-bucketed BEFORE any
  join, so output and compute grow linearly, not quadratically.
- Token pipelines stay JVM-side: split / explode / transform /
  aggregate higher-order functions, never per-row Python.
- Approximate ops (MinHash LSH, random-projection LSH) carry fixed
  seeds — reproducible across runs, rows-only vs the oracle because
  sketch internals are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import spread_partitions
from ..tables import fixture_token, table

# Retrieval query panel, shared by every similarity-search op
# (sim_knn_topk, sim_range_search, sim_ann_lsh, extras.sim_ann_ivf) and
# their recall companions: vec_ids divisible by a CORPUS-DERIVED stride
# of 100 * max(1, (max_id + 1) // 3200). On the dense fixture id space
# max_id + 1 == n, so below 3200 vectors the stride is the historical
# 100 (every fixture SF: results bit-identical); past it the panel is
# capped at <=64 queries no matter how the corpus OR its id space
# grows. The id-span derivation (r7, was count-derived) closes the
# sparse/aligned-id hole: with vec_ids all multiples of 100, a
# count-derived stride left the panel corpus-proportional — the span
# bound |{k*stride} ∩ [0, max_id]| <= (max_id+1)/stride <= 64 holds
# for ANY id distribution.
# Exact retrieval work is |Q| x |C| — with a query set PROPORTIONAL to
# the corpus (the old flat `% 100`) every brute-force op is quadratic
# regardless of plan shape, and the r6 100x census measured
# sim_knn_topk / sim_range_search / the recall truths timing out on
# exactly that. A bounded panel is the honest retrieval contract at
# 100 TB (you evaluate against a fixed query panel, not against 1% of
# the corpus) and makes the whole family linear in |C| while keeping
# the broadcast-queries / scan-corpus-once plan.
_QSTRIDE_SQL = (
    "(SELECT 100 * GREATEST(1, (COALESCE(MAX(vec_id), 0) + 1) // 3200)"
    " FROM embeddings)"
)

# stride per fixture IDENTITY (path + mtime token, tables.fixture_token),
# computed once per process: every retrieval op and recall companion
# calls query_panel (sim_ann_lsh twice), and the probe job —
# metadata-cheap but a real Spark job — used to re-run per call
# (ADVICE r6). Keying on the mtime token (not the bare path) means a
# fixture regenerated in-place with a different id span rotates the
# cache instead of serving a stale stride (ADVICE r7).
_PANEL_STRIDE: dict[tuple[str, int], int] = {}


def query_panel(df: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter ``df`` (any frame carrying ``vec_id``) to the query
    panel. The stride is computed EAGERLY from max(vec_id) of the BASE
    embeddings table — one tiny column-scan job (parquet min/max
    statistics make it near-metadata; memoized per ``sf_dir`` so it
    runs once per process however many ops consume the panel) — and
    folded in as a literal: a literal keeps the op's plan
    byte-identical to the historical `% 100` one, while the lazy
    alternative (1-row stride frame joined in) measurably perturbed
    broadcast-size estimates and added shuffles to every consumer.
    DuckDB mirror: ``vec_id % {_QSTRIDE_SQL} = 0``."""
    token = fixture_token(sf_dir, "embeddings")
    stride = _PANEL_STRIDE.get(token)
    if stride is None:
        max_id = (
            table(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id").alias("m"))
            .first()["m"]
        )
        stride = 100 * max(1, ((max_id or 0) + 1) // 3200)
        _PANEL_STRIDE[token] = stride
    return df.filter((F.col("vec_id") % F.lit(stride)) == 0)


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    group="L",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash: one shuffle on the digest
    (fixed 32-byte key, not the full document — at 100 TB you shuffle
    hashes, never bodies), keep the smallest doc_id per group."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


@register("dedup_near", group="L", oracle=None)
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH over 3-token
    shingles, hand-rolled in DataFrame primitives: 16 xxhash64-seeded
    minhashes per doc, AND-composed into 8 bands of 2 (bucket key =
    hash of the band's two mins), bucket-join the band collisions,
    then exact shingle-set Jaccard >= 0.5 on the survivors. rows-only
    (DuckDB has no xxhash64); deterministic, so run-twice and
    layout-invariance hold bit-exactly.

    Why not Spark ML's MinHashLSH.approxSimilarityJoin (the previous
    implementation): its OR-amplification joins on SINGLE minhash
    values, and a single globally-common shingle that owns the minimum
    drags the ENTIRE corpus into one bucket — the 10x scaling census
    measured the resulting whole-corpus self-join as a >150s wedge on
    one AQE-coalesced task at a mere 50k docs. AND-composition of 2
    mins per band is the textbook fix (two independent minima must
    both collide), and 8 bands keep recall: a true pair at Jaccard s
    collides with prob 1-(1-s^2)^8 (0.90 at the s=0.5 threshold,
    ~1-2e-5 at the planted-recall test's s=0.86). Residual hot buckets
    (mass-duplicated boilerplate) are additionally neighborhood-capped
    at 16 rank positions via the same rn-DIV-16 two-sided bucket join
    as dedup_levenshtein/banded_candidates, so joined rows stay
    O(16 H) per bucket no matter how degenerate the pile."""
    return _near_pairs(_minhash_sig(_shingled(spark, sf_dir)))


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles: array<string>) — the 3-token shingle arrays
    shared by dedup_near and its recall companion (which checkpoints
    this relation ONCE and feeds both its injectivity pass and the
    signature pipeline from it)."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())  # MinHash of nothing is undefined
    )
    toks = d.withColumn("tokens", F.split("text", " "))
    # Index-free shingles (zip_with over shifted slices): an indexed
    # lambda dereferencing `tokens` re-runs the substituted split per
    # element when the optimizer collapses the alias — O(tokens^2).
    # zip_with pads the shorter slice with null and concat_ws skips
    # nulls, reproducing the old <3-token edge cases exactly.
    return toks.withColumn(
        "shingles",
        F.expr(
            "zip_with(zip_with(slice(tokens, 1, greatest(size(tokens)-2, 1)),"
            " slice(tokens, 2, greatest(size(tokens)-2, 1)),"
            " (x, y) -> concat_ws(' ', x, y)),"
            " slice(tokens, 3, greatest(size(tokens)-2, 1)),"
            " (x, y) -> concat_ws(' ', x, y))"
        ),
    ).select("doc_id", "shingles")


def _minhash_sig(shingled: DataFrame) -> DataFrame:
    """Checkpointed (doc_id, sset, mh) MinHash signature relation."""
    # ONE select end-to-end per doc: shingle strings hash to 64-bit
    # ints FIRST (sset is the int set), so (a) every downstream pass —
    # 16 minhashes, the pair shuffle, the exact Jaccard — works on
    # 8-byte longs instead of ~20-char strings (the candidate-pair
    # shuffle at the 100x fixture moves ~8M sset pairs; long arrays
    # are ~2.5x smaller), and (b) Jaccard on the int sets equals
    # Jaccard on the string sets barring a 2^-64 shingle-hash
    # collision. Aliased columns are referenced once each, so
    # CollapseProject cannot multiply hash passes.
    sig = (
        shingled.withColumn(
            "sset",
            F.expr("array_distinct(transform(shingles, s -> xxhash64(s)))"),
        )
        .filter(F.expr("size(sset) > 0"))
        .select(
            "doc_id",
            "sset",
            F.expr(
                "transform(sequence(0, 15),"
                " i -> array_min(transform(sset, h -> xxhash64(i, h))))"
            ).alias("mh"),
        )
    )
    # Materialize the signature relation ONCE: three branches consume
    # sig (band explode, sa attach, sb attach) and without a
    # materialization barrier each re-runs the scan+shingle+hash
    # pipeline — measured 3x the end-to-end wall at sf0.1 (5.4s -> 1.8s
    # with the checkpoint). This is the standard MinHash design at
    # scale too: signatures are ~2-5% of corpus bytes (8-byte hashes,
    # no text) and every serious pipeline persists them before banding.
    # localCheckpoint = executor-local MEMORY_AND_DISK (same trade as
    # dedup_clusters' iterative checkpoint: lineage is cut, an executor
    # loss fails the job instead of recomputing — acceptable for a
    # batch dedup pass, and the reliable-storage variant is a one-line
    # swap in production). eager=False keeps fn() lazily-planned for
    # the plan-inspection sweeps; values are unchanged either way, so
    # run-twice determinism holds bit-exactly.
    return sig.localCheckpoint(eager=False)


def _near_pairs(sig: DataFrame) -> DataFrame:
    """Band, bucket-join, and exact-Jaccard-filter a signature
    relation from :func:`_minhash_sig` — dedup_near's second half."""
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 7), j -> xxhash64("
                "mh[cast(2*j AS int)], mh[cast(2*j+1 AS int)]))"
            )
        ).alias("band", "bkey"),
    )
    nbr = 16
    # Rank order is a PER-BAND hash of the doc id, not global doc_id
    # order: with doc_id order all 8 bands were correlated for a
    # mass-duplicate pile (a true pair >16 rank positions apart in one
    # band was >16 apart in all of them — r5 ADVICE). Under
    # independent per-band orders a pair that misses the neighborhood
    # cap in one band gets 7 fresh draws, and within ONE bucket the
    # <=16-apart pairs chain the whole pile transitively either way
    # (pinned by tests/test_llm_ops.py::test_hot_bucket_pile_chains).
    # doc_id tiebreak keeps the order total and deterministic.
    ranked = bands.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("band", "bkey").orderBy(
                F.xxhash64("band", "doc_id"), "doc_id"
            )
        ),
    )
    a = ranked.select(
        F.col("doc_id").alias("id_a"),
        "band",
        "bkey",
        F.col("rn").alias("rn_a"),
    ).withColumn(
        "bkt",
        F.explode(
            F.array(F.expr(f"rn_a DIV {nbr}"), F.expr(f"rn_a DIV {nbr} + 1"))
        ),
    )
    b = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
        F.col("rn").alias("rn_b"),
    ).withColumn("bkt", F.expr(f"rn_b DIV {nbr}"))
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (a["bkt"] == b["bkt"])
            & (F.col("rn_b") - F.col("rn_a") >= 1)
            & (F.col("rn_b") - F.col("rn_a") <= nbr),
        )
        # hash-rank order is NOT id order: normalize to id_a < id_b
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sset").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sset").alias("sb"))
    # Equal-set fast path: duplicate-heavy buckets are mostly
    # IDENTICAL shingle sets; array equality is one O(n) pass vs
    # intersect+union's hash-set builds, and Jaccard of equal sets is
    # exactly 1.0 either way.
    jac = F.when(F.col("sa") == F.col("sb"), F.lit(1.0)).otherwise(
        F.size(F.array_intersect("sa", "sb"))
        / F.size(F.array_union("sa", "sb"))
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_sim", jac)
        .filter(F.col("jaccard_sim") >= 0.5)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


@register(
    "dedup_ngram_jaccard",
    group="L",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, source, string_split(text, ' ') AS l
                  FROM documents),
    pos AS (SELECT doc_id, lang, source, unnest(l) AS w,
                   generate_subscripts(l, 1) AS i
            FROM toks),
    sh AS (
      SELECT DISTINCT p1.doc_id, p1.lang, p1.source,
             p1.w || ' ' || p2.w || ' ' || p3.w AS shingle
      FROM pos p1
      JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i = p1.i + 1
      JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.i = p1.i + 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    dfreq AS (SELECT lang, source, shingle, COUNT(*) AS df
              FROM sh GROUP BY 1, 2, 3),
    rare AS (SELECT sh.doc_id, sh.lang, sh.source, sh.shingle
             FROM sh JOIN dfreq
               ON dfreq.lang = sh.lang AND dfreq.source = sh.source
              AND dfreq.shingle = sh.shingle
             WHERE dfreq.df <= 16),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare a JOIN rare b
        ON a.lang = b.lang AND a.source = b.source
       AND a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_both
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) >= 0.12
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram-shingle Jaccard near-dup pairs via the standard
    two-stage exact-dedup layout: (1) CANDIDATE generation joins only
    on shingles with per-block document frequency <= 16, so a
    stop-shingle (boilerplate shared by most docs of a (lang, source)
    block) contributes ZERO candidate pairs instead of a quadratic
    blowup — per-shingle join fanout is bounded by df^2 <= 256
    regardless of corpus size; (2) exact Jaccard is then computed on
    the FULL shingle sets of surviving pairs (the df-cap never skews a
    reported score, it only prunes which pairs are scored).

    Semantics: a pair whose ONLY shared shingles are stop-shingles is
    not reported — the right call for near-dup detection, where shared
    boilerplate is exactly the signal to ignore. The DuckDB oracle
    applies the identical df<=16 cap, so the contract is exact.

    Scale: stage-1 shuffles rare shingles only (bounded fanout);
    stage-2 cost is linear in candidate pairs, never all-pairs.
    tests/test_llm_ops.py proves the bound on a corpus where every doc
    shares one boilerplate shingle: candidate count stays 0 from that
    shingle while true near-dups (sharing rare shingles) still surface.

    Plan shape (audited, not just passed): the corpus is tokenized and
    shingled ONCE into per-doc ARRAYS; stage 1 explodes that relation
    a single time and takes per-block document frequency as a WINDOW
    count over (lang, source, shingle) — no df self-join, and the
    candidate self-join that follows re-shuffles on the same keys, so
    the exchange is built once and reused. Stage 2 never explodes:
    candidate pairs join back to the ARRAY relation and intersection
    is size(array_intersect(...)), with set sizes carried on the same
    rows — no separate sizes aggregate, no second pass over text. The
    naive formulation (shared CTE referenced by sizes/dfreq/both join
    sides) re-scans and re-shingles the corpus 8x; at 100 TB that is
    the whole job's cost."""
    cand, sh_arr = _ngram_candidates(spark, sf_dir)
    return _ngram_jaccard_scored(cand, sh_arr)


def _ngram_jaccard_scored(cand: DataFrame, sh_arr: DataFrame) -> DataFrame:
    """Stage 2 of dedup_ngram_jaccard: exact Jaccard on the full
    DISTINCT shingle arrays of the candidate pairs (shared with
    dedup_near_recall's truth pipeline, which supplies a derived
    sh_arr — r11)."""
    fa = sh_arr.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n").alias("na"),
    )
    fb = sh_arr.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n").alias("nb"),
    )
    # Equal-array fast path: duplicate-heavy corpora make identical
    # (already-distinct) shingle arrays the common candidate case, and
    # the O(n) equality check skips the intersect's hash-set build.
    # both == size(sh_a) == na there, so the value is unchanged.
    scored = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn(
            "both",
            F.when(F.col("sh_a") == F.col("sh_b"), F.col("na")).otherwise(
                F.size(F.array_intersect("sh_a", "sh_b"))
            ),
        )
    )
    jac = F.col("both").cast("double") / (
        F.col("na") + F.col("nb") - F.col("both")
    )
    return (
        scored.filter(jac >= 0.12)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def _ngram_candidates(
    spark: SparkSession, sf_dir: str, sh_arr: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """dedup_ngram_jaccard's bounded candidate generator, shared with
    extensions.dedup_containment: returns (cand, sh_arr) where sh_arr
    carries each doc's DISTINCT 3-shingle array + its size and cand is
    the deduplicated id_a < id_b pairs sharing a rare shingle (per-
    (lang, source)-block document frequency <= 16 — per-shingle join
    fanout bounded by df^2 <= 256 at any corpus size).

    ``sh_arr`` may be supplied prebuilt (dedup_near_recall derives it
    from ONE shared shingle base instead of re-scanning and
    re-shingling the corpus for its truth pipeline — r11); it must
    already be a materialization barrier."""
    if sh_arr is None:
        d = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        )
        sh_arr = (
            d.withColumn("tokens", F.split("text", " "))
            .select(
                "doc_id",
                "lang",
                "source",
                F.expr(
                    "array_distinct(zip_with(zip_with("
                    " slice(tokens, 1, greatest(size(tokens)-2, 0)),"
                    " slice(tokens, 2, greatest(size(tokens)-2, 0)),"
                    " (x, y) -> concat_ws(' ', x, y)),"
                    " slice(tokens, 3, greatest(size(tokens)-2, 0)),"
                    " (x, y) -> concat_ws(' ', x, y)))"
                ).alias("shingles"),
            )
            .withColumn("n", F.size("shingles"))
            # Materialization barrier: sh_arr feeds the rare-shingle
            # explode AND both sides of the stage-2 array join-back — the
            # r9 shape tokenized + shingled the corpus once per branch
            # (4 scans in the r10 before-plan; 2.13s -> 1.73s at sf0.1).
            # Trade (measured, documented): the checkpoint holds the
            # per-doc DISTINCT shingle arrays (~3x text bytes) on executor
            # disk once, against re-running scan + zip_with shingling +
            # array_distinct three more times; the r6 probe that rejected
            # materializing EXPLODED shingle rows does not apply to the
            # array relation, which is one row per doc.
            .localCheckpoint(eager=False)
        )
    rare = (
        sh_arr.select(
            "doc_id", "lang", "source", F.explode("shingles").alias("shingle")
        )
        .withColumn(
            "df",
            F.count(F.lit(1)).over(
                Window.partitionBy("lang", "source", "shingle")
            ),
        )
        .filter(F.col("df") <= 16)
    )
    a, b = rare.alias("a"), rare.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return cand, sh_arr


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "text_tokenize",
    group="L",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
    FROM documents
    """,
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization with total/distinct token counts — all
    JVM-side array functions, zero Python in the row path."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


@register(
    "text_ngrams",
    group="L",
    oracle="""
    WITH toks AS (SELECT row_number() OVER () AS rid,
                         string_split(text, ' ') AS l FROM documents),
    pos AS (SELECT rid, unnest(l) AS w, generate_subscripts(l, 1) AS i
            FROM toks)
    SELECT p1.w || ' ' || p2.w AS bigram, COUNT(*) AS n
    FROM pos p1 JOIN pos p2 ON p1.rid = p2.rid AND p2.i = p1.i + 1
    GROUP BY 1
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts via index-free zip_with-of-slices — the
    bigram array is built inside codegen per row (no self-join, no
    window; an indexed lambda dereferencing the split re-runs it per
    element after alias substitution), then one explode + count
    shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("tk"))
    bigrams = F.expr(
        "zip_with(slice(tk, 1, size(tk)-1), slice(tk, 2, size(tk)-1),"
        " (x, y) -> concat_ws(' ', x, y))"
    )
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_stats",
    group="L",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus statistics — the partition-level audit
    a training-data pipeline runs before mixing sources."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_tfidf",
    group="L",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY w),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id, tf.w AS term,
           ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf, df, n WHERE tf.w = df.w AND df.df < (SELECT n FROM n)
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf weights: term frequency per doc, document frequency per
    term, joined back — df and N are tiny (vocabulary-sized / scalar)
    so both joins broadcast; the only big shuffle is the tf groupBy.
    Terms present in every document carry idf=0 and are dropped on
    both sides.

    df is derived from tf (whose rows ARE the distinct (doc, term)
    pairs: df = tf.groupBy(w).count) and tf is MATERIALIZED once
    (localCheckpoint, the dedup_near barrier pattern): without the
    barrier the df branch and the main join each re-ran the
    tokenize+explode+groupBy pipeline — two corpus scans per run,
    measured 10.8x wall at the r6 100x census; with it the corpus is
    tokenized exactly once and tf (a fraction of corpus bytes — no
    text, just (doc, term, count)) feeds both branches. The hot-token
    skew answer is map-side combine in both aggregates — never a
    window over partitionBy(w), which would buffer every occurrence
    of 'the' in one task."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        # df is vocabulary-sized — it GROWS with the corpus (Heaps'
        # law), so no broadcast hint: the estimator broadcasts it at
        # fixture scale and shuffle-joins real vocabularies (the
        # text_perplexity_unigram posture). The 1-row N stays hinted.
        tf.join(df, "w")
        .join(F.broadcast(n))
        .filter(F.col("df") < F.col("n"))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@register(
    "text_collocation",
    group="L",
    oracle="""
    WITH toks AS (SELECT row_number() OVER () AS rid,
                         string_split(text, ' ') AS l FROM documents),
    pos AS (SELECT rid, unnest(l) AS w, generate_subscripts(l, 1) AS i
            FROM toks),
    uni AS (SELECT w, COUNT(*) AS c FROM pos GROUP BY w),
    nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
    big AS (
      SELECT p1.w AS w1, p2.w AS w2, COUNT(*) AS c
      FROM pos p1 JOIN pos p2 ON p1.rid = p2.rid AND p2.i = p1.i + 1
      GROUP BY 1, 2
    ),
    nb AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM big)
    SELECT w1 || ' ' || w2 AS bigram, CAST(b.c AS BIGINT) AS n,
           ROUND(LN((b.c / (SELECT n FROM nb))
                    / ((u1.c / (SELECT n FROM nu))
                       * (u2.c / (SELECT n FROM nu)))), 6) AS pmi
    FROM big b
    JOIN uni u1 ON b.w1 = u1.w
    JOIN uni u2 ON b.w2 = u2.w
    WHERE b.c >= 5
    """,
)
def text_collocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation / phrase mining: pointwise mutual information of
    corpus bigrams, PMI = ln(p(ab) / (p(a)·p(b))) — the classic
    signal for promoting word pairs to vocabulary phrases before
    tokenizer training. Bigrams seen < 5 times are noise-floored out.

    Plan economy (r4): the corpus is tokenized and exploded ONCE into
    a (w1, next-token) relation — every token appears exactly once as
    w1 (the last token of a doc carries a NULL successor), so the SAME
    relation yields unigram counts (groupBy w1) and bigram counts
    (filter NULL out, groupBy pair). Corpus totals ride the two count
    tables as sum-over-() windows: a single-task pass over VOCAB-sized
    rows, replacing the two scalar-subquery aggregates that each
    re-tokenized the whole corpus. The unigram table then joins back
    TWICE (once per bigram side) — unhinted (r7): vocabulary GROWS
    with the corpus (Heaps' law), so the estimator broadcasts it at
    fixture scale and shuffle-joins real vocabularies instead of a
    forced multi-GB build side. Physical result: 3 corpus
    scans/explodes (bigram side + one per unigram side) down from 5;
    at 100 TB the corpus passes are the entire cost and the
    vocab-sized window is noise. The PMI argument is a ratio of exact
    integer counts, so ln() sees the same double on both engines and
    6 dp rounding is stable."""
    d = table(spark, sf_dir, "documents")
    pairs = (
        d.select(F.split("text", " ").alias("tk"))
        .select(
            F.explode(
                F.expr(
                    "zip_with(tk,"
                    " concat(slice(tk, 2, greatest(size(tk)-1, 0)),"
                    "        array(CAST(NULL AS STRING))),"
                    " (x, y) -> struct(x AS w1, y AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    everything = Window.partitionBy()
    uni = (
        pairs.groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("n_uni", F.sum("c").over(everything).cast("double"))
    )
    big = (
        pairs.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("n_big", F.sum("c").over(everything).cast("double"))
    )
    u1 = uni.select(
        F.col("w1"), F.col("c").alias("c1"), F.col("n_uni")
    )
    u2 = uni.select(
        F.col("w1").alias("w2"), F.col("c").alias("c2")
    )
    return (
        big.filter(F.col("c") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c").cast("bigint").alias("n"),
            F.round(
                F.log(
                    (F.col("c") / F.col("n_big"))
                    / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)

_COSINE_SQL_CTE = """
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND b.vec_id > a.vec_id
       AND b.vec_id - a.vec_id <= 20
    ),
    tagged AS (SELECT row_number() OVER () AS pid, * FROM pairs),
    un AS (SELECT pid, id_a, id_b, unnest(ea) AS x, unnest(eb) AS y
           FROM tagged),
    dots AS (
      -- grouped per PAIR ROW (pid), not per (id_a, id_b): duplicate
      -- vec_ids would otherwise mix elements of different vectors
      -- into one garbage dot product (key-collision sweep find)
      SELECT id_a, id_b,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
      FROM un GROUP BY pid, id_a, id_b
    )
    SELECT id_a, id_b, ROUND(dot / (SQRT(na) * SQRT(nb)), 4) + 0 AS cosine
    FROM dots
"""


def _cosine(a: str, b: str):
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.expr(_DOT.format(a=a, b=a))
    nb = F.expr(_DOT.format(a=b, b=b))
    return dot / (F.sqrt(na) * F.sqrt(nb))


def _norm(vec_col: str):
    """Per-row vector norm, computed ONCE before pair generation.

    The HOF lambdas (zip_with/aggregate) are interpreted per element,
    not codegen'd, so recomputing both norms inside every candidate
    pair costs 3 array passes per pair instead of 1. Precomputing
    ``sqrt(dot(v, v))`` per row is bit-identical (same expression tree,
    same summation order, evaluated once) and cuts pair arithmetic 3x —
    at 100 TB you'd persist the norm (or pre-normalized vectors) as a
    table column at ingest."""
    return F.sqrt(F.expr(_DOT.format(a=vec_col, b=vec_col)))


def banded_candidates(spark: SparkSession, sf_dir: str, band: int) -> DataFrame:
    """Label-blocked, id-banded candidate pairs (id_a < id_b <=
    id_a + band) with embeddings and precomputed norms attached — the
    shared candidate kernel of sim_cosine_pairs,
    dedup_embedding_cosine, dedup_clusters (+ bigstar/canonical),
    graph_pagerank, and graph_triangles. Columns: id_a, id_b, ea, eb,
    na, nb; each caller applies its own cosine threshold/projection.

    The band bucket (``vec_id DIV band``) is PART OF THE EQUI-JOIN
    KEY, not a residual predicate. Joining on label alone hash-joins
    whole label blocks and filters the band afterwards — label
    cardinality is FIXED while the corpus grows, so joined rows grow
    O(n^2 / |labels|): the round-5 10x-fixture measurement (SCALING.md)
    put dedup_clusters at 15-18x wall-time on 10x data from exactly
    this (400k -> 40M joined candidate rows; the final edge graph grew
    only 11 -> 110). With the bucket in the key, the left side explodes
    to its two admissible buckets (``id DIV band`` and +1 — a partner
    with id_b - id_a <= band can hash nowhere else, bucket values being
    consecutive integers under either floor or trunc division), the
    right side hashes to exactly one, so every qualifying pair meets
    exactly once, candidates are O(band) per node — linear in the
    corpus — and the shuffle key (label, bucket) stays high-cardinality
    even with few labels. Same two-sided bucketing as
    join_range_bucketed; the band predicate is re-applied as a
    residual, so the pair set is IDENTICAL to the label-block + filter
    formulation and no oracle changes."""
    en = table(spark, sf_dir, "embeddings").withColumn("nrm", _norm("embedding"))
    a = (
        en.select(
            F.col("vec_id").alias("id_a"),
            F.col("label").alias("la"),
            F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
        )
        .transform(spread_partitions)  # no-op once the scan has >= cores partitions
        .withColumn(
            "bkt",
            F.explode(
                F.array(
                    F.expr(f"id_a DIV {band}"), F.expr(f"id_a DIV {band} + 1")
                )
            ),
        )
    )
    b = en.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    ).withColumn("bkt", F.expr(f"id_b DIV {band}"))
    return a.join(
        b,
        (F.col("la") == F.col("lb"))
        & (a["bkt"] == b["bkt"])
        & (F.col("id_b") > F.col("id_a"))
        & (F.col("id_b") - F.col("id_a") <= band),
    ).select("id_a", "id_b", "ea", "eb", "na", "nb")


@register("sim_cosine_pairs", group="L", oracle=_COSINE_SQL_CTE)
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine similarity over label-blocked, id-banded pairs.

    The candidate set is bounded TWICE before any arithmetic: equal
    ``label`` (block) and ``vec_id`` within 20 (band) — output is
    O(20n), never O(n^2); the equi-join key is (label, band bucket) —
    see banded_candidates for why the bucket must be IN the key, not a
    residual. Dot products run in the JVM via zip_with/aggregate HOFs
    over the float arrays; rounded to 4dp so cross-engine double
    summation order can't flip the hash, and `+ 0` after the round
    normalizes IEEE signed zero (the skew sweep's hot label pairs
    unrelated vectors whose cosine rounds to +/-0.0 — ts_zscore's
    rule)."""
    pairs = banded_candidates(spark, sf_dir, band=20)
    cos = F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return pairs.select(
        "id_a", "id_b", (F.round(cos, 4) + F.lit(0)).alias("cosine")
    )


_KNN_SQL = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % {_QSTRIDE_SQL} = 0),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS ea, c.embedding AS eb
      FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
    ),
    tagged AS (SELECT row_number() OVER () AS pid, * FROM pairs),
    un AS (SELECT pid, query_id, neighbor_id, unnest(ea) AS x, unnest(eb) AS y
           FROM tagged),
    dots AS (
      -- per PAIR ROW (pid): duplicate vec_ids must not mix elements
      -- of different vectors into one dot (key-collision sweep)
      SELECT query_id, neighbor_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
      FROM un GROUP BY pid, query_id, neighbor_id
    ),
    scored AS (
      SELECT query_id, neighbor_id, dot / (SQRT(na) * SQRT(nb)) AS cos
      FROM dots
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@register("sim_knn_topk", group="L", oracle=_KNN_SQL)
def sim_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k nearest neighbors for a BOUNDED query
    panel (query_panel: <=64 queries at any corpus size, the historical
    1% at fixture scale) against the full corpus: broadcast the query side,
    so the 'cross' join is a broadcast nested loop that scans the
    corpus ONCE with no shuffle of the big side; per-query top-5 via
    WindowGroupLimit (rank <= 5 is pushed into the sort). This is the
    correct brute-force posture at scale — the unbounded variant
    (corpus x corpus) is never acceptable; for that, see sim_ann_lsh.
    Ranking uses full-precision cosine; only ranks are output, so the
    hash is float-free."""
    from pyspark.sql import Window

    en = table(spark, sf_dir, "embeddings").withColumn("nrm", _norm("embedding"))
    q = query_panel(en, spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    c = en.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    ).transform(spread_partitions)  # no-op once the scan has >= cores partitions
    pairs = F.broadcast(q).join(c, F.col("neighbor_id") != F.col("query_id"))
    cos = F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


@register("sim_ann_lsh", group="L", oracle=None)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 NN per query via banded random-projection
    (E2LSH-style) bucketing, hand-rolled in DataFrame primitives:
    16 deterministic projections (hyperplane component (i, k) =
    xxhash64(i, k) mapped to [-1, 1] — no driver-side randomness, no
    fitted model), AND-composed into 8 bands of 2 quantized
    projections (width 0.5), bucket-join query bands against corpus
    bands, exact euclidean on the distinct candidates, top-5 per query
    by (distance, neighbor_id). rows-only: DuckDB has no xxhash64;
    recall vs brute force is pinned by tests/test_llm_ops.py.

    Why not ML's BucketedRandomProjectionLSH.approxSimilarityJoin (the
    previous implementation): with unit vectors its single-projection
    tables at bucketLength 2.0 degenerate to ~2 buckets per table, so
    every query met ~half the corpus 4 times over and the 'threshold
    3.0' output (> the unit-vector diameter 2) was ALL of it — the 10x
    census measured 57x wall from what was effectively a full
    query x corpus join. AND-ing two quantized projections per band
    makes buckets selective (a random pair must agree on BOTH cells),
    8 OR-bands keep near-pair recall, and the top-5 contract bounds
    the output at O(5 |queries|) no matter how the corpus grows —
    the same contract as sim_ann_ivf, which is the honest shape for
    ANN at 100 TB."""
    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    # 16 projections per vector; component (i, k) of hyperplane i is a
    # deterministic hash of (i, k) scaled to [-1, 1], normalized by the
    # expected hyperplane norm sqrt(d/3) so the quantization width
    # means the same thing at any dimensionality.
    proj = (
        "transform(sequence(0, 15), i -> aggregate("
        " zip_with(embedding, sequence(0, size(embedding) - 1),"
        "  (x, k) -> cast(x AS double)"
        "   * (cast(xxhash64(i, k) AS double) / 9.223372036854776e18)),"
        " cast(0 AS double), (a, x) -> a + x)"
        " / sqrt(cast(size(embedding) AS double) / 3.0))"
    )
    sig = e.select("vec_id", "embedding", F.expr(proj).alias("p"))
    # Materialize the projections ONCE (dedup_near's barrier, same
    # measured pathology): four branches consume sig (query bands,
    # corpus bands, qe, ne) and each would re-run the 16 x d
    # hash-projection map. Signatures are ~1.3x the embedding bytes —
    # cheap to hold; lineage-cut trade documented at dedup_near.
    sig = sig.localCheckpoint(eager=False)
    bands = sig.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 7), j -> xxhash64("
                " cast(floor(p[cast(2*j AS int)] / 0.5) AS bigint),"
                " cast(floor(p[cast(2*j+1 AS int)] / 0.5) AS bigint)))"
            )
        ).alias("band", "bkey"),
    )
    qb = query_panel(bands, spark, sf_dir).select(
        F.col("vec_id").alias("query_id"), "band", "bkey"
    )
    # Probe budget: cap the corpus members considered per bucket at 256
    # (rank by vec_id — deterministic). Geometric buckets grow linearly
    # with the corpus at fixed quantization width, so an uncapped
    # bucket join is candidates ~ |q| x n — quadratic for a
    # proportional query set (the 100x fixture run timed out on exactly
    # that). A bounded per-bucket scan is the standard ANN probe budget
    # (efSearch/maxScan); members of a bucket are already mutual
    # near-candidates, so the top-5 answer survives the cap.
    cb = (
        bands.withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("band", "bkey").orderBy("vec_id")
            ),
        )
        .filter(F.col("crn") <= 256)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("band").alias("band_b"),
            F.col("bkey").alias("bkey_b"),
        )
    )
    cand = (
        qb.join(
            cb,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # qe is the PANEL's embeddings only (<= 64 rows at any corpus
    # size) — broadcasting sig unfiltered would ship the whole corpus
    # signature relation, the exact unbounded-reference-set class the
    # query-panel contract exists to prevent.
    qe = query_panel(sig, spark, sf_dir).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("ea")
    )
    ne = sig.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb")
    )
    dist = F.sqrt(
        F.expr(
            "aggregate(zip_with(ea, eb,"
            " (x, y) -> (cast(x AS double) - cast(y AS double))"
            "          * (cast(x AS double) - cast(y AS double))),"
            " cast(0 AS double), (a, x) -> a + x)"
        )
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", dist.alias("d"))
    )
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round("d", 4).alias("euclid_dist"),
            "rank",
        )
    )


@register(
    "dedup_segments",
    group="L",
    oracle="""
    WITH toks AS (SELECT row_number() OVER () AS rid, doc_id,
                         string_split(text, ' ') AS t FROM documents),
    pos AS (SELECT rid, doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
            FROM toks),
    segs AS (SELECT rid, doc_id, (i-1)//8 AS chunk,
                    string_agg(w, ' ' ORDER BY i) AS seg
             FROM pos GROUP BY rid, doc_id, (i-1)//8),
    bp AS (SELECT md5(seg) AS h FROM segs
           GROUP BY md5(seg) HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_seg,
           CAST(SUM(CASE WHEN h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           COALESCE(string_agg(CASE WHEN h IS NULL THEN seg END,
                               ' ' ORDER BY chunk), '') AS clean_text
    FROM segs LEFT JOIN bp ON md5(segs.seg) = bp.h
    GROUP BY rid, doc_id
    """,
)
def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment-level boilerplate removal — the
    CCNet/Dolma paragraph-dedup pass, on fixture text that has no
    newlines: documents are cut into consecutive 8-token segments (a
    deterministic stand-in for paragraphs), any segment whose hash
    occurs in >= 2 DISTINCT documents is corpus boilerplate (headers,
    footers, license blurbs at web scale), and each document is
    re-emitted with its boilerplate segments cut out, order preserved.

    The plan is the honest 100 TB shape for a corpus REWRITE (data
    motion is inherent — the output is the corpus): segmentation is a
    narrow transform + posexplode (no shuffle); the boilerplate vote
    groups by md5 digest, so the dedup decision shuffles 32-byte
    hashes, never text; the verdict joins back on the digest; and the
    single full-width shuffle is the final per-document reassembly
    (groupBy doc_id -> sort by segment index -> rejoin), which any
    rewriting pipeline pays exactly once. collect_list is
    order-nondeterministic, so the struct sort on the unique chunk
    index — not collection order — fixes determinism.

    Row contract under at-least-once delivery: each physical input
    row is cleaned INDEPENDENTLY (copies in, copies out — collapsing
    re-delivered copies is dedup_exact's job, and a doc's own second
    copy never votes its segments into boilerplate, since the vote is
    per DISTINCT doc_id). The per-row identity tag rides the existing
    shuffles; it adds none."""
    d = table(spark, sf_dir, "documents")
    # Materialize the token array BEFORE the segment lambda: an inline
    # split inside transform re-evaluates per element (O(tokens^2) per
    # doc); CollapseProject keeps the alias because it is referenced
    # more than once, so this projection is load-bearing.
    toks = d.select(
        "doc_id", F.monotonically_increasing_id().alias("rid"),
        F.split("text", " ").alias("t"),
    )
    segs = (
        toks.select(
            "rid",
            "doc_id",
            F.expr(
                "posexplode(transform("
                " sequence(0, cast(ceil(size(t) / 8.0) as int) - 1),"
                " i -> array_join(slice(t, i*8 + 1, 8), ' ')))"
            ).alias("chunk", "seg"),
        )
        .withColumn("h", F.md5("seg"))
    )
    bp = (
        segs.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h", F.lit(1).alias("is_bp"))
    )
    marked = segs.join(bp, "h", "left")
    kept_struct = F.when(
        F.col("is_bp").isNull(), F.struct(F.col("chunk"), F.col("seg"))
    )
    return (
        marked.groupBy("rid", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seg"),
            F.sum(F.when(F.col("is_bp").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["seg"]
                ),
                " ",
            ).alias("clean_text"),
        )
        .drop("rid")
    )


_RANGE_SQL = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % {_QSTRIDE_SQL} = 0),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS ea, c.embedding AS eb
      FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
    ),
    tagged AS (SELECT row_number() OVER () AS pid, * FROM pairs),
    un AS (SELECT pid, query_id, neighbor_id, unnest(ea) AS x, unnest(eb) AS y
           FROM tagged),
    dots AS (
      -- per PAIR ROW (pid): see _KNN_SQL
      SELECT query_id, neighbor_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
      FROM un GROUP BY pid, query_id, neighbor_id
    )
    SELECT query_id, neighbor_id
    FROM dots WHERE dot / (SQRT(na) * SQRT(nb)) >= 0.35
"""


@register("sim_range_search", group="L", oracle=_RANGE_SQL)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold (range) similarity search: ALL neighbors with cosine
    >= tau for each query — the other retrieval mode next to top-k
    (dedup wants "everything above 0.95", not "the best 5"). Same
    broadcast-query posture as sim_knn_topk: the corpus is scanned
    once with no shuffle of the big side, and because the predicate
    replaces the rank window, the plan is pure scan->filter — even
    cheaper than kNN (no sort at all). Output is id pairs only, so the
    hash is float-free; tau=0.35 sits >3e-3 from every pair's cosine
    at the checked scale, ~12 orders of magnitude beyond cross-engine
    summation-order ulp noise, so threshold membership is stable."""
    en = table(spark, sf_dir, "embeddings").withColumn("nrm", _norm("embedding"))
    q = query_panel(en, spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    c = en.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    ).transform(spread_partitions)  # no-op once the scan has >= cores partitions
    pairs = F.broadcast(q).join(c, F.col("neighbor_id") != F.col("query_id"))
    cos = F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return pairs.filter(cos >= 0.35).select("query_id", "neighbor_id")
