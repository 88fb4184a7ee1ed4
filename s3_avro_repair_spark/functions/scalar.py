"""F group — scalar function surface (string/regex/date/math/conditional/
cast/array/explode/map/JSON).

All JVM-side Catalyst expressions inside whole-stage codegen — zero
Python in these plans. Transcendental math (ln/pow/sqrt) is rounded on
both engine sides because libm implementations may differ by 1 ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import table


@register(
    "fn_string",
    group="F",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 5)            AS name5,
           upper(p_name)                   AS name_upper,
           lower(p_brand)                  AS brand_lower,
           trim(p_name)                    AS name_trim,
           length(p_name)                  AS name_len,
           replace(p_type, 'O', '0')       AS type_replaced,
           p_brand || '#' || p_type        AS brand_type,
           CASE WHEN p_name IS NULL THEN NULL
                ELSE split_part(p_name, ' ', 1) END AS first_word
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions over part names/brands/types."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_replaced"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@register(
    "fn_regexp",
    group="F",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1)        AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g')   AS name_novowel,
           CASE WHEN regexp_matches(p_type, '^(PROMO|ECONOMY)')
                THEN 1 ELSE 0 END                        AS is_promo_econ
    FROM part
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract / replace / match (patterns restricted to the
    POSIX-compatible subset so Java and RE2 semantics agree)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_novowel"),
        F.when(F.col("p_type").rlike(r"^(PROMO|ECONOMY)"), 1)
        .otherwise(0)
        .alias("is_promo_econ"),
    )


@register(
    "fn_date",
    group="F",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                 AS order_year,
           CAST(month(o_orderdate) AS INT)                AS order_month,
           CAST(day(o_orderdate) AS INT)                  AS order_day,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
                                                          AS month_start,
           date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE))           AS days_since_epoch0,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction, truncation, diff and arithmetic."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .cast("string")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch0"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
    )


@register(
    "fn_math",
    group="F",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 0)                          AS price_round,
           abs(-o_totalprice)                              AS price_abs,
           ceil(o_totalprice)                              AS price_ceil,
           floor(o_totalprice)                             AS price_floor,
           round(sqrt(o_totalprice), 6)                    AS price_sqrt,
           round(ln(o_totalprice), 6)                      AS price_ln,
           round(power(o_totalprice, 0.5), 6)              AS price_pow,
           CAST(o_orderkey % 7 AS BIGINT)                  AS key_mod
    FROM orders
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/power/mod."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 0).alias("price_round"),
        F.abs(-F.col("o_totalprice")).alias("price_abs"),
        # Spark ceil/floor(double) -> LONG, DuckDB -> DOUBLE; align on DOUBLE.
        F.ceil("o_totalprice").cast("double").alias("price_ceil"),
        F.floor("o_totalprice").cast("double").alias("price_floor"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow("o_totalprice", F.lit(0.5)), 6).alias("price_pow"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_conditional",
    group="F",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                             AS price_band,
           coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
           greatest(o_totalprice, 150000.0)                AS at_least,
           least(o_totalprice, 150000.0)                   AS at_most
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("at_least"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("at_most"),
    )


@register(
    "fn_cast",
    group="F",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                     AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_decimal_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)      AS order_date,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)      AS date_str,
           CAST(CAST(trunc(o_totalprice) AS BIGINT) AS DOUBLE) AS price_trunc
           -- NB: DuckDB CAST(double->int) rounds, Spark truncates;
           -- explicit trunc() aligns the semantics.
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice: int->string, double->decimal->string,
    timestamp->date->string, double->bigint->double."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias(
            "price_decimal_str"
        ),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.col("o_totalprice").cast("bigint").cast("double").alias("price_trunc"),
    )


@register(
    "fn_array",
    group="F",
    oracle="""
    SELECT vec_id,
           len(embedding)                                  AS dim,
           embedding[1]                                    AS first_elem,
           round((SELECT SUM(CAST(e AS DOUBLE))
                  FROM UNNEST(embedding) AS t(e)), 4) + 0  AS elem_sum
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size / element access / HOF aggregate over embeddings."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        (
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
                4,
            )
            + F.lit(0)  # signed-zero normalization (ts_zscore's rule):
            # a 1e-8-scale vector's sum rounds to +/-0.0 (magnitude sweep)
        ).alias("elem_sum"),
    )


@register(
    "fn_explode",
    group="F",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest: split document text into words, explode, count."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_map",
    group="F",
    oracle="""
    SELECT doc_id, lang AS lang_value, source AS source_value, 2 AS map_size
    FROM documents
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column and query it back (map_size / element_at);
    oracle is the identity since map round-trips are value-preserving."""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_value"),
        F.element_at(m, "source").alias("source_value"),
        F.size(m).alias("map_size"),
    )


@register(
    "fn_json",
    group="F",
    oracle="""
    SELECT event_id,
           -- json_valid guard: DuckDB json_extract ERRORS on malformed
           -- input ('' included) where Spark get_json_object is NULL —
           -- the permissive per-row behavior is the 100 TB contract
           CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
                ELSE TRY_CAST(json_extract_string(props, '$.k') AS INT)
           END AS k_value
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@register(
    "fn_hash",
    group="F",
    oracle="""
    SELECT p_partkey, md5(p_name) AS name_md5, sha256(p_brand) AS brand_sha256,
           length(md5(p_type)) AS digest_len
    FROM part
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest functions (md5 / sha2-256) — the
    fingerprinting primitives the dedup ops build on (text_fingerprint,
    dedup_exact). JVM-side, identical hex output in both engines."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_brand", 256).alias("brand_sha256"),
        F.length(F.md5("p_type")).alias("digest_len"),
    )


@register(
    "fn_bitwise",
    group="F",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 1 AS set_low,
           xor(l_orderkey, l_partkey) AS xored,
           -- shift the MASKED operand: DuckDB refuses to left-shift a
           -- negative number while the JVM wraps (negative-keys sweep)
           (l_orderkey & 255) << 2 AS shifted
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift — the bit-twiddling layer under
    dedup_simhash's banding and any hand-rolled bucketing. The shift
    operand is masked non-negative first: DuckDB raises on
    left-shifting a negative number while the JVM wraps two's
    complement — masking is the only shift contract that is exact on
    both engines for any key sign."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(1)).alias("set_low"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("xored"),
        F.expr("shiftleft(l_orderkey & 255, 2)").alias("shifted"),
    )


@register(
    "fn_binary",
    group="F",
    oracle="""
    SELECT doc_id,
           base64(encode(lang)) AS lang_b64,
           hex(encode(substr(text, 1, 8))) AS head_hex,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding scalar functions — base64, hex, byte length —
    the plumbing under every multimodal column (mm_decode stores binary
    payloads, checkpoints ship base64). String->binary->text round
    trips must agree byte-for-byte across engines, including UTF-8
    multi-byte boundaries (octet_length != char length for non-ASCII).
    All JVM expressions inside whole-stage codegen."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.hex(F.substring("text", 1, 8).cast("binary")).alias("head_hex"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


@register(
    "fn_struct",
    group="F",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS s_status, o_totalprice AS s_price
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct pack/unpack round trip: nested types are FREE in Spark —
    Tungsten stores struct fields columnar, ``s.field`` access is a
    projection, and Catalyst collapses create-then-access to a no-op
    (the optimized plan below reads the two leaf columns directly).
    This is why typed metadata structs on multimodal columns
    (multimodal_join's meta struct) cost nothing at scan time."""
    o = table(spark, sf_dir, "orders")
    packed = o.withColumn(
        "s",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        ),
    )
    return packed.select(
        "o_orderkey",
        F.col("s.status").alias("s_status"),
        F.col("s.price").alias("s_price"),
    )


@register(
    "fn_hof",
    group="F",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0.1)) AS n_pos,
           len(list_filter(embedding, x -> abs(x) > 0.5)) > 0 AS any_big,
           len(list_filter(embedding, x -> NOT abs(x) < 1.0)) = 0 AS all_small
    FROM embeddings
    """,
)
def fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions — filter / exists / forall — the
    lambda surface for array columns (embeddings, token lists) that
    keeps per-element logic in the JVM instead of a Python UDF.
    Complements fn_array's aggregate/zip_with. DuckDB expresses
    exists/forall through list_filter cardinality; element comparisons
    promote float32 to double identically in both engines, so the
    boolean outputs hash-match exactly."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > F.lit(0.1))).cast("long").alias("n_pos"),
        F.exists("embedding", lambda x: F.abs(x) > F.lit(0.5)).alias("any_big"),
        F.forall("embedding", lambda x: F.abs(x) < F.lit(1.0)).alias("all_small"),
    )


@register(
    "fn_variant",
    group="F",
    oracle="""
    SELECT event_id,
           CASE WHEN event_id % 9 = 0 OR props IS NULL
                  OR NOT json_valid(props) THEN NULL
                ELSE CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
           event_id % 9 <> 0 AND props IS NOT NULL
             AND json_valid(props) AS parse_ok
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured payloads: every 9th
    props string is deterministically truncated (invalid JSON), parsed
    with ``try_parse_json`` (corrupt → NULL, never a failed job — the
    per-row analog of the E group's per-file fault isolation), and the
    field extracted through the binary variant encoding with
    ``variant_get``. Unlike fn_json's string re-parsing per extraction,
    VARIANT decodes the JSON once into a traversable binary — the
    difference between O(fields × parse) and O(parse) on a 100 TB
    semi-structured scan. The oracle reads the same field with plain
    JSON extraction, so the variant path must agree value-for-value.

    The damage is UNCONDITIONALLY invalidating: prefixing ``{{`` can
    never yield valid JSON (after ``{`` only ``"`` or ``}`` may
    follow), for ANY props payload. Truncation — the previous kernel —
    is not: a payload like ``55`` truncates to still-valid ``5`` and
    would diverge from the oracle's hard-coded parse_ok=false."""
    e = table(spark, sf_dir, "events")
    damaged = F.when(
        F.col("event_id") % 9 == 0,
        F.concat(F.lit("{{"), F.col("props")),
    ).otherwise(F.col("props"))
    v = F.try_parse_json(damaged)
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        v.isNotNull().alias("parse_ok"),
    )


@register(
    "fn_try_arithmetic",
    group="F",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25 THEN NULL
                ELSE CAST(FLOOR(l_extendedprice * 100 / (l_quantity - 25))
                          AS BIGINT) END
             AS per_excess_cents,
           CASE WHEN l_quantity >= 40 THEN 40 ELSE NULL END AS elem40
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe (ANSI "try") expression surface: ``try_divide``
    yields NULL on division by zero and ``try_element_at`` yields NULL
    past the end of an array — per-ROW fault isolation for arithmetic,
    the scalar sibling of try_parse_json (fn_variant) and the E
    group's per-file isolation. Under ANSI mode the non-try variants
    would kill the job on the first zero denominator in 100 TB; the
    try family turns data quality issues into NULLs the pipeline can
    count. The oracle encodes the same semantics as explicit CASE
    guards.

    Output as floored integer cents, not ROUND(x, 4): money/small-int
    division lands on exact .xxxx5 ties constantly, where Spark
    (BigDecimal HALF_UP on the true double expansion) and DuckDB
    (scale-multiply in doubles) legitimately disagree; FLOOR on
    bit-identical doubles is deterministic on both engines."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(
            F.try_divide(F.col("l_extendedprice") * 100, F.col("l_quantity") - 25)
        )
        .cast("bigint")
        .alias("per_excess_cents"),
        F.try_element_at(
            F.sequence(F.lit(1), F.col("l_quantity").cast("int")), F.lit(40)
        )
        .cast("int")
        .alias("elem40"),
    )
