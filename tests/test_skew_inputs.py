"""Skew sweep: hot-key generations under every op.

At 100 TB skew is the default, not the anomaly: one tenant holds half
the events, one supplier ships 40% of the lines, one (lang, source)
pair dominates the corpus and its documents share a templated header.
The r3 verdict flagged exactly this shape against the near-dup
candidate generators; the df-cap and SimHash-band fixes carry
per-op bound tests (test_llm_ops.py) — this sweep is the GENERAL
gate: a generation where every table has a planted hot key runs the
FULL oracle surface cell-exact.

What the arm actually exercises, beyond "does not crash":

- hot join keys through every join/agg/subquery (AQE skew handling
  and the salted join must not change RESULTS, only placement);
- a giant window partition (user_id 0 holds half of events) through
  the whole ORDER BY ts window family — tie-free total ordering has
  to hold when one partition is 25x its neighbors;
- a dominant (lang, source) document block WITH a shared 26-char
  boilerplate prefix — the dedup_levenshtein prefix block, the
  dedup_ngram_jaccard stop-shingle cap, stratified sampling weights,
  and sequence packing shards all see their adversarial case at
  once;
- a dominant embedding label through the label-blocked similarity
  family.

Parity (not timing) is the assertion: both engines read the same
parquet, so any diff is order- or strategy-dependence that a skewed
production shard would surface as wrong results.
"""

from __future__ import annotations

import duckdb
import pytest

# Full-surface sweep arm: deselected by default (pyproject addopts)
# so a plain `pytest tests/` fits an attestation budget; run with
# -m 'slow or not slow' for the whole suite.
pytestmark = pytest.mark.slow

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare

_OPS = load_all()

# Deterministic hot-key remaps. Target keys exist in every SF fixture
# (key spaces start at 0; (en, src13) is the clean fixture's largest
# document block), so FK joins stay well-formed.
_REMAP = {
    "documents": """
        SELECT doc_id,
               CASE WHEN doc_id % 10 < 7
                    THEN 'common header boilerplate: ' || text
                    ELSE text END AS text,
               CASE WHEN doc_id % 10 < 7 THEN 'en' ELSE lang END AS lang,
               CASE WHEN doc_id % 10 < 7 THEN 'src13' ELSE source END
                 AS source,
               CASE WHEN doc_id % 10 < 7 THEN n_chars + 27 ELSE n_chars END
                 AS n_chars
        FROM read_parquet('{src}/documents.parquet')
    """,
    "lineitem": """
        SELECT * REPLACE(
          CASE WHEN l_orderkey % 10 < 4 THEN 0 ELSE l_suppkey END
            AS l_suppkey,
          CASE WHEN l_orderkey % 10 BETWEEN 4 AND 5 THEN 0 ELSE l_partkey
            END AS l_partkey)
        FROM read_parquet('{src}/lineitem.parquet')
    """,
    "orders": """
        SELECT * REPLACE(
          CASE WHEN o_orderkey % 10 < 4 THEN 0 ELSE o_custkey END
            AS o_custkey)
        FROM read_parquet('{src}/orders.parquet')
    """,
    "events": """
        SELECT * REPLACE(
          CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS user_id)
        FROM read_parquet('{src}/events.parquet')
    """,
    "embeddings": """
        SELECT * REPLACE(
          CASE WHEN vec_id % 10 < 7 THEN 0 ELSE label END AS label)
        FROM read_parquet('{src}/embeddings.parquet')
    """,
}


@pytest.fixture(scope="module")
def skew_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_skew")
    con = duckdb.connect()
    for t in TABLES:
        sel = _REMAP.get(t, f"SELECT * FROM read_parquet('{{src}}/{t}.parquet')")
        con.execute(
            f"COPY ({sel.format(src=sf_dir)})"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def skew_duck(skew_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{skew_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_skew_parity(name, spark, skew_sf_dir, skew_duck):
    op = _OPS[name]
    sdf = op.fn(spark, skew_sf_dir).toPandas()
    ddf = skew_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
