"""Degenerate-input sweep: every registered op must execute over a
ZERO-ROW rendition of every table. At 100 TB, empty partitions are
routine — a date partition with no data yet, a filter that eliminates
a shard, a tenant with no documents — and an operator that crashes on
them takes the whole job down. Round 4's sweep found five real
classes: 1/n division on an empty graph, ML .fit refusing empty
datasets, parquet schema inference over a data-file-less layout,
corruption injectors indexing into a header-only OCF, and a partition
layout directory that was only created when years existed.
"""

from __future__ import annotations

import duckdb
import pytest

# Full-surface sweep arm: deselected by default (pyproject addopts)
# so a plain `pytest tests/` fits an attestation budget; run with
# -m 'slow or not slow' for the whole suite.
pytestmark = pytest.mark.slow

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES

_OPS = load_all()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') LIMIT 0)"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(tmp)


def test_every_op_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, op in _OPS.items():
        try:
            op.fn(spark, empty_sf_dir).count()
        except Exception as exc:  # collect all, report once
            failures.append((name, str(exc).splitlines()[0][:120]))
    assert not failures, failures


_KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory, sf_dir) -> str:
    """Each table plus three rows that are NULL in every non-key
    column (fresh key values) — the dirty-data shape real ingests
    meet. Round 4's sweep crashed 27 ops on it: Python kernels
    calling bytes()/split() on None, ML .fit on null vectors, and
    the non-nullable Avro write path; all now dead-letter or
    null-propagate per their oracles."""
    tmp = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    for t, key in _KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            ).fetchall()
        ]
        maxk = con.execute(
            f"SELECT COALESCE(MAX({key}), 0)"
            f" FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchone()[0]
        sel = ", ".join(
            f"CAST({maxk} + 1 + s AS BIGINT) AS {key}"
            if c == key
            else f"NULL AS {c}"
            for c in cols
        )
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            f" UNION ALL BY NAME SELECT {sel} FROM generate_series(0, 2) g(s))"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


# Every oracle-checked op is held to full ORACLE PARITY on the
# null-row fixture (test below); parity implies crash-survival, so
# the survival sweep only needs to cover the rows-only ops.
def test_rows_only_ops_survive_null_rows(spark, null_sf_dir):
    failures = []
    for name, op in _OPS.items():
        if op.oracle is not None:
            continue
        try:
            op.fn(spark, null_sf_dir).count()
        except Exception as exc:
            failures.append((name, str(exc).splitlines()[0][:120]))
    assert not failures, failures


# FULL-SURFACE null-row parity: op vs oracle on the dirty fixture,
# cell-exact. Started as a window-family gate (the distributed
# rewrites are where single-window semantics silently diverge); the
# full-surface probe then found ten more classes, all fixed:
# (1) prefix-sum rewrites DROPPED null-key rows at their
# broadcast-offset join (null != null) where a window keeps NULL as
# its own partition group — now null-safe (<=>), same bug again in
# agg_mad's median broadcast-back; (2) the range-frame halo copy
# double-counted the NULL peer group; (3) all-null frames: ts_ewma
# denominator 0, ts_rolling_median element_at 0 index; (4) NTILE
# engine-default null order differs (pinned in oracle); (5) row
# UDFs see raw None — no three-valued logic — and crash or need an
# explicit branch (udf_python, udf_python_arrow); (6) pandas dtype
# traps: a null in an int batch column flips it to float64 and
# astype(str) prints '1.0' (udtf_map_in_pandas), NaT.astype(int64)
# is Long.MinValue and poisons min/max (stream_stateful_agg);
# (7) Spark's window()/session_window() DROP null event-times where
# a GROUP BY keeps the NULL group — oracles filter ts IS NOT NULL;
# (8) DuckDB builtins that swallow NULL where Spark propagates:
# concat() skips nulls ('||' doesn't), LEAST() skips nulls,
# split_part(NULL) returns ''; (9) aggregates of an all-null group:
# Spark collect_set gives [], DuckDB list() gives NULL; (10) a CAST
# in a correlated lateral predicate (dtype drift between tables)
# makes Spark 4.1 silently decorrelate WRONG — ORDER BY eliminated,
# LIMIT applied globally (join_lateral pre-casts below the filter).
_NULL_PARITY_SKIP = frozenset()


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{null_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_null_row_parity(name, spark, null_sf_dir, null_duck):
    from tools.verify_local import compare

    if name in _NULL_PARITY_SKIP:
        pytest.skip("enumerated null-parity exception")
    op = _OPS[name]
    sdf = op.fn(spark, null_sf_dir).toPandas()
    ddf = null_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.fixture(scope="module")
def nan_sf_dir(tmp_path_factory, sf_dir) -> str:
    """NaN and ±Inf injected into the double columns (events.value,
    orders.o_totalprice) and one all-NaN embedding vector. Found in
    round 4: the decimal fixture rendition has no encoding for ±Inf
    (now dead-lettered at the fleet gate), and KMeans.fit crashes on
    non-finite vectors (now filtered before the quantizer)."""
    tmp = tmp_path_factory.mktemp("sf_nan")
    con = duckdb.connect()
    for t in TABLES:
        if t not in ("events", "orders", "embeddings"):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.execute(f"""
      COPY (
        SELECT * FROM read_parquet('{sf_dir}/events.parquet')
        UNION ALL BY NAME
        SELECT CAST(9000000 + s AS BIGINT) AS event_id,
               TIMESTAMP '2024-06-01 12:00:00' + INTERVAL (s) SECOND AS ts,
               CAST(1 AS BIGINT) AS user_id, 'click' AS event_type,
               CASE s WHEN 0 THEN CAST('nan' AS DOUBLE)
                      WHEN 1 THEN CAST('inf' AS DOUBLE)
                      ELSE CAST('-inf' AS DOUBLE) END AS value,
               '{{}}' AS props
        FROM generate_series(0, 2) g(s)
      ) TO '{tmp}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT * FROM read_parquet('{sf_dir}/orders.parquet')
        UNION ALL BY NAME
        SELECT CAST(9000000 + s AS BIGINT) AS o_orderkey,
               CAST(1 AS BIGINT) AS o_custkey, 'O' AS o_orderstatus,
               CASE s WHEN 0 THEN CAST('nan' AS DOUBLE)
                      ELSE CAST('inf' AS DOUBLE) END AS o_totalprice,
               DATE '1996-01-01' AS o_orderdate,
               '1-URGENT' AS o_orderpriority, 'c' AS o_clerk,
               0 AS o_shippriority, 'x' AS o_comment
        FROM generate_series(0, 1) g(s)
      ) TO '{tmp}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')
        UNION ALL BY NAME
        (SELECT CAST(9000000 AS BIGINT) AS vec_id,
                list_transform(embedding, x -> CAST('nan' AS FLOAT))
                  AS embedding,
                label
         FROM read_parquet('{sf_dir}/embeddings.parquet') LIMIT 1)
      ) TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(tmp)


def test_every_op_survives_nonfinite_doubles(spark, nan_sf_dir):
    failures = []
    for name, op in _OPS.items():
        try:
            op.fn(spark, nan_sf_dir).count()
        except Exception as exc:
            failures.append((name, str(exc).splitlines()[0][:120]))
    assert not failures, failures


def test_ivf_degenerates_to_exact_below_k(spark, tmp_path_factory, sf_dir):
    """KMeans.fit crashes outright on fewer points than k (Spark 4.1
    ArrayIndexOutOfBounds); below k the op must fall back to one cell
    (exact search). 3 vectors -> every query still gets neighbors."""
    import duckdb as _d

    tmp = tmp_path_factory.mktemp("tiny_emb")
    con = _d.connect()
    for t in TABLES:
        n = "LIMIT 3" if t == "embeddings" else ""
        where = "WHERE vec_id IN (0, 1, 2)" if t == "embeddings" else ""
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            f" {where} {n}) TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    out = _OPS["sim_ann_ivf"].fn(spark, str(tmp)).toPandas()
    # vec_id 0 is the only query (% 100 == 0); its 2 neighbors rank 1-2
    assert set(out.query_id) == {0}
    assert set(out.neighbor_id) == {1, 2}
