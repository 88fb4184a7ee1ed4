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


def test_every_op_survives_null_rows(spark, null_sf_dir):
    failures = []
    for name, op in _OPS.items():
        try:
            op.fn(spark, null_sf_dir).count()
        except Exception as exc:
            failures.append((name, str(exc).splitlines()[0][:120]))
    assert not failures, failures
