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
