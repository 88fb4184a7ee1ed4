"""Duplicate-ingest sweep: the same documents rows landing TWICE under
the same doc_id — the re-crawl / at-least-once-delivery shape every
100 TB corpus meets. The text-family ops must stay ORACLE-EXACT on it:
any cross-engine divergence here means an op's result depends on a
tie-break between identical rows (window order, first/collect without
a total order) — latent nondeterminism that a retry or a partition
re-split would surface at scale even on clean data.
"""

from __future__ import annotations

import duckdb
import pytest

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare

from test_unicode_inputs import _TEXT_PARITY_OPS

_OPS = load_all()


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_dupingest")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    # Re-deliver 7 existing rows byte-identically (doc_id included).
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        f" UNION ALL"
        f" SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        f" WHERE doc_id % 71 = 3)"
        f" TO '{tmp}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def dup_duck(dup_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{dup_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _TEXT_PARITY_OPS)
def test_text_op_dup_ingest_parity(name, spark, dup_sf_dir, dup_duck):
    op = _OPS[name]
    sdf = op.fn(spark, dup_sf_dir).toPandas()
    ddf = dup_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
