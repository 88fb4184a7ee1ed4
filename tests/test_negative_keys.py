"""Negative-keys sweep: every id renumbered below zero.

Key spaces go negative in real systems — signed-hash ids, migration
renumbering, reserved ranges. Sign is where integer arithmetic gets
engine-specific: `%` follows the dividend's sign in both engines but
not in all SQL dialects, CAST truncates toward zero while floor()
goes to -infinity (the calendar arm's ms find, now on the KEY axis),
and any op that buckets, bands, samples, or salts on `key % N` or
`key / N` silently changes behavior on negative ids.

The generation negates EVERY key column consistently (primary and
foreign in lockstep, so joins still connect) across all ten tables;
id-distance bands (|a - b|) and modulo-derived fixtures flip sign but
stay deterministic. Full oracle surface, cell-exact: both engines
read the same parquet, so any diff is a sign-dependence inside an
operator or oracle.
"""

from __future__ import annotations

import duckdb
import pytest

# Full-surface sweep arm: deselected by default (pyproject addopts)
# so a plain `pytest tests/` fits an attestation budget; run with
# -m 'slow or not slow' for the whole suite.
pytestmark = pytest.mark.slow

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare, table_source

_OPS = load_all()

# Every id column per table, primary and foreign (negated together).
_ID_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


@pytest.fixture(scope="module")
def neg_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_negkeys")
    con = duckdb.connect()
    for t in TABLES:
        reps = ", ".join(f"-{c} AS {c}" for c in _ID_COLS[t])
        con.execute(
            f"COPY (SELECT * REPLACE({reps}) FROM"
            f" read_parquet('{table_source(sf_dir, t)}'))"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def neg_duck(neg_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_source(neg_sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_negative_key_parity(name, spark, neg_sf_dir, neg_duck):
    op = _OPS[name]
    sdf = op.fn(spark, neg_sf_dir).toPandas()
    ddf = neg_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
