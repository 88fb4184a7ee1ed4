"""Schema-drift sweep: cross-generation dtype drift under every op.

At 100 TB a table is never one generation: an upstream migration
widens a key INT -> BIGINT (or an old extract narrowed it), and the
engine quietly inserts casts into every comparison. Two wrong-results
classes have already come from exactly this:

- a CAST inside a correlated LATERAL predicate makes Spark 4.1
  silently drop the correlation (ORDER BY eliminated, LIMIT applied
  globally) — join_lateral now casts below the correlated filter;
- mapInArrow does NOT coerce the kernel's output batches to the
  declared schema (the pandas boundary does) — an int32 generation
  crashed Spark's getLong reader until the kernel cast to what it
  declared (udtf_map_in_arrow).

The standing gate: the NARROWED generation (every BIGINT column cast
to INTEGER — values fit at fixture scale; this is the direction that
puts an implicit cast on the Spark side of every key comparison and
through every Python/Arrow boundary) runs the FULL oracle surface
cell-exact. The widened direction (INT -> BIGINT) is covered for the
join/subquery families, where correlation and co-location decisions
ride on key types.
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


def _drifted_dir(tmp_path_factory, sf_dir, from_type: str, to_type: str) -> str:
    tmp = tmp_path_factory.mktemp(f"sf_drift_{to_type.lower()}")
    con = duckdb.connect()
    for t in TABLES:
        rows = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchall()
        sel = ", ".join(
            f"CAST({c} AS {to_type}) AS {c}" if ty == from_type else c
            for c, ty, *_ in rows
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{sf_dir}/{t}.parquet'))"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def narrow_sf_dir(tmp_path_factory, sf_dir) -> str:
    return _drifted_dir(tmp_path_factory, sf_dir, "BIGINT", "INTEGER")


@pytest.fixture(scope="module")
def wide_sf_dir(tmp_path_factory, sf_dir) -> str:
    return _drifted_dir(tmp_path_factory, sf_dir, "INTEGER", "BIGINT")


def _duck(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def narrow_duck(narrow_sf_dir):
    con = _duck(narrow_sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def wide_duck(wide_sf_dir):
    con = _duck(wide_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_narrowed_generation_parity(name, spark, narrow_sf_dir, narrow_duck):
    op = _OPS[name]
    sdf = op.fn(spark, narrow_sf_dir).toPandas()
    ddf = narrow_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


_WIDE_OPS = [
    n
    for n, op in _OPS.items()
    if op.oracle is not None
    and (n.startswith(("join_", "filter_", "scalar_subquery", "subquery_")))
]


@pytest.mark.parametrize("name", _WIDE_OPS)
def test_widened_generation_parity(name, spark, wide_sf_dir, wide_duck):
    op = _OPS[name]
    sdf = op.fn(spark, wide_sf_dir).toPandas()
    ddf = wide_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
