"""Column-evolution sweep: reordered and added columns under every op.

The dtype-drift arm (test_schema_drift.py) covers type migrations;
this arm covers the other two shapes every long-lived table goes
through:

- **Reordered columns**: a rewriting job (or a different writer
  library) emits the same columns in a different physical order.
  Parquet is name-addressed, but anything positional — an Arrow
  kernel indexing batch columns by ordinal, a schema zip, a
  first-column assumption — breaks silently.

- **Added columns**: upstream widens the table (a new telemetry
  field, a backfill marker). Consumers that project explicit columns
  must be bit-unaffected; a stray ``SELECT *`` in an op or oracle, or
  a kernel iterating "all columns", surfaces here as a schema or
  value diff.

The generation reverses every table's column order AND appends one
``_mig_note VARCHAR`` audit column; the full oracle surface must stay
cell-exact (both engines read the same files, so any diff is a
positional or star-expansion dependence in OUR operators/oracles).
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


@pytest.fixture(scope="module")
def evolved_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_colevo")
    con = duckdb.connect()
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM"
                f" read_parquet('{table_source(sf_dir, t)}')"
            ).fetchall()
        ]
        sel = ", ".join(reversed(cols)) + ", 'gen2' AS _mig_note"
        con.execute(
            f"COPY (SELECT {sel} FROM"
            f" read_parquet('{table_source(sf_dir, t)}'))"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def evolved_duck(evolved_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_source(evolved_sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_column_evolution_parity(name, spark, evolved_sf_dir, evolved_duck):
    op = _OPS[name]
    sdf = op.fn(spark, evolved_sf_dir).toPandas()
    ddf = evolved_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
