"""Magnitude sweep: offset and scaled values under every op.

Sensor feeds run at 1e6 offsets, financial backfills mix refunds
(negatives) with charges, embedding exports arrive unnormalized at
wild scales. Two failure classes only live at magnitude:

- **Catastrophic cancellation**: every events row gets `value + 1e6`,
  so a variance computed as E[x²]−E[x]² subtracts two ~1e12 numbers
  to recover a ~1e0 spread — 4-decimal parity survives ONLY if both
  engines use shifted/Welford-style one-pass moments. This hits
  every stddev/zscore/regression/incremental-merge path at once.

- **Range headroom**: a lineitem slice gets 1000× prices (decimal
  aggregates must have digits to spare, not just fit the median),
  plus negated prices on another slice (refund rows — sign must flow
  through revenue arithmetic, not be assumed away); an embeddings
  slice gets 1e8× / 1e-8× vectors (cosine is scale-invariant; dots
  near double over/underflow must not round through zero).

Full oracle surface, cell-exact, same parquet on both engines.
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

_REMAP = {
    "events": """
        SELECT * REPLACE (value + 1000000.0 AS value)
        FROM read_parquet('{src}')
    """,
    "lineitem": """
        SELECT * REPLACE(
          CASE WHEN l_orderkey % 13 = 3 THEN l_extendedprice * 1000.0
               WHEN l_orderkey % 13 = 7 THEN -l_extendedprice
               ELSE l_extendedprice END AS l_extendedprice)
        FROM read_parquet('{src}')
    """,
    "embeddings": """
        SELECT * REPLACE(
          CASE WHEN vec_id % 11 = 3
                 THEN list_transform(embedding, x -> x * 1e8)
               WHEN vec_id % 11 = 7
                 THEN list_transform(embedding, x -> x * 1e-8)
               ELSE embedding END AS embedding)
        FROM read_parquet('{src}')
    """,
}


@pytest.fixture(scope="module")
def mag_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_magnitude")
    con = duckdb.connect()
    for t in TABLES:
        sel = _REMAP.get(t, "SELECT * FROM read_parquet('{src}')")
        con.execute(
            f"COPY ({sel.format(src=table_source(sf_dir, t))})"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def mag_duck(mag_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_source(mag_sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_magnitude_parity(name, spark, mag_sf_dir, mag_duck):
    op = _OPS[name]
    sdf = op.fn(spark, mag_sf_dir).toPandas()
    ddf = mag_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
