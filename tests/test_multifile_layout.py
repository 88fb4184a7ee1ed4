"""Multi-file-layout sweep: results must not depend on file layout.

At 100 TB a table is never one parquet file — it is thousands of part
files with arbitrary row ordering across them and small row groups
from incremental writers. Any operator whose RESULT depends on the
physical layout (an implicit reliance on scan order, a first-file
schema assumption, a per-partition computation that leaks partition
boundaries into values) is wrong at scale even if every small-file
test passes.

The generation rewrites every table as a DIRECTORY of 5 part files,
rows dealt round-robin (so any ordering the single file had is
scrambled across parts) with 512-row row groups (so row-group-level
code paths see many groups, not one). Spark reads a directory
natively; the DuckDB oracles glob it (`tools/verify_local.table_source`
— the harness, the stream microbatch builder, and the pyarrow readers
are all layout-agnostic).

The full oracle surface must stay cell-exact except the ONE op whose
output is the layout by design:

- ``scan_with_filename`` rolls counts up BY SOURCE FILE — with five
  part files its (file, n) rows are legitimately different from the
  single-file oracle. Its layout-dependence is the point of the op
  (per-object provenance, the reference's listing analog), so the
  sweep asserts its total instead of cell parity.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# Full-surface sweep arm: deselected by default (pyproject addopts)
# so a plain `pytest tests/` fits an attestation budget; run with
# -m 'slow or not slow' for the whole suite.
pytestmark = pytest.mark.slow

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare, table_source

_OPS = load_all()

_N_PARTS = 5

# Output is the file layout by design: asserted separately below.
_LAYOUT_OUTPUT_OPS = {"scan_with_filename"}


@pytest.fixture(scope="module")
def multi_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_multifile")
    con = duckdb.connect()
    for t in TABLES:
        d = os.path.join(tmp, f"{t}.parquet")
        os.makedirs(d)
        for k in range(_N_PARTS):
            con.execute(
                f"""COPY (
                  SELECT * EXCLUDE (_rn) FROM (
                    SELECT *, row_number() OVER () AS _rn
                    FROM read_parquet('{table_source(sf_dir, t)}'))
                  WHERE _rn % {_N_PARTS} = {k}
                ) TO '{d}/part-{k}.parquet'
                  (FORMAT PARQUET, ROW_GROUP_SIZE 512)"""
            )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def multi_duck(multi_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{table_source(multi_sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        n
        for n, op in _OPS.items()
        if op.oracle is not None and n not in _LAYOUT_OUTPUT_OPS
    ],
)
def test_multifile_parity(name, spark, multi_sf_dir, multi_duck):
    op = _OPS[name]
    sdf = op.fn(spark, multi_sf_dir).toPandas()
    ddf = multi_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_scan_with_filename_multifile(spark, multi_sf_dir, multi_duck):
    """Layout-output op: five part files -> five provenance rows whose
    counts sum to the table total (each file attributed exactly)."""
    sdf = _OPS["scan_with_filename"].fn(spark, multi_sf_dir).toPandas()
    assert len(sdf) == _N_PARTS
    assert sorted(sdf["file"]) == [f"part-{k}.parquet" for k in range(_N_PARTS)]
    total = multi_duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert int(sdf["n"].sum()) == total
