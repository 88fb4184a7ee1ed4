"""CSV-hostile-content sweep: fields that fight the format.

RFC 4180 exists because real values contain the delimiter, the quote,
and the record separator. A customer name with an embedded comma,
double-quote, newline, or CRLF is routine data — and the CSV path is
the only rendition where a VALUE can corrupt the FRAMING: an unquoted
comma shifts every following column, an embedded newline splits one
record into two unless the reader parses multi-line records.

The generation appends customer rows whose names hold a comma, a
quote, a quote+comma combination, an embedded LF, a CRLF, a leading/
trailing-space value, and a non-ASCII name — then the full oracle
surface runs cell-exact. The interesting op is scan_csv (its fixture
rendition writes these rows through pandas' RFC 4180 quoting and
reads them back through Spark's csv parser); the rest of the surface
proves hostile content in ONE dimension table doesn't ripple
anywhere else.
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

# (suffix id, name) — appended under fresh c_custkey values.
_HOSTILE_NAMES = [
    (9300, "Comma, Industries"),
    (9301, 'Quote "Heavy" LLC'),
    (9302, 'Both, "of" them'),
    (9303, "Line\nBreak Corp"),
    (9304, "CRLF\r\nCarriage Co"),
    (9305, "  padded name  "),
    (9306, "Ünïcødé & Søns"),
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_csvhostile")
    con = duckdb.connect()
    for t in TABLES:
        if t == "customer":
            rows = " UNION ALL BY NAME ".join(
                f"(SELECT CAST({i} AS BIGINT) AS c_custkey, "
                f"{name!r} AS c_name, CAST(0 AS INTEGER) AS c_nationkey, "
                f"7777.77 AS c_acctbal, 'BUILDING' AS c_mktsegment)"
                for i, name in _HOSTILE_NAMES
            )
            con.execute(
                f"COPY (SELECT * FROM"
                f" read_parquet('{table_source(sf_dir, t)}')"
                f" UNION ALL BY NAME {rows})"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM"
                f" read_parquet('{table_source(sf_dir, t)}'))"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_source(hostile_sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_csv_hostile_parity(name, spark, hostile_sf_dir, hostile_duck):
    op = _OPS[name]
    sdf = op.fn(spark, hostile_sf_dir).toPandas()
    ddf = hostile_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
