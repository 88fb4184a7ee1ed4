"""Calendar-edge sweep: adversarial timestamps under every op.

At 100 TB the timestamp column holds every pathology the calendar can
produce: pre-epoch archive data, exact-midnight bulk loads (tie
storms), leap days, end-of-year rollovers one microsecond before the
boundary, and `.999999` fractional-second edges from upstream
truncation. Date arithmetic is a classic cross-engine divergence
mine — integer division on epoch seconds truncates toward zero for
CAST but floors for `floor()`, and the two only disagree on
PRE-EPOCH (negative) timestamps, which no in-range fixture can
expose.

The generation remaps every timestamp column onto those edges,
deterministically by key:

- ``orders.o_orderdate`` / ``lineitem.l_shipdate``: leap day
  (1996-02-29 / 2000-02-29, in-range so date-window predicates still
  select them), 23:59:59.999999 of Dec 31 (year-boundary minus one
  microsecond), and calendar month-end.
- ``events.ts``: pre-epoch (1964 — negative epoch micros through
  every window/downsample/session bucket computation), exact
  midnight (hundreds of equal-timestamp ties through every ORDER BY
  ts window — the key-collision sweep's total-ordering discipline is
  what keeps these deterministic), `.999999` microsecond edges, and
  epoch-adjacent (days from 1970-01-01, so second/minute bucket
  indices are tiny and sign-sensitive).

The whole oracle surface must stay cell-exact: both engines see the
same parquet, so any disagreement is a genuine semantic divergence
(floor vs truncate, tie-ordering, boundary inclusion), never noise.
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

# Timestamp remap per table: deterministic by key so the generation is
# reproducible and both engines read identical parquet.
_REMAP = {
    "orders": """
        SELECT * REPLACE(
          CASE o_orderkey % 4
            WHEN 0 THEN o_orderdate
            WHEN 1 THEN make_timestamp(
              CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                   THEN 2000 ELSE 1996 END, 2, 29, 0, 0, 0)
            WHEN 2 THEN date_trunc('year', o_orderdate)
                        - INTERVAL 1 MICROSECOND
            ELSE CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
          END AS o_orderdate)
        FROM read_parquet('{src}/orders.parquet')
    """,
    "lineitem": """
        SELECT * REPLACE(
          CASE (l_orderkey * 7 + l_linenumber) % 4
            WHEN 0 THEN l_shipdate
            WHEN 1 THEN make_timestamp(
              CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   THEN 2000 ELSE 1996 END, 2, 29, 23, 59, 59)
            WHEN 2 THEN date_trunc('year', l_shipdate)
                        - INTERVAL 1 MICROSECOND
            ELSE CAST(last_day(CAST(l_shipdate AS DATE)) AS TIMESTAMP)
          END AS l_shipdate)
        FROM read_parquet('{src}/lineitem.parquet')
    """,
    "events": """
        SELECT * REPLACE(
          CASE event_id % 5
            WHEN 0 THEN ts
            WHEN 1 THEN ts - INTERVAL 60 YEAR
            WHEN 2 THEN date_trunc('second', ts)
                        + INTERVAL 999999 MICROSECOND
            WHEN 3 THEN date_trunc('day', ts)
            ELSE TIMESTAMP '1970-01-01 00:00:00'
                 + (ts - TIMESTAMP '2024-01-01 00:00:00')
          END AS ts)
        FROM read_parquet('{src}/events.parquet')
    """,
}


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_calendar_edges")
    con = duckdb.connect()
    for t in TABLES:
        sel = _REMAP.get(t, f"SELECT * FROM read_parquet('{{src}}/{t}.parquet')")
        con.execute(
            f"COPY ({sel.format(src=sf_dir)})"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{edge_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_calendar_edge_parity(name, spark, edge_sf_dir, edge_duck):
    op = _OPS[name]
    sdf = op.fn(spark, edge_sf_dir).toPandas()
    ddf = edge_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
