"""Degenerate-strings sweep: empty and whitespace text under every op.

NULL and '' are different values with different semantics, and real
ingests deliver both: scrapers emit empty documents, extractors emit
whitespace-only ones, single-character fragments survive chunking.
The null-row sweep covers NULL; this arm covers the OTHER degenerate
class — `split('')` yields [''], `hex('')` is '', a whitespace doc
tokenizes to empty strings, an aggregate over zero selected chars
must agree on empty-vs-NULL — every one a place the engines (or an
op and its oracle) can part ways.

The generation appends five documents — '', a single space, two
newlines, a lone 'a', and a tabs-and-spaces run — plus one events
row with props = '' (vs the null sweep's NULL props). Full oracle
surface, cell-exact.
"""

from __future__ import annotations

import duckdb
import pytest

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare, table_source

_OPS = load_all()

_DOCS = [
    (9200, ""),
    (9201, " "),
    (9202, "\n\n"),
    (9203, "a"),
    (9204, " \t \t "),
]


@pytest.fixture(scope="module")
def degen_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_degen")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            rows = " UNION ALL BY NAME ".join(
                f"(SELECT CAST({i} AS BIGINT) AS doc_id, "
                f"{txt!r} AS text, 'en' AS lang, 'src0' AS source, "
                f"CAST({len(txt)} AS BIGINT) AS n_chars)"
                for i, txt in _DOCS
            )
            con.execute(
                f"COPY (SELECT * FROM"
                f" read_parquet('{table_source(sf_dir, t)}')"
                f" UNION ALL BY NAME {rows})"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
        elif t == "events":
            con.execute(
                f"""COPY (
                  SELECT * FROM read_parquet('{table_source(sf_dir, t)}')
                  UNION ALL BY NAME
                  (SELECT CAST(9200 AS BIGINT) AS event_id,
                          TIMESTAMP '2024-01-15 12:00:00' AS ts,
                          CAST(1 AS BIGINT) AS user_id,
                          '' AS event_type, 0.0 AS value, '' AS props)
                ) TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"""
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
def degen_duck(degen_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_source(degen_sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_degenerate_string_parity(name, spark, degen_sf_dir, degen_duck):
    op = _OPS[name]
    sdf = op.fn(spark, degen_sf_dir).toPandas()
    ddf = degen_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
