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

# Full-surface sweep arm: deselected by default (pyproject addopts)
# so a plain `pytest tests/` fits an attestation budget; run with
# -m 'slow or not slow' for the whole suite.
pytestmark = pytest.mark.slow

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


def test_brace_prefix_damage_never_parses(spark):
    """fn_variant's damage kernel argues that prefixing ``{{`` makes
    ANY payload invalid JSON (functions/scalar.py): after ``{`` only
    ``"`` or ``}`` may follow, and a second ``{`` is neither. The r4
    kmeans lesson is that an argued property needs an adversarial
    sweep BEFORE its attestation window — so pin it on both engines:
    Spark's try_parse_json must return NULL and DuckDB's json_valid
    false for '{{' + s over hypothesis-generated strings plus the
    hand-picked worst cases (closers, quotes, valid JSON, nesting
    completers)."""
    import json

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    adversarial = [
        "", "}", "}}", '"k": 1}}', '"k"}', "}{", '\\"}}',
        json.dumps({"k": 1}), "null}}", " }}", "\t}}", "1}}",
        '"a"}}', "[]}}", "[]}", '}},"x":1', "\u00a0}}", "\uffff}}",
    ]
    payloads = adversarial + [f"x{i}" for i in range(8)]
    sdf = spark.createDataFrame(
        [(i, "{{" + s) for i, s in enumerate(payloads)],
        "i long, damaged string",
    )
    parsed = sdf.orderBy("i").select(
        F.try_parse_json("damaged").isNotNull().alias("ok")
    )
    assert [r.ok for r in parsed.collect()] == [False] * len(payloads)

    con = duckdb.connect()

    def duck_invalid(s: str) -> bool:
        return not con.execute(
            "SELECT json_valid(?)", ["{{" + s]
        ).fetchone()[0]

    assert all(duck_invalid(s) for s in adversarial)

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def _sweep(s: str):
        assert duck_invalid(s)

    _sweep()
