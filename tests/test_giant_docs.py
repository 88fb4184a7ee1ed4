"""Giant-document sweep: the megabyte tail of a real corpus.

A 100 TB corpus is mostly small documents and a long tail of
monsters: concatenated logs, minified bundles, OCR dumps, spam
repeats. Per-document work that is accidentally superlinear —
a regex that backtracks on a 5,000-digit run, a HOF that re-splits
the text per element (the r1 O(tokens²) ngram trap), a comparison
that reads whole documents instead of bounded heads — is invisible
at median document length and eats the job at the tail.

The generation appends four adversarial documents to the corpus:

- 20,000 DISTINCT tokens (~130 KB): vocabulary-heavy — tfidf/
  collocation/ngram state scales with it, shingle sets actually grow;
- one unbroken 100,000-char token: tokenize yields a single giant
  token through every split/regexp path; the 64-char levenshtein
  head cap and length-bounded kernels are what keep it O(1);
- a 5,000-digit run: the PII masking regexes (phone/card shapes with
  quantifiers) meet their classic catastrophic-backtracking input;
- 'spam ' repeated 30,000 times: maximal Gopher repetition, a
  one-shingle document for the dedup family, and a 150 KB payload
  through every Arrow/pandas text kernel.

The FULL oracle surface must stay cell-exact, and the sweep finishing
at all is the superlinearity guard: any backtracking regex or
per-element re-split turns these documents into minutes, not
milliseconds.
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

_GIANT_SQL = """
    SELECT CAST(9100 AS BIGINT) AS doc_id,
           (SELECT string_agg('tok' || i, ' ') FROM range(20000) t(i))
             AS text,
           'en' AS lang, 'src0' AS source
    UNION ALL
    SELECT CAST(9101 AS BIGINT), repeat('x', 100000), 'en', 'src1'
    UNION ALL
    SELECT CAST(9102 AS BIGINT),
           'call me at ' || repeat('1', 5000) || ' thanks',
           'en', 'src2'
    UNION ALL
    SELECT CAST(9103 AS BIGINT), rtrim(repeat('spam ', 30000)),
           'en', 'src3'
"""


@pytest.fixture(scope="module")
def giant_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_giant")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(f"""COPY (
              SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
              UNION ALL BY NAME
              (SELECT doc_id, text, lang, source,
                      CAST(length(text) AS BIGINT) AS n_chars
               FROM ({_GIANT_SQL}))
            ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def giant_duck(giant_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{giant_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_giant_doc_parity(name, spark, giant_sf_dir, giant_duck):
    op = _OPS[name]
    sdf = op.fn(spark, giant_sf_dir).toPandas()
    ddf = giant_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
