"""Determinism + layout-invariance for the rows-only (sketch) ops.

The ten ops without a SQL oracle — samplers, MinHash/SimHash/LSH,
HLL/KMV/GK sketches, IVF — escape the cell-exact parity gates, so
they get the two operational guarantees a 100 TB cluster actually
relies on, asserted directly:

- **Run-twice determinism**: speculative execution and stage retries
  re-run tasks; an op whose output differs between two identical runs
  produces silently different answers per attempt. Every rows-only op
  must be bit-identical across two runs on the same input.

- **Layout invariance**: the same rows delivered as 1 file or 5 files
  must yield the same result — EXCEPT where partition-coupled
  randomness is the documented contract:
  * ``scan_sample``: Bernoulli sampling draws a per-partition RNG
    stream from (seed, partition id) — the sample is reproducible for
    a FIXED layout (that's the contract; the accuracy test bounds the
    rate), not across layouts.
  * ``agg_approx_percentile`` / ``sim_ann_ivf``: quantile-summary
    merge order and KMeans init depend on partitioning; estimates stay
    within their documented error bounds (accuracy-tested) but are
    not bit-stable across layouts.
  Everything hash/merge-commutative (SimHash, MinHash-LSH, HLL, KMV,
  approx_top_k counts) MUST be layout-invariant — a divergence means
  the sketch leaks partition boundaries into values.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, normalize, table_source

_OPS = load_all()

_ROWS_ONLY = [n for n, op in _OPS.items() if op.oracle is None]

# Partition-coupled randomness is the documented contract (see module
# docstring); these are exempt from CROSS-LAYOUT bit-stability only —
# run-twice determinism still applies to all ten.
_LAYOUT_SENSITIVE = {"scan_sample", "agg_approx_percentile", "sim_ann_ivf"}


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"rowcount {len(a)} != {len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns {sorted(a.columns)} != {sorted(b.columns)}")
    if not problems:
        na, nb = normalize(a), normalize(b)
        if not na.equals(nb):
            diff = (na != nb).any(axis=1)
            problems.append(f"{int(diff.sum())} rows differ")
    return problems


@pytest.fixture(scope="module")
def multi5_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_rowsonly_multi")
    con = duckdb.connect()
    for t in TABLES:
        d = os.path.join(tmp, f"{t}.parquet")
        os.makedirs(d)
        for k in range(5):
            con.execute(
                f"""COPY (
                  SELECT * EXCLUDE (_rn) FROM (
                    SELECT *, row_number() OVER () AS _rn
                    FROM read_parquet('{table_source(sf_dir, t)}'))
                  WHERE _rn % 5 = {k}
                ) TO '{d}/part-{k}.parquet'
                  (FORMAT PARQUET, ROW_GROUP_SIZE 512)"""
            )
    con.close()
    return str(tmp)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_run_twice_determinism(name, spark, sf_dir):
    op = _OPS[name]
    first = op.fn(spark, sf_dir).toPandas()
    second = op.fn(spark, sf_dir).toPandas()
    problems = _frames_equal(first, second)
    assert not problems, f"{name} not deterministic: " + "; ".join(problems)


@pytest.mark.parametrize(
    "name", [n for n in _ROWS_ONLY if n not in _LAYOUT_SENSITIVE]
)
def test_layout_invariance(name, spark, sf_dir, multi5_sf_dir):
    op = _OPS[name]
    single = op.fn(spark, sf_dir).toPandas()
    multi = op.fn(spark, multi5_sf_dir).toPandas()
    problems = _frames_equal(single, multi)
    assert not problems, f"{name} layout-dependent: " + "; ".join(problems)
