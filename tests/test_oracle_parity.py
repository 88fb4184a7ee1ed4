"""Oracle-parity tests: every registered op with an oracle must match
DuckDB exactly (row count + columns + order-insensitive values) —
a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from s3_avro_repair_spark.plans.registry import load_all
from tools.verify_local import compare

_OPS = load_all()


@pytest.mark.parametrize("name", sorted(_OPS))
def test_op_matches_oracle(name, spark, sf_dir, duck):
    op = _OPS[name]
    sdf = op.fn(spark, sf_dir).toPandas()
    if op.oracle is None:
        # rows-only contract: a real schema (named, non-empty columns)
        # and materializable rows. (toPandas() already forced execution.)
        assert len(sdf.columns) > 0
        assert all(isinstance(c, str) and c for c in sdf.columns)
        assert len(sdf) >= 0
        return
    ddf = duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_contract_shape():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # Full SURVEY §2B surface (83 keys) + X-group extras + C group +
    # multi-format scans / maintenance ops.
    assert len(qs) >= 135
    # rows-only ops are the enumerated exceptions, nothing silently more
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "agg_approx_distinct", "scan_sample", "dedup_near",
        "sim_ann_lsh", "dedup_simhash", "sim_ann_ivf",
        "agg_approx_percentile",
    }
