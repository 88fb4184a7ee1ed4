"""Config-invariance sweep: parallelism must never reach the values.

A production cluster runs these operators under whatever parallelism
the platform picks: hundreds of shuffle partitions, input splits cut
by maxPartitionBytes, AQE coalescing in between. Results must be
bit-identical under ANY of it — a pid-based distributed rewrite
(window_running's prefix sums, window_distribution's per-task
offsets), a per-partition sort, or a merge-order-sensitive aggregate
that leaks partition boundaries into VALUES is wrong at scale no
matter how many fixed-config tests pass.

The arm runs the full oracle surface in a sibling session
(``spark.newSession()`` — own SQLConf, shared JVM) with the knobs the
driver could plausibly set differently:

- ``spark.sql.shuffle.partitions = 3`` (vs the suite's 8): every
  hash exchange, window sort, and state-store operator gets a
  different partition count;
- ``spark.sql.files.maxPartitionBytes = 64KB``: the scans split into
  many input tasks, so per-partition logic sees different row sets.

Cell-exact against the same DuckDB oracles. (AQE stays on — the
registry wrapper re-asserts it as the product posture; the ten
rows-only sketch ops have their own determinism gates, with the
partition-coupled exemptions documented there.)
"""

from __future__ import annotations

import pytest

# Full-surface sweep arm: deselected by default (pyproject addopts)
# so a plain `pytest tests/` fits an attestation budget; run with
# -m 'slow or not slow' for the whole suite.
pytestmark = pytest.mark.slow

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import compare

_OPS = load_all()


@pytest.fixture(scope="module")
def alt_spark(spark):
    alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "3")
    alt.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    return alt


@pytest.mark.parametrize(
    "name", [n for n, op in _OPS.items() if op.oracle is not None]
)
def test_config_invariance(name, alt_spark, sf_dir, duck):
    op = _OPS[name]
    sdf = op.fn(alt_spark, sf_dir).toPandas()
    ddf = duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
