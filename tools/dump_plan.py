"""Dump .explain('formatted') output for registered ops.

Usage: python tools/dump_plan.py <out_dir> <suffix> <op_name> [op_name ...]

Writes {out_dir}/{op}_{suffix}.txt for each op — the plan-evidence
files the optimization rounds commit under plans/rN/.

SPARK_GRAFT_DUMP_NOCKPT=1 makes localCheckpoint a no-op for the dump
ONLY, so the FULL pipeline (normally truncated to `Scan ExistingRDD`
at every materialization barrier) is visible in the plan evidence.
Dump-time introspection only — bench/driver paths never set it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    if os.environ.get("SPARK_GRAFT_DUMP_NOCKPT") == "1":
        # Patch the CLASSIC class: pyspark.sql.DataFrame is the abstract
        # API base in Spark 4 and instances resolve the subclass method.
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self

    spark = get_session("dump-plan")
    ops = load_all()
    for name in names:
        op = ops.get(name)
        if op is None:
            print(f"unknown op: {name}", file=sys.stderr)
            continue
        df = op.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
