"""10x scaling census: wall-time per op at sf0.1 vs the synthesized
10x fixture (tools/scale_fixture.py), flagging super-linear ops.

The round-5 5-query measurement caught one quadratic candidate join
(banded_candidates, SCALING.md); this sweeps the whole volume-sensitive
surface the same way so the next one is caught by a tool, not by luck.
Excludes the E (Avro tree) and T (streaming microbatch) groups — their
cost is file-count-bound against per-sf fixture trees that don't exist
for the synthesized dir — and the deliberately-eager sink ops.

Usage: python tools/scaling_census.py [ratio_flag] [op ...]
Prints one line per op: name, sf0.1 s, sf1.0 s, ratio; summary of ops
whose ratio exceeds ratio_flag (default 8.0 — 10x data, so >8x wall
means at-or-past-linear with no floor amortization; the interesting
tail) sorted worst-first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_GROUPS = {"E", "T"}
SKIP_OPS = {
    # eager writers sized by input volume — legit 10x cost, not a plan smell
    "sink_parquet", "sink_avro", "sink_bucketed", "avro_rewrite",
    "avro_compact", "compact_small_files", "join_bucketed_tables",
    "join_dpp",
}

SF01 = os.environ.get("CENSUS_BASE_DIR", "/root/testdata/sf0.1")
SF10 = os.environ.get(
    "CENSUS_SCALED_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".avro_cache", "scaled_sf1.0",
    ),
)


OP_TIMEOUT_S = float(os.environ.get("CENSUS_OP_TIMEOUT_S", "150"))


def _join_output_rows(plan) -> int:
    """Sum of numOutputRows over every join node in an EXECUTED
    physical plan (AQE query stages descended via .plan()). This is
    the r5 lesson made measurable: joined-rows is the join's WORK,
    which can grow quadratically while output-rows stays flat — the
    banded_candidates blowup was invisible in output counts."""
    total = 0

    def walk(node):
        nonlocal total
        name = node.nodeName()
        if "Join" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total += kv._2().value()
        try:
            if "QueryStage" in name:
                walk(node.plan())
        except Exception:
            pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    return total


def time_op(op, spark, sf_dir: str) -> tuple[float, int]:
    """(min-of-2 wall time, joined-rows), with a per-attempt job-group
    timeout.

    Run 1 executes through the noop sink (identical to bench.py); run 2
    executes the SAME physical plan via plan.execute().count() — a
    JVM-side RDD count, no driver materialization — so the executed
    plan's join metrics are readable afterwards (a noop write executes
    a separate command plan whose metrics aren't reachable).

    The first full-surface run wedged for >25 min inside ONE op
    (dedup_near at 10x: AQE coalesced an exploding LSH-bucket join to
    2 partitions, one task got the whole pile). A census datapoint of
    ">150s, cancelled" is exactly as actionable as the true number,
    and the sweep keeps moving."""
    import threading

    best = None
    joined = 0
    for attempt in range(2):
        sc = spark.sparkContext
        sc.setJobGroup("census", op.name, interruptOnCancel=True)
        # Branch on an explicit cancelled FLAG, not elapsed wall time:
        # classifying any exception after OP_TIMEOUT_S-1 as a timeout
        # turned a genuine failure at ~149s into TimeoutError, and a
        # cancellation surfacing early leaked as the raw Py4J error
        # (r5 ADVICE — census labels were wrong near the boundary).
        cancelled = threading.Event()

        def _cancel():
            cancelled.set()
            sc.cancelJobGroup("census")

        timer = threading.Timer(OP_TIMEOUT_S, _cancel)
        timer.start()
        t0 = time.perf_counter()
        try:
            df = op.fn(spark, sf_dir)
            if attempt == 0:
                df.write.format("noop").mode("overwrite").save()
            else:
                plan = df._jdf.queryExecution().executedPlan()
                plan.execute().count()
                try:
                    final = plan
                    if plan.nodeName() == "AdaptiveSparkPlan":
                        final = plan.executedPlan()
                    joined = _join_output_rows(final)
                except Exception:
                    joined = -1  # metrics unreadable; wall still stands
        except Exception as exc:
            if cancelled.is_set():
                raise TimeoutError(
                    f"cancelled after {OP_TIMEOUT_S:.0f}s"
                ) from exc
            raise
        finally:
            timer.cancel()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, joined


def fresh_session():
    """(Re)build the census SparkSession, surviving a dead JVM.

    A heap OOM in local mode poisons the single JVM; every later py4j
    call then fails with Connection refused, which voided 90% of the
    first census run. Clearing the cached gateway/context lets
    getOrCreate launch a brand-new JVM mid-process."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
    except Exception:
        pass
    with SparkContext._lock:
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
    SparkSession._instantiatedSession = None
    SparkSession._activeSession = None

    # A realistic heap: local-mode default is 1g shared by 32 task
    # threads = 32 MB/task, an order of magnitude below any production
    # executor sizing — at that starvation even bounded sketches
    # (percentile_approx's QuantileSummaries partials x 32 concurrent
    # tasks) OOM and the census measures the harness, not the plans.
    # 4g (~128 MB/task) is still tight enough that a genuinely
    # unbounded per-group buffer dies on the 10x fixture.
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell"
    )

    from s3_avro_repair_spark.session import get_session

    spark = get_session("census", master="local[32]")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    return spark


def ensure_alive(spark):
    try:
        spark.range(1).count()
        return spark
    except Exception:
        print("  [session dead - relaunching JVM]", flush=True)
        return fresh_session()


def main() -> int:
    flag = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    only = set(sys.argv[2:])

    from s3_avro_repair_spark.plans.registry import load_all

    if not os.path.isdir(SF10):
        print(f"missing {SF10}: run tools/scale_fixture.py first")
        return 2

    spark = fresh_session()
    ops = load_all()
    rows = []
    for name, op in sorted(ops.items()):
        if only and name not in only:
            continue
        if not only and (op.group in SKIP_GROUPS or name in SKIP_OPS):
            continue
        try:
            t01, j01 = time_op(op, spark, SF01)
            t10, j10 = time_op(op, spark, SF10)
        except Exception as exc:
            # str(Py4JJavaError) round-trips to the JVM; if the JVM is
            # the thing that died, that raises from inside this except.
            try:
                first = str(exc).splitlines()[0][:200] if str(exc) else ""
            except Exception:
                first = "<unrenderable: JVM gone>"
            print(f"{name}: FAILED {type(exc).__name__}: {first}", flush=True)
            spark = ensure_alive(spark)
            continue
        ratio = t10 / t01 if t01 > 0 else float("inf")
        jratio = (j10 / j01) if j01 and j01 > 0 and j10 >= 0 else None
        rows.append((name, t01, t10, ratio, j01, j10, jratio))
        # -1 is the metrics-unreadable sentinel: never print it as a
        # nonsense negative count — but when only ONE side is
        # unreadable, keep the readable side with a '?' placeholder
        # instead of silently dropping both (r6 ADVICE). census_report
        # derives ratios only from fully-numeric pairs, so the '?'
        # lines are informational and parse-safe (no ratio suffix).
        if j01 >= 0 and j10 >= 0:
            jtxt = (
                f" joined {j01} -> {j10}"
                + (f" ({jratio:.1f}x)" if jratio is not None else "")
                if (j01 > 0 or j10 > 0)
                else ""
            )
        elif j01 >= 0 or j10 >= 0:
            a = str(j01) if j01 >= 0 else "?"
            b = str(j10) if j10 >= 0 else "?"
            jtxt = f" joined {a} -> {b}"
        else:
            jtxt = ""
        print(f"{name}: {t01:.2f}s -> {t10:.2f}s ({ratio:.1f}x){jtxt}", flush=True)

    hot = sorted((r for r in rows if r[3] > flag), key=lambda r: -r[3])
    print(f"\n{len(rows)} ops; {len(hot)} over {flag}x wall on scaled data:")
    for name, t01, t10, ratio, *_ in hot:
        print(f"  {name}: {t01:.2f}s -> {t10:.2f}s ({ratio:.1f}x)")
    # Joined-rows law: at Kx data a linear join does Kx the work. Flag
    # joins whose work grew past flag*K-equivalent (reuse the same
    # multiplier: wall flag defaults 8 on 10x; joined-rows uses 2*flag
    # to allow constant fan-in floors on tiny baselines).
    jhot = [
        r for r in rows if r[6] is not None and r[6] > 2 * flag and r[4] > 100
    ]
    jhot.sort(key=lambda r: -(r[6] or 0))
    print(f"{len(jhot)} ops with joined-rows growth over {2 * flag:.0f}x:")
    for name, _, _, _, j01, j10, jr in jhot:
        print(f"  {name}: joined {j01} -> {j10} ({jr:.1f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
