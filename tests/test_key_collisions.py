"""Key-collision sweep: events rows colliding on (user_id, ts) with a
fresh event_id, AND true (event_id, ts) collisions with a different
payload — the clock-collision / at-least-once shape of real event
streams. Sequence ops (lag/lead/first, trailing frames, EWMA, rolling
median) must stay ORACLE-EXACT: a divergence means the op's output
depends on the interleaving of tied rows, which a retry or partition
re-split would change even on clean data. The fix pinned by this sweep:
every events window ORDER BY ends in the sequence value itself (a total
order of the projected row), with NULLS FIRST on the oracle side to
match Spark's ascending default.
"""

from __future__ import annotations

import duckdb
import pytest

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare

_OPS = load_all()

# Every oracle-paired op over the events sequence: the window/ts family,
# the batch-equivalent stream plans, and the CDC ops keyed on event_id.
_SEQUENCE_OPS = [
    "window_analytic", "window_running", "window_range_frame",
    "window_sessionize", "ts_fill_forward", "ts_downsample",
    "ts_interpolate", "window_pct_change", "ts_ewma", "ts_zscore",
    "window_funnel", "ts_rolling_median", "window_cumulative_distinct",
    "window_streaks", "stream_tumbling", "stream_sliding",
    "stream_session", "merge_upsert", "scd2_intervals",
    "merge_intervals", "snapshot_diff", "q_cohort_retention",
    "agg_argmax",
    # r6 extension ops over the events sequence: OHLC open/close order
    # ends in the payload value (total order of the projected row),
    # gap detection is interleave-invariant under full ties.
    "ts_gap_detect", "ts_resample_ohlc", "window_hopping",
    "ts_anomaly_mad",
]


@pytest.fixture(scope="module")
def collision_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_tscoll")
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(f"""COPY (
              SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')
              UNION ALL BY NAME
              -- same (user_id, ts) as an existing row, fresh event_id
              (SELECT event_id + 5000000 AS event_id, ts, user_id,
                      'dup_type' AS event_type, value + 1.5 AS value, props
               FROM read_parquet('{sf_dir}/events.parquet')
               WHERE event_id % 97 = 5 LIMIT 5)
              UNION ALL BY NAME
              -- true key collision: same (event_id, ts), new payload
              (SELECT event_id, ts, user_id, event_type,
                      value * 2 + 7 AS value, props
               FROM read_parquet('{sf_dir}/events.parquet')
               WHERE event_id % 97 = 11 LIMIT 3)
            ) TO '{tmp}/{t}.parquet' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def collision_duck(collision_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{collision_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_sequence_list_is_oracled():
    missing = [n for n in _SEQUENCE_OPS if n not in _OPS]
    assert not missing, missing
    no_oracle = [n for n in _SEQUENCE_OPS if _OPS[n].oracle is None]
    assert not no_oracle, no_oracle


@pytest.mark.parametrize("name", _SEQUENCE_OPS)
def test_sequence_op_collision_parity(name, spark, collision_sf_dir, collision_duck):
    op = _OPS[name]
    sdf = op.fn(spark, collision_sf_dir).toPandas()
    ddf = collision_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


# The similarity family under vec_id collisions: re-delivered vectors
# and same-id rows carrying a DIFFERENT vector. The oracles' unnest +
# GROUP BY dot products must stay per pair ROW — grouped on ids alone
# they mix elements of the two different vectors into one garbage dot
# (the original sim_cosine_pairs find).
_SIMILARITY_OPS = [
    "sim_cosine_pairs", "sim_knn_topk", "sim_range_search",
    "dedup_embedding_cosine", "embedding_quantize", "multimodal_join",
    "kmeans_quantized",
]


@pytest.fixture(scope="module")
def emb_collision_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_embcoll")
    con = duckdb.connect()
    for t in TABLES:
        if t == "embeddings":
            con.execute(f"""COPY (
              SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')
              UNION ALL BY NAME
              -- exact re-delivery (same vec_id, same vector)
              (SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')
               WHERE vec_id % 53 = 7 LIMIT 3)
              UNION ALL BY NAME
              -- key collision: same vec_id, perturbed vector
              (SELECT vec_id,
                      list_transform(embedding, x -> x * 0.5 + 0.1)
                        AS embedding, label
               FROM read_parquet('{sf_dir}/embeddings.parquet')
               WHERE vec_id % 53 = 21 LIMIT 2)
            ) TO '{tmp}/{t}.parquet' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def emb_collision_duck(emb_collision_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{emb_collision_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _SIMILARITY_OPS)
def test_similarity_op_collision_parity(
    name, spark, emb_collision_sf_dir, emb_collision_duck
):
    op = _OPS[name]
    sdf = op.fn(spark, emb_collision_sf_dir).toPandas()
    ddf = emb_collision_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


# The relational family under PK violations: orders rows re-delivered
# exactly AND same-o_orderkey rows with a different price; customer
# rows re-delivered. The hand-decorrelated Q queries must remain
# equivalent to their correlated-SQL oracles even when the "keys" they
# decorrelate on stop being unique — this is where a groupBy-then-join
# decorrelation and a correlated subquery could part ways. All passed
# on first run (recorded as a gate, not a fix).
_RELATIONAL_OPS = [
    "join_inner", "join_broadcast", "join_sort_merge", "join_left",
    "join_semi", "join_anti", "join_asof", "join_asof_forward",
    "join_dpp", "join_runtime_filter", "join_lateral", "join_null_safe",
    "agg_argmax", "window_rank", "window_topk_per_group",
    "filter_in_subquery", "filter_not_exists", "scalar_subquery_filter",
    "scalar_subquery_select", "subquery_correlated_agg",
    "merge_upsert", "snapshot_diff",
]


@pytest.fixture(scope="module")
def pk_violation_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_pkcoll")
    con = duckdb.connect()
    for t in TABLES:
        if t == "orders":
            con.execute(f"""COPY (
              SELECT * FROM read_parquet('{sf_dir}/orders.parquet')
              UNION ALL BY NAME
              (SELECT * FROM read_parquet('{sf_dir}/orders.parquet')
               WHERE o_orderkey % 101 = 13 LIMIT 4)
              UNION ALL BY NAME
              (SELECT o_orderkey, o_custkey, o_orderstatus,
                      o_totalprice * 2 + 11 AS o_totalprice,
                      o_orderdate, o_orderpriority
               FROM read_parquet('{sf_dir}/orders.parquet')
               WHERE o_orderkey % 101 = 29 LIMIT 3)
            ) TO '{tmp}/orders.parquet' (FORMAT PARQUET)""")
        elif t == "customer":
            con.execute(f"""COPY (
              SELECT * FROM read_parquet('{sf_dir}/customer.parquet')
              UNION ALL BY NAME
              (SELECT * FROM read_parquet('{sf_dir}/customer.parquet')
               WHERE c_custkey % 67 = 9 LIMIT 3)
            ) TO '{tmp}/customer.parquet' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
                f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def pk_violation_duck(pk_violation_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{pk_violation_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted({n for n in _OPS if n.startswith("q_")} | set(_RELATIONAL_OPS)))
def test_relational_op_pk_violation_parity(
    name, spark, pk_violation_sf_dir, pk_violation_duck
):
    op = _OPS[name]
    sdf = op.fn(spark, pk_violation_sf_dir).toPandas()
    ddf = pk_violation_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
