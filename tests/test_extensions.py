"""Semantic tests for the r6 extension ops (operators/extensions.py).

Oracle parity proves Spark == DuckDB; these prove the METRICS mean
what they claim, on planted fixtures where the right answer is known
by construction (the test strategy SURVEY §5 prescribes: every
operator gets a fixture whose expected output is hand-derivable).
All fixtures and ops are deterministic — no tolerance fudging beyond
documented float rounding.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from s3_avro_repair_spark.plans.registry import load_all

_OPS = load_all()


def _docs(tmp, rows):
    """rows: (doc_id, text[, lang, source, n_chars])"""
    full = [
        {
            "doc_id": r[0],
            "text": r[1],
            "lang": r[2] if len(r) > 2 else "en",
            "source": r[3] if len(r) > 3 else "t",
            "n_chars": r[4] if len(r) > 4 else len(r[1] or ""),
        }
        for r in rows
    ]
    pd.DataFrame(full).to_parquet(str(tmp / "documents.parquet"))
    return str(tmp)


def _events(tmp, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)"""
    df = pd.DataFrame(
        [
            {
                "event_id": r[0],
                "ts": pd.Timestamp(r[1]),
                "user_id": r[2],
                "event_type": r[3],
                "value": r[4],
                "props": "{}",
            }
            for r in rows
        ]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(str(tmp / "events.parquet"))
    return str(tmp)


def _embeddings(tmp, rows):
    """rows: (vec_id, embedding list, label)"""
    pd.DataFrame(
        [{"vec_id": r[0], "embedding": r[1], "label": r[2]} for r in rows]
    ).to_parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_perplexity_ranks_rare_tokens_higher(spark, tmp_path_factory):
    """A document of corpus-common tokens must score LOWER unigram
    cross-entropy than a document of tokens that occur nowhere else —
    that ordering is the entire point of the quality score."""
    tmp = tmp_path_factory.mktemp("ppl")
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "zyx qwv jkl pqr mno bcd"))
    out = (
        _OPS["text_perplexity_unigram"]
        .fn(spark, _docs(tmp, rows))
        .toPandas()
        .set_index("doc_id")
    )
    common = out.loc[0, "xent"]
    rare = out.loc[99, "xent"]
    assert rare > common + 1.0, (rare, common)
    assert int(out.loc[99, "n_tokens"]) == 6
    # Exact value for the rare doc: each token occurs once in a
    # 66-token corpus -> -ln(1/66) for all six tokens.
    assert rare == pytest.approx(round(math.log(66), 4), abs=1e-9)


def test_gap_detect_finds_exactly_the_planted_gap(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gap")
    rows = [
        # user 1: dense, then a 3.5h hole, then dense again
        (1, "2024-01-01 00:00:00", 1, "a", 1.0),
        (2, "2024-01-01 01:00:00", 1, "a", 1.0),
        (3, "2024-01-01 01:30:00", 1, "a", 1.0),
        (4, "2024-01-01 05:00:00", 1, "a", 1.0),
        # user 2: never more than 2h apart
        (5, "2024-01-01 00:00:00", 2, "a", 1.0),
        (6, "2024-01-01 02:00:00", 2, "a", 1.0),
    ]
    out = _OPS["ts_gap_detect"].fn(spark, _events(tmp, rows)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.user_id) == 1
    assert int(r.gap_us) == 3 * 3600 * 1_000_000 + 1800 * 1_000_000
    assert int(r.gap_end_us) - int(r.gap_start_us) == int(r.gap_us)


def test_hopping_event_lands_in_exactly_four_windows(
    spark, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("hop")
    out = (
        _OPS["window_hopping"]
        .fn(
            spark,
            _events(tmp, [(1, "2024-01-01 00:10:00", 1, "click", 2.5)]),
        )
        .toPandas()
        .sort_values("ws_us")
    )
    # 1h window hopping 15min: starts 23:15, 23:30, 23:45, 00:00.
    base = int(pd.Timestamp("2024-01-01 00:00:00").value // 1000)
    slide = 900 * 1_000_000
    assert list(out.ws_us) == [base - 3 * slide, base - 2 * slide,
                               base - slide, base]
    assert list(out.n) == [1, 1, 1, 1]
    assert list(out.total) == [2.5] * 4


def test_ohlc_planted_bar_and_tie_determinism(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ohlc")
    rows = [
        (1, "2024-01-01 10:05:00", 1, "px", 5.0),
        (2, "2024-01-01 10:20:00", 1, "px", 9.0),
        (3, "2024-01-01 10:40:00", 1, "px", 1.0),
        (4, "2024-01-01 10:55:00", 1, "px", 7.0),
        # second hour: full (ts, event_id) tie with different payloads
        # — open must deterministically be the LOWER value (the total
        # order ends in the payload).
        (9, "2024-01-01 11:00:00", 1, "px", 8.0),
        (9, "2024-01-01 11:00:00", 1, "px", 3.0),
    ]
    out = (
        _OPS["ts_resample_ohlc"]
        .fn(spark, _events(tmp, rows))
        .toPandas()
        .sort_values("hr_us")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    bar = out.iloc[0]
    assert (bar.open, bar.high, bar.low, bar.close, bar.n) == (
        5.0, 9.0, 1.0, 7.0, 4,
    )
    tie = out.iloc[1]
    assert (tie.open, tie.close, tie.n) == (3.0, 8.0, 2)


def test_anomaly_mad_flags_only_the_planted_outlier(
    spark, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("mad")
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "m", 10.0 + (i % 3) - 1)
        for i in range(20)
    ]
    rows.append((99, "2024-01-01 01:00:00", 1, "m", 1000.0))
    out = _OPS["ts_anomaly_mad"].fn(spark, _events(tmp, rows)).toPandas()
    assert list(out.event_id) == [99]
    # med = 10, MAD = 1 -> robust z = 990 / 1.4826 ~ 667.74
    assert out.iloc[0].robust_z == pytest.approx(
        round(990 / 1.4826, 4), abs=1e-6
    )


def test_reservoir_sample_prefers_heavy_weights(spark, tmp_path_factory):
    """A-ES with w-ratio 1000: the top-100 must be overwhelmingly the
    heavy docs. Deterministic (md5-derived u), so the exact count is
    stable — require the inequality, not the exact value, so the
    assertion documents the PROPERTY."""
    tmp = tmp_path_factory.mktemp("res")
    rows = [(i, "x", "en", "t", 5000) for i in range(100)]  # heavy
    rows += [(1000 + i, "x", "en", "t", 5) for i in range(200)]  # light
    out = (
        _OPS["sample_reservoir_weighted"]
        .fn(spark, _docs(tmp, rows))
        .toPandas()
    )
    assert len(out) == 100
    heavy = (out.doc_id < 1000).sum()
    assert heavy >= 90, heavy


def test_centroid_distance_flags_planted_embedding_outlier(
    spark, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("cdist")
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(10)]
    rows.append((99, [-1.0, 0.0, 0.0, 0.0], 0))
    rows += [(200 + i, [0.0, 1.0, 0.0, 0.0], 1) for i in range(5)]
    out = (
        _OPS["embedding_centroid_distance"]
        .fn(spark, _embeddings(tmp, rows))
        .toPandas()
    )
    lab0 = out[out.label == 0].set_index("vec_id")
    assert lab0.dist.idxmax() == 99
    # centroid of label 0 = (10*1 - 1)/11 = 9/11 on axis 0; the
    # outlier sits at -1: dist = |-1 - 9/11| = 20/11.
    assert lab0.loc[99, "dist"] == pytest.approx(round(20 / 11, 4), abs=1e-9)
    # label-1 members are identical -> dist 0 exactly.
    assert (out[out.label == 1].dist == 0).all()


def test_fn_url_round_trips_constructed_parts(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("url")
    rows = [
        (1, "x", "en", "src3", 42),
        (2, "x", None, "src3", 42),  # NULL lang nulls every part
        (3, "x", "@@", "src3", 42),  # lang sanitizes to '' -> NULL url
    ]
    out = (
        _OPS["fn_url"].fn(spark, _docs(tmp, rows)).toPandas().set_index("doc_id")
    )
    r = out.loc[1]
    assert r.url == "https://src3.example.org/en/1?q=42"
    assert r.host == "src3.example.org"
    assert r.path == "/en/1"
    assert r["query"] == "q=42"
    assert r.q_param == "42"
    assert out.loc[2].isna().all()
    assert out.loc[3].isna().all()


def test_dedup_exact_normalized_catches_case_and_punct(
    spark, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("norm")
    rows = [
        (1, "Hello, World!"),
        (2, "hello world"),
        (3, "HELLO -- WORLD?!"),
        (4, "an unrelated document"),
    ]
    out = (
        _OPS["dedup_exact_normalized"]
        .fn(spark, _docs(tmp, rows))
        .toPandas()
        .sort_values("dup_id")
    )
    assert list(out.keep_id) == [1, 1]
    assert list(out.dup_id) == [2, 3]


def test_skew_kurtosis_matches_manual_sample_statistics(
    spark, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("moments")
    vals = [1.0, 2.0, 4.0, 8.0, 16.0]
    pd.DataFrame(
        {
            "l_returnflag": ["A"] * 5 + ["B"] * 2,
            "l_linestatus": ["O"] * 7,
            # n=2 group: below both small-n guards -> NULL moments
            "l_extendedprice": vals + [3.0, 3.0],
        }
    ).to_parquet(str(tmp / "lineitem.parquet"))
    out = (
        _OPS["agg_skew_kurtosis"]
        .fn(spark, str(tmp))
        .toPandas()
        .set_index("l_returnflag")
    )
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum((x - mean) ** 2 for x in vals) / n
    m3 = sum((x - mean) ** 3 for x in vals) / n
    m4 = sum((x - mean) ** 4 for x in vals) / n
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3
    big_g1 = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    big_g2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    assert out.loc["A", "skew"] == pytest.approx(round(big_g1, 4), abs=1e-9)
    assert out.loc["A", "kurt"] == pytest.approx(round(big_g2, 4), abs=1e-9)
    assert int(out.loc["A", "n"]) == 5
    assert pd.isna(out.loc["B", "skew"]) and pd.isna(out.loc["B", "kurt"])


def test_containment_catches_excerpt_jaccard_misses(
    spark, tmp_path_factory
):
    """The planted excerpt relation: doc 2 is a verbatim slice of the
    much longer doc 1, so max-containment is 1.0 while Jaccard is far
    below dedup_ngram_jaccard's 0.12 floor — the asymmetric case this
    operator exists for. Doc 3 shares nothing and must not pair."""
    tmp = tmp_path_factory.mktemp("containment")
    long_doc = " ".join(f"w{i}" for i in range(120))
    excerpt = " ".join(f"w{i}" for i in range(40, 50))
    rows = [
        (1, long_doc),
        (2, excerpt),
        (3, " ".join(f"z{i}" for i in range(30))),
    ]
    out = (
        _OPS["dedup_containment"]
        .fn(spark, _docs(tmp, rows))
        .toPandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b, r.contained_id) == (1, 2, 2)
    assert r.containment == 1.0
    # the same pair is invisible to symmetric Jaccard at its threshold
    jac = _OPS["dedup_ngram_jaccard"].fn(spark, _docs(tmp, rows)).toPandas()
    assert len(jac) == 0


def test_bm25_saturates_tf_and_penalizes_common_terms(
    spark, tmp_path_factory
):
    """BM25's two defining behaviors on a planted corpus: (a) a term
    in EVERY doc scores strictly below a same-tf rare term (idf
    monotonicity), and (b) doubling tf less than doubles the weight
    (k1 saturation)."""
    tmp = tmp_path_factory.mktemp("bm25")
    rows = [
        (1, "common rare pad1a pad1b"),
        (2, "common filler filler filler"),
        (3, "common filler pad3a pad3b"),
    ]
    out = (
        _OPS["text_bm25"]
        .fn(spark, _docs(tmp, rows))
        .toPandas()
        .set_index(["doc_id", "term"])
    )
    # idf monotonicity: same tf (1), same doc -> rare (df=1) beats
    # common (df=3, every doc)
    assert out.loc[(1, "rare")].bm25 > out.loc[(1, "common")].bm25 > 0
    # k1 saturation: same term (same idf), same doc length -> tf=3
    # scores more than tf=1 but strictly less than 3x it
    sat = out.loc[(2, "filler")].bm25 / out.loc[(3, "filler")].bm25
    assert 1.0 < sat < 3.0


def test_asof_nearest_picks_closer_side_and_breaks_ties_backward(
    spark, tmp_path_factory
):
    """The fixture's events all postdate every order, so the driver
    row exercises only the backward arm — this planted case pins the
    other two: an event strictly closer to its NEXT order must take
    the forward date, and an exactly-equidistant event must resolve
    BACKWARD (the <= rule both engines share). An event with no order
    at all for its user is dropped (inner semantics)."""
    tmp = tmp_path_factory.mktemp("asof_nearest")
    _events(
        tmp,
        [
            (1, "2024-01-10 00:00:00", 7, "t", 1.0),  # closer to Jan 1 (back)
            (2, "2024-01-25 00:00:00", 7, "t", 1.0),  # closer to Feb 1 (fwd)
            (3, "2024-01-16 12:00:00", 7, "t", 1.0),  # equidistant -> back
            (4, "2024-03-01 00:00:00", 9, "t", 1.0),  # user 9: no orders
        ],
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [7, 7],
            "o_orderstatus": ["F", "F"],
            "o_totalprice": [1.0, 2.0],
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-02-01"]
            ).astype("datetime64[us]"),
        }
    )
    orders.to_parquet(str(tmp / "orders.parquet"))
    out = (
        _OPS["join_asof_nearest"]
        .fn(spark, str(tmp))
        .toPandas()
        .set_index("event_id")
        .nearest_orderdate
    )
    assert out.to_dict() == {
        1: "2024-01-01",
        2: "2024-02-01",
        3: "2024-01-01",
    }
