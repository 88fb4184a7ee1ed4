"""Property tests for the gaps-and-islands temporal operators.

merge_intervals and window_sessionize both hinge on exact threshold
semantics (a session break is gap > 30min; intervals that merely TOUCH
still merge) and on the event_id tiebreak for duplicate timestamps.
The fixture corpus rarely produces events exactly 1800.000000s or
1800.000001s apart, so these generate adversarial per-user streams —
boundary gaps at microsecond precision, duplicated timestamps,
singleton users — and compare against direct Python sweep references.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

GAP_US = 1_800_000_000  # 30 minutes in microseconds
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z epoch micros

# Gaps clustered on the threshold: exactly 30min (same session /
# touching interval), one microsecond past it (break / new island),
# one short of it, plus zero (duplicate ts) and ordinary values.
_GAPS = st.sampled_from(
    [0, 1, 1_000_000, GAP_US - 1, GAP_US, GAP_US + 1, 2 * GAP_US]
)


@st.composite
def _event_streams(draw):
    users = draw(st.integers(min_value=1, max_value=3))
    rows = []
    eid = 0
    for u in range(users):
        n = draw(st.integers(min_value=1, max_value=8))
        t = BASE_US + u  # stagger users so streams never align
        for i in range(n):
            if i:
                t += draw(_GAPS)
            rows.append({"event_id": eid, "ts_us": t, "user_id": u})
            eid += 1
    # Duplicate-timestamp rows get event_ids in generation order, which
    # is the tiebreak order both engines use.
    return rows


def _write_events(tmp, rows):
    df = pd.DataFrame(
        {
            "event_id": [r["event_id"] for r in rows],
            "ts": pd.to_datetime([r["ts_us"] for r in rows], unit="us"),
            "user_id": [r["user_id"] for r in rows],
            "event_type": [r.get("event_type", "click") for r in rows],
            "value": 1.0,
            "props": "{}",
        }
    )
    df.to_parquet(str(tmp / "events.parquet"))
    return str(tmp)


def _ref_sessionize(rows):
    """session_seq per event: running count of breaks (gap > 30min),
    first event of a user always opens session 1."""
    out = {}
    by_user: dict[int, list[dict]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for stream in by_user.values():
        stream.sort(key=lambda r: (r["ts_us"], r["event_id"]))
        seq = 0
        prev = None
        for r in stream:
            if prev is None or r["ts_us"] - prev > GAP_US:
                seq += 1
            out[r["event_id"]] = seq
            prev = r["ts_us"]
    return out


def _ref_merge_intervals(rows):
    """Maximal merged [ts, ts+30min) coverage windows per user. Mirrors
    the op's numbering: the first island of a user is 0 (the running
    sum of new-island flags, and the first row's flag is 0 because the
    empty preceding window yields NULL max)."""
    islands = []
    by_user: dict[int, list[dict]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, stream in sorted(by_user.items()):
        stream.sort(key=lambda r: (r["ts_us"], r["event_id"]))
        island = -1
        cur_end = None
        for r in stream:
            s, e = r["ts_us"], r["ts_us"] + GAP_US
            if cur_end is None or s <= cur_end:
                if cur_end is None:
                    island += 1
                    islands.append([u, island, s, e, 1])
                else:
                    islands[-1][3] = max(islands[-1][3], e)
                    islands[-1][4] += 1
            else:
                island += 1
                islands.append([u, island, s, e, 1])
            cur_end = max(cur_end, e) if cur_end is not None else e
    return {
        (u, i): (s, e, n) for u, i, s, e, n in islands
    }


@settings(max_examples=5, deadline=None)
@given(rows=_event_streams())
def test_sessionize_matches_sweep_reference(rows, tmp_path_factory):
    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    spark = get_session("pytest", master="local[8]", shuffle_partitions=8)
    sf_dir = _write_events(tmp_path_factory.mktemp("sessprop"), rows)
    got = {
        r["event_id"]: r["session_seq"]
        for r in load_all()["window_sessionize"].fn(spark, sf_dir).collect()
    }
    assert got == _ref_sessionize(rows)


@settings(max_examples=5, deadline=None)
@given(rows=_event_streams())
def test_merge_intervals_matches_sweep_reference(rows, tmp_path_factory):
    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    spark = get_session("pytest", master="local[8]", shuffle_partitions=8)
    sf_dir = _write_events(tmp_path_factory.mktemp("mergeprop"), rows)
    got = {
        (r["user_id"], r["island"]): (r["start_us"], r["end_us"], r["n_events"])
        for r in load_all()["merge_intervals"].fn(spark, sf_dir).collect()
    }
    expect = _ref_merge_intervals(rows)
    assert got == expect
    # Structural invariants independent of the reference: islands are
    # disjoint and separated by REAL gaps (end < next start), and
    # event counts sum to the input.
    for u in {r["user_id"] for r in rows}:
        ivs = sorted(v for (uu, _), v in got.items() if uu == u)
        for (s1, e1, _), (s2, _, _) in zip(ivs, ivs[1:]):
            assert e1 < s2, (u, ivs)
    assert sum(n for _, _, n in got.values()) == len(rows)


def test_pct_change_zero_previous_reading(spark, tmp_path_factory):
    """A zero reading followed by a nonzero one crashed window_pct_change
    under ANSI division (found by the sf0.1 sweep — sf0.01 happens to
    contain no zeros). percent-of-zero is NULL by definition now, on
    both engines."""
    tmp = tmp_path_factory.mktemp("pctzero")
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.to_datetime(
                [BASE_US + i * 1_000_000 for i in range(4)], unit="us"
            ),
            "user_id": 1,
            "event_type": "click",
            "value": [4.0, 0.0, 8.0, 2.0],
            "props": "{}",
        }
    )
    df.to_parquet(str(tmp / "events.parquet"))

    from s3_avro_repair_spark.plans.registry import load_all

    out = {
        r["event_id"]: r["pct_change"]
        for r in load_all()["window_pct_change"].fn(spark, str(tmp)).collect()
    }
    assert out[0] is None            # first reading
    assert out[1] == -1.0            # 4 -> 0
    assert out[2] is None            # previous reading is zero
    assert out[3] == -0.75           # 8 -> 2


@st.composite
def _funnel_streams(draw):
    """Per-user event sequences over a tiny time range so stage events
    frequently COLLIDE on identical timestamps — the edge that matters:
    a click at exactly the first view's timestamp must NOT count
    (strictly-after semantics)."""
    users = draw(st.integers(min_value=1, max_value=4))
    rows = []
    eid = 0
    for u in range(users):
        n = draw(st.integers(min_value=1, max_value=7))
        for _ in range(n):
            rows.append(
                {
                    "event_id": eid,
                    # 4 slots only -> heavy same-ts collisions
                    "ts_us": BASE_US + draw(st.integers(0, 3)) * 1_000_000,
                    "user_id": u,
                    "event_type": draw(
                        st.sampled_from(["view", "click", "purchase"])
                    ),
                }
            )
            eid += 1
    return rows


def _ref_funnel(rows):
    """view -> click -> purchase, each stage strictly after the user's
    FIRST qualifying previous-stage event."""
    counts = {"view": 0, "view>click": 0, "view>click>purchase": 0}
    by_user: dict[int, list[dict]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for stream in by_user.values():
        t1 = min(
            (r["ts_us"] for r in stream if r["event_type"] == "view"),
            default=None,
        )
        if t1 is None:
            continue
        counts["view"] += 1
        t2 = min(
            (
                r["ts_us"]
                for r in stream
                if r["event_type"] == "click" and r["ts_us"] > t1
            ),
            default=None,
        )
        if t2 is None:
            continue
        counts["view>click"] += 1
        t3 = min(
            (
                r["ts_us"]
                for r in stream
                if r["event_type"] == "purchase" and r["ts_us"] > t2
            ),
            default=None,
        )
        if t3 is not None:
            counts["view>click>purchase"] += 1
    return counts


@settings(max_examples=5, deadline=None)
@given(rows=_funnel_streams())
def test_funnel_strictly_after_semantics(rows, tmp_path_factory):
    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    spark = get_session("pytest", master="local[8]", shuffle_partitions=8)
    sf_dir = _write_events(tmp_path_factory.mktemp("funprop"), rows)
    got = {
        r["stage"]: r["n_users"]
        for r in load_all()["window_funnel"].fn(spark, sf_dir).collect()
    }
    assert got == _ref_funnel(rows)


@st.composite
def _daily_activity(draw):
    """Per-user sets of active day indices, dense enough to form runs
    and sparse enough to break them; duplicate events within a day
    check the DISTINCT-days step."""
    users = draw(st.integers(min_value=1, max_value=3))
    rows = []
    eid = 0
    for u in range(users):
        days = draw(
            st.lists(
                st.integers(min_value=0, max_value=12),
                min_size=1,
                max_size=10,
            )
        )
        for d in days:
            # midday, away from any tz/day boundary
            rows.append(
                {
                    "event_id": eid,
                    "ts_us": BASE_US + d * 86_400_000_000 + 43_200_000_000,
                    "user_id": u,
                }
            )
            eid += 1
    return rows


def _ref_streaks(rows):
    """Longest run of consecutive active days per user; ties go to the
    earliest start. Returns {user_id: (len, 'YYYY-MM-DD')}."""
    import datetime

    out = {}
    by_user: dict[int, set[int]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], set()).add(
            r["ts_us"] // 86_400_000_000
        )
    for u, dayset in by_user.items():
        days = sorted(dayset)
        best_len, best_start = 0, None
        run_len, run_start = 0, None
        for i, d in enumerate(days):
            if i == 0 or d != days[i - 1] + 1:
                run_len, run_start = 1, d
            else:
                run_len += 1
            if run_len > best_len:
                best_len, best_start = run_len, run_start
        start = datetime.date(1970, 1, 1) + datetime.timedelta(days=best_start)
        out[u] = (best_len, start.isoformat())
    return out


@settings(max_examples=5, deadline=None)
@given(rows=_daily_activity())
def test_streaks_match_run_reference(rows, tmp_path_factory):
    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    spark = get_session("pytest", master="local[8]", shuffle_partitions=8)
    sf_dir = _write_events(tmp_path_factory.mktemp("streakprop"), rows)
    got = {
        r["user_id"]: (r["len"], r["streak_start"])
        for r in load_all()["window_streaks"].fn(spark, sf_dir).collect()
    }
    assert got == _ref_streaks(rows)
