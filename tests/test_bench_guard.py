"""Round-over-round bench regression guard over the RECORDED driver
rounds: the common-query total may not grow past 1.25x the previous
round and no single query past 1.5x — both bounds scaled by the
rounds' environment-drift factor (bench.env_drift_factor: calibration
probe ratio when both rounds recorded one, else uniform median drift,
capped at 2.5x). bench.py applies the same bounds live (stderr report)
against the newest BENCH_r*.json."""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

import bench

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Driver-recorded breaches established as ENVIRONMENTAL, not plan
# regressions, by a same-code re-measurement in a later round. Each
# entry waives exactly one (prev_round, cur_round, tier, query) cell
# of the recorded-rounds guard and must cite its evidence.
#   (9, 10, secondary, sim_ann_ivf): the r10 driver measured 2.49s ->
#   5.48s with the op's code untouched (verified: zero diff in
#   operators/extras.py that round); the r11 round-start re-measure
#   under the driver's own cold-JVM full-bench protocol got 1.99s —
#   FASTER than r9 — on unchanged code (plans/r11/bench_before.json,
#   OPTIMIZATION_r11.md). A one-cell machine artifact in the committed
#   record, not a regression the guard should keep re-flagging.
_DRIVER_RECORD_WAIVERS = {(9, 10, "secondary", "sim_ann_ivf")}


def _rounds() -> list[
    tuple[int, dict[str, float], dict[str, float], float | None]
]:
    out = []
    for path in glob.glob(os.path.join(_REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or rec
        queries = parsed.get("queries")
        secondary = parsed.get("secondary")
        calib = parsed.get("calib_sec")
        if isinstance(queries, dict) and queries:
            out.append((
                int(m.group(1)),
                queries,
                secondary if isinstance(secondary, dict) else {},
                calib if isinstance(calib, (int, float)) else None,
            ))
    return sorted(out)


def test_recorded_rounds_within_guard():
    rounds = _rounds()
    if len(rounds) < 2:
        pytest.skip("fewer than two recorded rounds")
    for (n_prev, prev_h, prev_s, prev_c), (n_cur, cur_h, cur_s, cur_c) in zip(
        rounds, rounds[1:]
    ):
        # Environment drift is a per-ROUND property: derive it from the
        # headline tier (the largest common set) and apply it to both.
        env, basis = bench.env_drift_factor(cur_h, prev_h, cur_c, prev_c)
        total_bound = bench.GUARD_TOTAL_RATIO * env
        query_bound = bench.GUARD_QUERY_RATIO * env
        for tier, prev, cur in (
            ("headline", prev_h, cur_h),
            ("secondary", prev_s, cur_s),
        ):
            common = [k for k in cur if k in prev and prev[k] > 0]
            if tier == "secondary" and not common:
                continue  # tier first recorded in r5 — no prior to bound
            assert common, f"r{n_prev}->r{n_cur} [{tier}]: no common queries"
            total_ratio = sum(cur[k] for k in common) / sum(
                prev[k] for k in common
            )
            assert total_ratio <= total_bound, (
                f"r{n_prev}->r{n_cur} [{tier}]: total {total_ratio:.2f}x "
                f"(bound {total_bound:.2f}x, env {env:.2f} [{basis}])"
            )
            for k in common:
                if (n_prev, n_cur, tier, k) in _DRIVER_RECORD_WAIVERS:
                    continue
                # Same two-part bound as bench.guard_report: a breach
                # needs the ratio AND an absolute move past the jitter
                # floor.
                assert (
                    cur[k] / prev[k] <= query_bound
                    or cur[k] - prev[k] < bench.GUARD_MIN_DELTA_SEC
                ), (
                    f"r{n_prev}->r{n_cur} [{tier}]: {k} {prev[k]} -> {cur[k]} "
                    f"({cur[k] / prev[k]:.2f}x, +{cur[k] - prev[k]:.2f}s, "
                    f"bound {query_bound:.2f}x, env {env:.2f} [{basis}])"
                )


def test_env_drift_factor_contract():
    # Calibration primary: machine 1.4x slower -> factor 1.4.
    f, basis = bench.env_drift_factor({}, {}, cur_calib=1.4, prev_calib=1.0)
    assert (f, basis) == (1.4, "calib")
    # Faster machine never LOOSENS the bounds (clamped to >= 1).
    f, basis = bench.env_drift_factor({}, {}, cur_calib=0.5, prev_calib=1.0)
    assert (f, basis) == (1.0, "calib")
    # Capped: a "machine" 4x slower is a broken build, not drift.
    f, _ = bench.env_drift_factor({}, {}, cur_calib=4.0, prev_calib=1.0)
    assert f == bench.GUARD_ENV_CAP
    # Median fallback: 10 queries uniformly ~1.4x -> ~1.4 factor.
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {f"q{i}": 1.35 + 0.01 * i for i in range(10)}
    f, basis = bench.env_drift_factor(cur, prev)
    assert basis == "median-drift" and 1.3 <= f <= 1.5
    # NON-uniform drift (one 5x outlier among flat queries) must NOT
    # count as environment — that shape is a plan regression.
    cur2 = {f"q{i}": 1.0 for i in range(10)}
    cur2["q9"] = 5.0
    f, basis = bench.env_drift_factor(cur2, prev)
    assert (f, basis) == (1.0, "none")
    # Too few common queries: no fallback signal.
    f, basis = bench.env_drift_factor({"a": 2.0}, {"a": 1.0})
    assert (f, basis) == (1.0, "none")


def test_would_breach_requires_ratio_and_absolute_move():
    prev = {"q": 0.2, "big": 2.0}
    # 1.6x but only +0.12s: sub-second jitter, not a breach.
    assert not bench._would_breach("q", 0.32, prev)
    # 1.3x and +0.6s: ratio under bound, not a breach.
    assert not bench._would_breach("big", 2.6, prev)
    # 1.6x and +1.2s: both bounds crossed.
    assert bench._would_breach("big", 3.2, prev)
    # Unknown / zero prior: never a breach.
    assert not bench._would_breach("new", 9.9, prev)
    assert not bench._would_breach("z", 9.9, {"z": 0.0})


def test_prior_round_reader_matches_newest_record():
    rounds = _rounds()
    if not rounds:
        pytest.skip("no recorded rounds")
    got = bench.prior_round_queries(_REPO)
    assert got is not None
    name, queries, secondary, calib = got
    assert name == f"BENCH_r{rounds[-1][0]:02d}.json"
    assert queries == rounds[-1][1]
    assert secondary == rounds[-1][2]
    assert calib == rounds[-1][3]
