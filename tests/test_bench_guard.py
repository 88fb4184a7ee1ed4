"""Round-over-round bench regression guard over the RECORDED driver
rounds: the common-query total may not grow past 1.25x the previous
round, and no single query past 1.5x. bench.py applies the same bounds
live (stderr report) against the newest BENCH_r*.json."""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

import bench

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rounds() -> list[tuple[int, dict[str, float], dict[str, float]]]:
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
        if isinstance(queries, dict) and queries:
            out.append((
                int(m.group(1)),
                queries,
                secondary if isinstance(secondary, dict) else {},
            ))
    return sorted(out)


def test_recorded_rounds_within_guard():
    rounds = _rounds()
    if len(rounds) < 2:
        pytest.skip("fewer than two recorded rounds")
    for (n_prev, *prev_tiers), (n_cur, *cur_tiers) in zip(rounds, rounds[1:]):
        for tier, prev, cur in zip(("headline", "secondary"), prev_tiers, cur_tiers):
            common = [k for k in cur if k in prev and prev[k] > 0]
            if tier == "secondary" and not common:
                continue  # tier first recorded in r5 — no prior to bound
            assert common, f"r{n_prev}->r{n_cur} [{tier}]: no common queries"
            total_ratio = sum(cur[k] for k in common) / sum(
                prev[k] for k in common
            )
            assert total_ratio <= bench.GUARD_TOTAL_RATIO, (
                f"r{n_prev}->r{n_cur} [{tier}]: total {total_ratio:.2f}x"
            )
            for k in common:
                # Same two-part bound as bench.guard_report: a breach
                # needs the ratio AND an absolute move past the jitter
                # floor.
                assert (
                    cur[k] / prev[k] <= bench.GUARD_QUERY_RATIO
                    or cur[k] - prev[k] < bench.GUARD_MIN_DELTA_SEC
                ), (
                    f"r{n_prev}->r{n_cur} [{tier}]: {k} {prev[k]} -> {cur[k]} "
                    f"({cur[k] / prev[k]:.2f}x, +{cur[k] - prev[k]:.2f}s)"
                )


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
    name, queries, secondary = got
    assert name == f"BENCH_r{rounds[-1][0]:02d}.json"
    assert queries == rounds[-1][1]
    assert secondary == rounds[-1][2]
