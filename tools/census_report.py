#!/usr/bin/env python
"""Summarize a scaling_census.py log into the SCALING.md table.

Usage: python tools/census_report.py /tmp/census100_r6.log [wall_flag]

Reads the per-op lines ("name: A s -> B s (Rx) [joined J1 -> J2 (Jx)]")
— so a run cut short still yields its completed rows — and prints:
ops measured, wall-ratio distribution, worst wall ratios, worst
joined-rows growth, failures/timeouts.
"""

from __future__ import annotations

import re
import sys


def main() -> int:
    path = sys.argv[1]
    flag = float(sys.argv[2]) if len(sys.argv) > 2 else 80.0
    # Parenthesized annotations may carry arbitrary commentary after
    # the ratio ("(23242.1x; fixture duplicate-pile law, unchanged)"),
    # so both ratio groups accept a tail; the joined ratio is DERIVED
    # from the counts below rather than trusted from the text — a
    # rerun line whose annotation broke the old regex silently dropped
    # the worst joined-rows offender from the report.
    pat = re.compile(
        r"^(\w+)(?: \([^)]*\))?: ([\d.]+)s -> ([\d.]+)s \(([\d.]+|inf)x[^)]*\)"
        r"(?: joined (\d+) -> (\d+)(?: \([^)]*\))?)?"
    )
    # Keyed by op name, LAST occurrence wins — for measured rows AND
    # failures: a census log lists each op in its live section AND the
    # per-op recap, and committed files append "post-fix rerun" lines
    # that supersede the original row (including a FAILED one: a later
    # successful measurement retires the stale failure).
    by_name: dict[str, tuple] = {}
    fail_by_name: dict[str, str] = {}
    for line in open(path):
        line = line.strip()
        m = pat.match(line)
        if m:
            name, a, b, r, j1, j2 = m.groups()
            j1 = int(j1) if j1 else 0
            j2 = int(j2) if j2 else 0
            jr = (j2 / j1) if j1 > 0 else None
            by_name[name] = (name, float(a), float(b), float(r), j1, j2, jr)
            fail_by_name.pop(name, None)
        elif ": FAILED" in line:
            name = line.split(":", 1)[0].split(" ")[0]
            fail_by_name[name] = line
            by_name.pop(name, None)
    fails = list(fail_by_name.values())
    rows = list(by_name.values())
    if not rows:
        print("no census rows found")
        return 1
    ratios = sorted(r[3] for r in rows)

    def pct(p):
        return ratios[min(len(ratios) - 1, int(p * len(ratios)))]

    print(f"ops measured: {len(rows)}; failures/timeouts: {len(fails)}")
    print(
        f"wall ratio: median {pct(0.5):.1f}x  p90 {pct(0.9):.1f}x  "
        f"max {ratios[-1]:.1f}x"
    )
    print(f"\nworst wall ratios (flag {flag}x):")
    for name, a, b, r, *_ in sorted(rows, key=lambda x: -x[3])[:15]:
        mark = " <-- OVER FLAG" if r > flag else ""
        print(f"  {name}: {a:.2f}s -> {b:.2f}s ({r:.1f}x){mark}")
    jrows = [r for r in rows if r[6] is not None and r[4] > 100]
    if jrows:
        print("\nworst joined-rows growth (baseline > 100 joined rows):")
        for name, _, _, _, j1, j2, jr in sorted(
            jrows, key=lambda x: -(x[6] or 0)
        )[:15]:
            print(f"  {name}: joined {j1} -> {j2} ({jr:.1f}x)")
    if fails:
        print("\nfailures:")
        for f in fails:
            print(f"  {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
