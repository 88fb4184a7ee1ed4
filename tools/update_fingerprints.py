#!/usr/bin/env python
"""Refresh plans/fingerprints.json — run at ROUND START, before any
edit.

At round start the working tree is exactly the commit the driver's
newest CORRECTNESS_r*.json attested, so for every key whose newest
record is green the CURRENT (source, oracle) fingerprint is the
attested one. Recording it now means any later edit this round makes
the key's fingerprint drift, registry.effective_attested_keys() drops
it, and it floats back into the next 50-key attestation window.

Keys whose newest record is NOT green are removed from the file (they
float via the record check already). Pass --poison KEY to drop a key
whose green record is known to predate a rewrite (the r5
join_theta case: rewritten after its r02 attestation, so its
round-start fingerprint is NOT the attested one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_avro_repair_spark.plans.registry import _attested_keys, load_all  # noqa: E402

FP_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "s3_avro_repair_spark", "plans", "fingerprints.json",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poison", action="append", default=[],
                    help="drop this key even if its record is green")
    args = ap.parse_args()

    ops = load_all()
    green = _attested_keys()
    out = {
        k: ops[k].fingerprint
        for k in sorted(green)
        if k in ops and k not in set(args.poison)
    }
    with open(FP_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} fingerprints to {FP_PATH} "
          f"(poisoned: {sorted(args.poison)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
