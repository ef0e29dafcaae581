"""Compute the driver-verification debt for the next round's window.

The external driver verifies the FIRST ~50 keys of ``queries()`` per
round and records verdicts in ``CORRECTNESS_r*.json``. This tool prints
every registry key that has never received a verdict (in registry order)
plus a staleness ranking of the verified keys (oldest verdict first), so
the next round's ``_VERIFY_WINDOW`` in ``adlspark/registry.py`` can be
composed mechanically: (a) latest-verdict failures, (b) anything whose
code changed after its last green verdict (the tool cannot see that —
check git log), (c) never-verified debt, (d) fill the remaining slots
from the top of the staleness ranking. The goal of (d) is the rotation
policy from the round-6 verdict: every verdict stays ≤5 rounds old,
because testdata regenerates between rounds and a verdict against
long-gone parquet files decays in value.

Usage: python tools/verification_debt.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def round_num(path: str) -> int:
    # parse the round as an INT: a lexicographic sort would order
    # r10 < r7 the moment the zero-padded rNN naming breaks, silently
    # flipping both the latest-verdict overwrite and the staleness
    # ranking below. Handles r09, r10, and a hypothetical r010 alike
    # (pinned by tests/test_docs.py::test_verification_debt_round_rollover).
    return int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])


def main() -> None:
    from adlspark import registry

    keys = list(registry.all_queries())
    oracles = registry.all_oracles()

    seen: dict[str, str] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), key=round_num
    ):
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        with open(path) as f:
            verdicts = json.load(f)
        for k, v in verdicts.items():
            if v.get("err") not in (None, "no_oracle"):
                status = f"FAILED-{rnd}"  # harness error/crash
            elif v.get("hash_match") is False:
                status = f"FAILED-{rnd}"  # compared and mismatched
            elif v.get("hash_match"):
                status = f"green-{rnd}"
            else:
                status = f"ran-{rnd}"  # rows-only (no_oracle) keys
            seen[k] = status  # later rounds overwrite earlier ones

    debt = [k for k in keys if k not in seen]
    failed = [k for k, s in seen.items() if s.startswith("FAILED")]

    print(f"registry keys: {len(keys)}  with-verdict: {len(seen)}  "
          f"debt: {len(debt)}  latest-verdict-failed: {len(failed)}")
    if failed:
        print("\nFAILED in their latest window (re-front-load FIRST):")
        for k in failed:
            print(f"  {k}  [{seen[k]}]")
    print("\nNever verified (registry order):")
    for k in debt:
        kind = "oracle" if k in oracles else "rows-only"
        print(f"  {k}  ({kind})")

    # staleness ranking: verified keys, oldest latest-verdict first; ties
    # broken by registry order so output is stable round over round
    order = {k: i for i, k in enumerate(keys)}
    verified = [k for k in keys if k in seen and not seen[k].startswith("FAILED")]
    verified.sort(key=lambda k: (int(seen[k].rsplit("-r", 1)[-1]), order[k]))
    in_window = set(registry._VERIFY_WINDOW)
    print("\nStaleness ranking (oldest latest-verdict first; * = already in "
          "the current _VERIFY_WINDOW):")
    for k in verified[:80]:
        mark = " *" if k in in_window else ""
        print(f"  {seen[k].rsplit('-', 1)[-1]}  {k}{mark}")


if __name__ == "__main__":
    main()
