#!/usr/bin/env python
"""Refresh BASELINE.md's per-key sf0.1 table from N bench.py run files.

Usage: python tools/refresh_baseline.py run1.json run2.json run3.json

Prints the new markdown table (per-key MEDIANS across the runs) plus a
drift report vs the current table; paste/commit manually so the update
is always a reviewed diff, never a silent overwrite.
"""

from __future__ import annotations

import json
import re
import statistics
import sys

BASELINE = "BASELINE.md"


def current_table() -> dict[str, float]:
    out = {}
    for line in open(BASELINE):
        m = re.match(r"\| `([a-z0-9_]+)` \| ([0-9.]+) \|", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    keys = sorted(set().union(*runs))
    med = {
        k: round(statistics.median([r[k] for r in runs if k in r]), 3)
        for k in keys
    }
    old = current_table()

    print("| key | sec |")
    print("|---|---|")
    for k in keys:
        print(f"| `{k}` | {med[k]} |")

    print("\n-- drift vs current table (ratio > 1.5 or < 0.5) --", file=sys.stderr)
    for k in keys:
        if k in old and old[k] > 0.05:
            r = med[k] / old[k]
            if r > 1.5 or r < 0.5:
                print(f"{k}: {old[k]} -> {med[k]} ({r:.2f}x)", file=sys.stderr)
    new_keys = [k for k in keys if k not in old]
    print(f"new keys (no prior row): {len(new_keys)}", file=sys.stderr)
    total = sum(med.values())
    print(f"total of medians: {total:.1f} s / {len(keys)} keys", file=sys.stderr)


if __name__ == "__main__":
    main()
