#!/usr/bin/env python
"""Inventory for the round-10 decimal-sum totality swap.

Lists every registry key whose kernel source or oracle SQL uses the
non-total exact-sum machinery (dsum/davg/o_dsum/o_davg or a raw
cast-to-DEC), grouped by module, so the swap round can compose its
verify window mechanically and walk the sites file by file. The staged
replacements (dsum_total/davg_total/o_dsum_total/o_davg_total,
adlspark/ops/parity.py) are already unit-pinned by
tests/test_parity_total.py; the NaN/Inf corpus rows gate the
finished swap by default (round 10 made the full list permanent).

Usage: python tools/dsum_swap_inventory.py
"""

from __future__ import annotations

import inspect
import re
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

# The CAST alternatives tolerate ONE level of parenthesized expression
# inside the cast — `CAST((a - b) AS O_DEC)` is the repo's common
# style and a bare [^)]* would stop at the inner close-paren, letting
# future non-total sites escape the inventory (round-11 ADVICE).
_CAST_BODY = r"(?:[^()]|\([^()]*\))*"
PAT = re.compile(
    r"\b(dsum|davg)\((?!\))|\bo_dsum\(|\bo_davg\("
    r"|(?<!try_)cast\(DEC\)"
    rf"|(?<!TRY_)CAST\({_CAST_BODY}AS \{{?O_DEC\}}?"
    rf"|(?<!TRY_)CAST\({_CAST_BODY}AS DECIMAL\(38"
)
TOTAL_PAT = re.compile(r"dsum_total|davg_total|o_dsum_total|o_davg_total")


def main() -> None:
    from adlspark import registry

    qs, os_ = registry.all_queries(), registry.all_oracles()
    by_module: dict[str, list[str]] = {}
    done: list[str] = []
    for k, fn in qs.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        blob = src + "\n" + os_.get(k, "")
        if TOTAL_PAT.search(blob) and not PAT.search(blob):
            done.append(k)
            continue
        if PAT.search(blob):
            by_module.setdefault(fn.__module__, []).append(k)

    total = sum(len(v) for v in by_module.values())
    print(f"keys still on the non-total exact-sum machinery: {total}")
    for mod in sorted(by_module):
        print(f"\n{mod} ({len(by_module[mod])}):")
        for k in by_module[mod]:
            print(f"  {k}")
    print(f"\nalready swapped: {len(done)}")
    if done:
        for k in done:
            print(f"  {k}")
    print(
        "\nswap recipe per key: dsum->dsum_total, davg->davg_total,"
        " o_dsum->o_dsum_total, o_davg->o_davg_total, raw"
        " .cast(DEC)->.try_cast(DEC) with the oracle's CAST gaining the"
        " isnan guard (_o_dec_total); prove each file with"
        " driver_sim at sf0.01+sf0.001, then run"
        " pytest -k float_extreme; every touched"
        " key re-enters _VERIFY_WINDOW."
    )


if __name__ == "__main__":
    main()
