"""Doc-check: README's registry counts must match the live registry
(ADVICE r3: the counts drifted twice as keys were added)."""

from __future__ import annotations

import os
import re

from adlspark import registry

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_registry():
    q = registry.all_queries()
    o = registry.all_oracles()
    with open(README) as f:
        text = f.read()
    m = re.search(
        r"(\d+) registered query keys \((\d+) with full DuckDB value oracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "README registry-count sentence not found"
    total, with_oracle, rows_only = map(int, m.groups())
    assert total == len(q), f"README says {total} keys, registry has {len(q)}"
    assert with_oracle == len(o), f"README says {with_oracle} oracles, registry has {len(o)}"
    assert rows_only == len(q) - len(o), (
        f"README says {rows_only} rows-only, registry has {len(q) - len(o)}"
    )
