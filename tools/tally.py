#!/usr/bin/env python
"""Canonical catalog tallies, derived from the live registry.

VERDICT r7 hygiene item (a): round headlines drifted ("144/144" while
the registry held 145) because counts were hand-maintained. This is the
single source: BASELINE.md round tallies and commit headlines copy its
output verbatim.

Usage: python tools/tally.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from kwwhat_spark.queries import REGISTRY

    total = len(REGISTRY)
    with_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    rows_only = total - with_oracle
    pct = round(100 * with_oracle / total)
    print(f"catalog entries:      {total}")
    print(f"full value-hash:      {with_oracle} ({pct}%)")
    print(f"rows-only (documented structural necessity): {rows_only}")
    print(
        "rows-only entries:    "
        + ", ".join(sorted(n for n, q in REGISTRY.items() if not q.oracle))
    )
    print()
    print(
        f"headline line: Catalog: {total} entries, {with_oracle} full "
        f"value-hash oracles ({pct}%), {rows_only} rows-only by "
        "documented structural necessity"
    )


if __name__ == "__main__":
    main()
