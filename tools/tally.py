#!/usr/bin/env python
"""Canonical catalog tallies, derived from the live registry.

VERDICT r7 hygiene item (a): round headlines drifted ("144/144" while
the registry held 145) because counts were hand-maintained. This is the
single source: BASELINE.md round tallies and commit headlines copy its
output verbatim.

Usage: python tools/tally.py           # print canonical tallies
       python tools/tally.py --check   # verify the LAST claimed count in
                                       # BASELINE.md/README.md equals the
                                       # live registry (exit 1 on drift)

VERDICT r8 hygiene item (a): the r8 headline was written BEFORE the
round's last entry landed, so it undercounted again. --check makes the
drift mechanical to catch: the pre-commit hook (tools/hooks/pre-commit,
installed to .git/hooks) runs it whenever a staged BASELINE.md/README.md
hunk ADDS a "Catalog: N entries" claim — a tally written before the last
entry now fails the commit that adds it.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def check() -> int:
    from kwwhat_spark.queries import REGISTRY

    total = len(REGISTRY)
    bad = []
    for fname in ("BASELINE.md", "README.md"):
        path = os.path.join(_REPO, fname)
        if not os.path.exists(path):
            continue
        claims = re.findall(r"Catalog[^:]*:\s*\*{0,2}(\d+)\s+entries",
                            open(path).read())
        if claims and int(claims[-1]) != total:
            bad.append(f"{fname}: last claim {claims[-1]} != registry {total}")
    if bad:
        print("TALLY DRIFT:", "; ".join(bad))
        print(f"(live registry: {total} entries — rerun tools/tally.py and "
              "update the headline, or land the entry first)")
        return 1
    print(f"tally check ok: {total} entries")
    return 0


def main() -> None:
    if "--check" in sys.argv:
        sys.exit(check())
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
