"""Scoped release for operator-persisted intermediates.

Several operators persist() intra-query stages that are consumed more
than once within one returned plan (minhash shingles/banded rows, the
substring-strip token stage). The persists are correct §5 usage — the
stage is reused and recomputing it costs more than the cache — but the
DataFrame handles are operator-local, so a LONG-LIVED session composing
many operator calls accumulates storage: Spark's CacheManager keys
caches by logical plan and never drops them on its own.

Callers have two contracts:

- Per-query isolation (what bench.py and the oracle gate do): call
  ``spark.catalog.clearCache()`` between queries. Blanket, simple, and
  correct when queries don't share cached stages.
- Scoped release (long-lived sessions): operators register every
  persist here; call :func:`release_tracked` after materializing an
  operator's output to unpersist exactly the intermediates operators
  created, leaving caller-managed caches alone.

Tracking holds strong references: the JVM cache outlives the Python
handle, so a weakref would go dead while the cache lives on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an operator-persisted DataFrame for scoped release."""
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
