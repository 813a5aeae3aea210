"""Cache-scope hygiene (r13): operators register their persisted
intermediates with cachescope.track; a long-lived session composing
entries releases them with release_tracked() instead of relying on
bench.py's blanket clearCache.
"""

from __future__ import annotations

from kwwhat_spark.operators.cachescope import release_tracked
from kwwhat_spark.queries import REGISTRY


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_tracked_after_two_entry_composition(spark, sf_dir):
    # Start from a known baseline: other tests share this session and
    # may hold non-SQL persistent RDDs (eager localCheckpoints from the
    # model layer) that clearCache does not and should not touch.
    release_tracked(blocking=True)
    spark.catalog.clearCache()
    baseline = _n_persistent(spark)

    # Two cache-holding entries composed in ONE session, both
    # materialized (the r12 verdict's composition scenario: minhash
    # holds shingled+banded, the span strip holds its token stage).
    for name in ("dedup_minhash_lsh", "dedup_substring_spans"):
        df = REGISTRY[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    assert _n_persistent(spark) > baseline  # the intra-query caches exist...

    n = release_tracked(blocking=True)
    assert n >= 3  # ...all of them were tracked (shingled, banded, tokens)
    assert _n_persistent(spark) == baseline  # ...and release drops every one


def test_release_tracked_idempotent(spark):
    assert release_tracked() == 0
