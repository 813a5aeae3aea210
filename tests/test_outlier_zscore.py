"""The exact-integer z-score entry must stay EXACT at magnitudes far
beyond the fixture: Spark's decimal(38,0) arithmetic (with the
precision-cap rules) has to agree with arbitrary-precision Python ints,
or the oracle boolean silently diverges at scale.
"""

from __future__ import annotations

from kwwhat_spark.queries import REGISTRY


def _exact_flags(rows):
    by_source: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source, x in rows:
        by_source.setdefault(source, []).append((doc_id, x))
    flags = {}
    for source, docs in by_source.items():
        n = len(docs)
        s = sum(x for _, x in docs)
        q = sum(x * x for _, x in docs)
        for doc_id, x in docs:
            flags[doc_id] = (n * x - s) ** 2 > 4 * (n * q - s * s)
    return flags


def test_zscore_decimal_exact_at_large_magnitudes(spark):
    # n_chars up to ~1e9 over 2000 rows: (n·x−S)² reaches ~1e24 and
    # n·Q ~ 1e21 — far past BIGINT, inside decimal(38,0).
    rows = [(i, f"s{i % 3}", (i * 2_654_435_761) % 1_000_000_007) for i in range(2000)]
    # plant unambiguous outliers
    rows += [(9001, "s0", 990_000_000_000 % 1_000_000_007 + 900_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    from pyspark.sql import functions as F

    # Same expression pipeline as the catalog entry (which is bound to
    # the parquet fixture), applied to the stress frame.
    docs = df
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source"),
        F.sum("n_chars").alias("sm"),
        F.sum((F.col("n_chars") * F.col("n_chars")).cast("decimal(38,0)")).alias("q"),
    )
    n = F.col("n_source").cast("decimal(19,0)")
    x = F.col("n_chars").cast("decimal(19,0)")
    sm = F.col("sm").cast("decimal(19,0)")
    q = F.col("q")
    dev = n * x - sm
    flag = (dev * dev) > (F.lit(4).cast("decimal(19,0)") * (n * q - sm * sm))
    got = {
        r.doc_id: r.is_len_outlier
        for r in docs.join(F.broadcast(stats), "source")
        .select("doc_id", flag.alias("is_len_outlier"))
        .collect()
    }
    want = _exact_flags([(r.doc_id, r.source, r.n_chars) for r in df.collect()])
    assert got == want
    assert any(got.values()), "stress frame should contain at least one outlier"
    assert REGISTRY["outlier_docs_zscore"].oracle is not None
