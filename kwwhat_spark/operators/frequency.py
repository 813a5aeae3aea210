"""Distributed frequent-items (heavy hitters) via two-pass Misra-Gries.

The scale problem: finding items with frequency >= theta*N by a plain
``groupBy(item).count()`` shuffles the FULL distinct-item cardinality —
for token/n-gram streams over a 100 TB corpus that is billions of keys,
almost all of which are far below the threshold and shuffled for nothing.

The classic fix (Misra-Gries 1982; Agarwal et al., "Mergeable
Summaries", PODS 2012) is a two-pass plan whose shuffle volume is
bounded by ``k`` per partition instead of the distinct cardinality:

  pass 1  each partition folds its item stream into a k-counter
          Misra-Gries summary (vectorized per Arrow batch; summaries are
          merged batch-by-batch with the (k+1)-th-largest subtraction
          rule, which the mergeable-summaries paper proves keeps the
          undercount <= N_p/(k+1)).  Only the surviving <= k items per
          partition are emitted — the candidate set.
  pass 2  exact counts for candidates only: the candidate set
          (<= k * partitions rows) is broadcast, the item stream is
          semi-joined against it, and a normal partial/final count with
          a threshold filter finishes the job.

Exactness guarantee: for theta > 1/(k+1), every item with global
frequency >= theta*N survives pass 1 in at least one partition (by
pigeonhole some partition has local share >= theta > 1/(k+1), and MG's
undercount bound keeps its counter positive there), so pass 2's exact
filter returns EXACTLY the theta-heavy hitters — the sketch only prunes
the candidate space, it never decides membership.  That is what makes
this operator fully oracle-checkable against ``GROUP BY ... HAVING``.

Reference parity: the reference's frequent-values profiling
(models/ macros summarize value distributions per column) stops at
exact grouped counts; this operator is the scale path the survey's
training-data-pipeline addendum calls for.

When to use which (measured, BASELINE.md round 6): on a LOW-cardinality
item stream the naive ``groupBy + HAVING`` wins — map-side combine
already collapses each partition to its distinct keys, and the MG pass
adds an Arrow transfer of the full stream into Python (sf10 synthetic
corpus, 26.6M bigrams over only 931 distinct keys: naive 15.8 s vs MG
30.6 s, identical output). The MG plan is for the regime the synthetic
corpus cannot exhibit: distinct cardinality too large for the hash
aggregation to hold (billions of n-grams at 100 TB), where the naive
plan spills/shuffles the full key space and MG still emits <= k rows
per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(items: DataFrame, item_col: str, *, k: int) -> DataFrame:
    """Pass 1: per-partition k-counter Misra-Gries survivors.

    Returns a DataFrame with a single ``item_col`` column holding the
    distinct union of every partition's summary keys (<= k per
    partition).  Arrow-batched: each batch is reduced with
    ``value_counts`` first, so the Python-side work is per *distinct*
    item per batch, not per row.
    """
    import pandas as pd

    col = item_col

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for item, cnt in vc.items():
                if item in counters:
                    counters[item] += int(cnt)
                else:
                    counters[item] = int(cnt)
            if len(counters) > k:
                # Mergeable-summaries rule: subtract the (k+1)-th
                # largest count from everything, drop the non-positive.
                cuts = sorted(counters.values(), reverse=True)
                cut = cuts[k]
                counters = {i: c - cut for i, c in counters.items() if c > cut}
        yield pd.DataFrame({col: pd.Series(list(counters), dtype="object")})

    field = items.schema[col]
    out_schema = f"`{col}` {field.dataType.simpleString()}"
    return items.select(col).mapInPandas(mg_partition, schema=out_schema).distinct()


def choose_frequent_items_plan(
    items: DataFrame,
    item_col: str,
    *,
    probe_rows: int = 100_000,
    distinct_ratio_cutoff: float = 0.1,
) -> str:
    """Sampled distinct-ratio probe → 'exact' or 'mg' (VERDICT r6 #5).

    Reads the first ``probe_rows`` rows (a LIMIT touches only the
    leading partitions — one cheap job, no full scan) and compares
    ``approx_count_distinct / count``. Repetition-heavy streams (the
    931-key sf10 corpus: ratio ~0.01) aggregate fastest with plain
    map-side-combined groupBy; a high ratio means the distinct key set
    grows with the data and only the MG candidate pruning bounds the
    shuffle at scale. The probe is a heuristic over a prefix sample —
    adversarially ordered data can fool it, which is why both plans
    produce bit-identical output and ``mode`` stays overridable.
    """
    row = (
        items.select(item_col)
        .limit(probe_rows)
        .agg(
            F.approx_count_distinct(item_col).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    if not row or not row["n"]:
        return "exact"
    return "exact" if row["d"] <= distinct_ratio_cutoff * row["n"] else "mg"


def frequent_items(
    items: DataFrame,
    item_col: str,
    *,
    theta: float,
    k: int | None = None,
    count_col: str = "cnt",
    mode: str = "auto",
) -> DataFrame:
    """Exact heavy hitters: items with count >= ceil(theta * N).

    ``k`` defaults to ``ceil(2/theta)`` — double the 1/theta minimum the
    exactness guarantee needs, so the candidate set stays small even
    when the distribution is adversarially flat around the threshold.

    ``mode`` picks the physical plan (all produce identical output):
      'auto'  — (default) sampled distinct-ratio probe picks between
                the two plans (choose_frequent_items_plan).
      'mg'    — the two-pass Misra-Gries plan; shuffle bounded by
                k·partitions. For distinct cardinality too large for
                hash aggregation (the 100 TB n-gram regime).
      'exact' — plain groupBy + threshold; map-side combine collapses
                each partition to its distinct keys. Faster whenever
                the distinct key set fits aggregation memory (measured
                2× at sf10 on the 931-key corpus — BASELINE.md r6).
    """
    if not 0 < theta < 1:
        raise ValueError(f"theta must be in (0,1), got {theta}")
    if mode not in ("auto", "mg", "exact"):
        raise ValueError(f"mode must be 'auto', 'mg' or 'exact', got {mode!r}")
    if mode == "auto":
        mode = choose_frequent_items_plan(items, item_col)
    if k is None:
        k = int(2.0 / theta) + 1
    if k + 1 <= int(1.0 / theta):
        raise ValueError(f"k={k} too small for theta={theta}: need k+1 > 1/theta")

    total = items.select(F.count(F.lit(1)).alias("_n_total"))
    if mode == "exact":
        exact = items.groupBy(item_col).agg(F.count(F.lit(1)).alias(count_col))
    else:
        candidates = misra_gries_candidates(items, item_col, k=k)
        exact = (
            items.join(F.broadcast(candidates), item_col)
            .groupBy(item_col)
            .agg(F.count(F.lit(1)).alias(count_col))
        )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col(count_col) >= F.ceil(F.lit(theta) * F.col("_n_total")))
        .drop("_n_total")
    )


def word_bigrams(text: Column) -> Column:
    """Whitespace word bigrams of ``text`` as an array<string> (lowercased,
    empty tokens dropped; docs with < 2 tokens yield an empty array).

    Pure built-ins (zip_with over two slices) — stays JVM-side.
    """
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
